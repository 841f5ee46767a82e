"""Multi decoder: concatenates outputs of several decoders per image
(reference ``decoder/multi.py:9-35``)."""

from .base import Decoder


class Multi(Decoder):
    def __init__(self, decoders):
        super().__init__()
        self.decoders = decoders

    def batch_decode(self, fields_batch):
        return self.batch_decode_deferred(fields_batch)()

    def batch_decode_deferred(self, fields_batch):
        """Dispatch every sub-decoder; return materialize() (see
        ``CifCaf.batch_decode_deferred``). Sub-decoders without a
        deferred API — or with an instance-level ``batch_decode``
        override (e.g. the ``--profile-decoder`` Profiler wrapper the
        factory installs) — run their ``batch_decode`` eagerly at
        dispatch time so the override is never bypassed."""
        deferred = [
            d.batch_decode_deferred(fields_batch)
            if hasattr(d, 'batch_decode_deferred')
            and 'batch_decode' not in d.__dict__
            else (lambda out=d.batch_decode(fields_batch): out)
            for d in self.decoders
        ]

        def materialize():
            per_decoder = [m() for m in deferred]
            self.last_decoder_time = sum(d.last_decoder_time
                                         for d in self.decoders)
            if len(per_decoder) == 1:
                return per_decoder[0]
            return [
                [ann for decoder_out in image_outs for ann in decoder_out]
                for image_outs in zip(*per_decoder)
            ]

        return materialize

    def __call__(self, fields):
        return [ann for d in self.decoders for ann in d(fields)]
