"""Pipelined serving loop + decode-on-second-device.

One TPU core executes one program at a time, so decode(i) can only
overlap NN(i+1) on a *different* chip — the TPU-native analogue of the
reference's fork-pool decode workers (``decoder/decoder.py:29-47``).
These tests pin the functional contract on the virtual CPU mesh:
deferred materialization preserves results and ordering, and routing
the decode to a second device is result-identical.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import field_fixtures  # noqa: E402

FIXTURE_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'fixtures', 'overfit_fixture')
FIXTURE_IMAGE = '/root/reference/tests/coco/images/puppy_dog.jpg'


def _scene(seed=0):
    rng = np.random.RandomState(seed)
    anns = [field_fixtures.annotation_dict(
        field_fixtures.synthetic_person(60 + 70 * i, 90, 100.0, rng))
        for i in range(2)]
    cif, caf, _ = field_fixtures.fields_from_annotations(anns, (169, 217),
                                                         stride=8)
    return cif, caf


def _annotation_key(anns):
    return [(round(a.score, 6), np.asarray(a.data).round(4).tobytes())
            for a in anns]


def test_decode_device_parity():
    import jax
    import openpifpaf_tpu
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    assert len(jax.local_devices()) >= 2  # conftest's 8-device CPU mesh

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    for i, m in enumerate((cif_meta, caf_meta)):
        m.base_stride = 8
        m.head_index = i
    cifcaf = CifCaf(cif_meta, caf_meta)
    cif, caf = _scene()
    fields = [cif[None], caf[None]]

    try:
        CifCaf.decode_device = None
        base = cifcaf.batch_decode(fields)[0]
        CifCaf.decode_device = 1
        routed = cifcaf.batch_decode(fields)[0]
    finally:
        CifCaf.decode_device = None

    assert len(base) == 2
    assert _annotation_key(base) == _annotation_key(routed)


def test_deferred_matches_eager():
    import openpifpaf_tpu
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    for i, m in enumerate((cif_meta, caf_meta)):
        m.base_stride = 8
        m.head_index = i
    cifcaf = CifCaf(cif_meta, caf_meta)
    cif, caf = _scene(1)
    fields = [cif[None], caf[None]]

    eager = cifcaf.batch_decode(fields)[0]
    # two in-flight dispatches before either materializes
    m1 = cifcaf.batch_decode_deferred(fields)
    m2 = cifcaf.batch_decode_deferred([cif[None], caf[None]])
    assert _annotation_key(m1()[0]) == _annotation_key(eager)
    assert _annotation_key(m2()[0]) == _annotation_key(eager)


@pytest.mark.skipif(not os.path.exists(FIXTURE_CKPT + '.json')
                    or not os.path.exists(FIXTURE_IMAGE),
                    reason='fixture checkpoint/image unavailable')
def test_pipelined_predictor_loop():
    from openpifpaf_tpu.predictor import Predictor

    predictor = Predictor(checkpoint=FIXTURE_CKPT)
    predictor.long_edge = 161
    predictor.preprocess = predictor._build_preprocess()

    files = [FIXTURE_IMAGE] * 4

    predictor.pipeline_decode = False
    strict = [( _annotation_key(p), meta['file_name'])
              for p, _, meta in predictor.images(files)]
    predictor.pipeline_decode = True
    piped = [(_annotation_key(p), meta['file_name'])
             for p, _, meta in predictor.images(files)]

    assert len(strict) == 4
    assert all(len(k) == 1 for k, _ in strict)  # the person is found
    assert strict == piped


@pytest.mark.skipif(not os.path.exists(FIXTURE_CKPT + '.json')
                    or not os.path.exists(FIXTURE_IMAGE),
                    reason='fixture checkpoint/image unavailable')
def test_predict_cli_decode_device(tmp_path):
    """--decode-device through the real CLI: same poses as in-place."""
    import json
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH=os.path.dirname(
                   os.path.dirname(os.path.abspath(__file__))))
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'

    outs = {}
    for name, extra in (('inplace', []),
                        ('routed', ['--decode-device', '1'])):
        out = str(tmp_path / name)
        proc = subprocess.run(
            [sys.executable, '-m', 'openpifpaf_tpu.predict', FIXTURE_IMAGE,
             '--checkpoint', FIXTURE_CKPT, '--long-edge', '161',
             '--json-output', out] + extra,
            env=env, capture_output=True, timeout=600)
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        outs[name] = json.load(open(out))
    assert len(outs['routed']) == len(outs['inplace']) == 1
    assert outs['routed'][0]['keypoints'] == outs['inplace'][0]['keypoints']


def test_pipeline_propagates_producer_exceptions():
    from openpifpaf_tpu.predictor import Predictor

    predictor = Predictor.__new__(Predictor)  # no model needed
    predictor.pipeline_decode = True

    def batches():
        raise RuntimeError('producer boom')
        yield  # pragma: no cover

    with pytest.raises(RuntimeError, match='producer boom'):
        list(Predictor._run_batches(predictor, batches()))


def test_pipeline_flushes_pending_batch_on_late_failure():
    """A failure while producing/dispatching batch i+1 must not drop
    batch i's already-computed results."""
    from openpifpaf_tpu.predictor import Predictor

    predictor = Predictor.__new__(Predictor)
    predictor.pipeline_decode = True
    predictor._dispatch_batch = lambda batch: ('staged', batch)
    predictor._materialize_batch = lambda staged: iter([staged[1]])

    def batches():
        yield 'batch0'
        raise RuntimeError('late producer boom')

    got = []
    with pytest.raises(RuntimeError, match='late producer boom'):
        for item in Predictor._run_batches(predictor, batches()):
            got.append(item)
    assert got == ['batch0']

    # dispatch failure on batch 1: batch 0 still yielded
    def dispatch(batch):
        if batch == 'batch1':
            raise RuntimeError('dispatch boom')
        return ('staged', batch)

    predictor._dispatch_batch = dispatch
    got = []
    with pytest.raises(RuntimeError, match='dispatch boom'):
        for item in Predictor._run_batches(predictor,
                                           iter(['batch0', 'batch1'])):
            got.append(item)
    assert got == ['batch0']


def test_deferred_path_honors_instance_batch_decode_override():
    """--profile-decoder wraps each decoder's batch_decode as an
    INSTANCE attribute (decoder/factory.py); the Multi deferred path
    must route through such overrides, not bypass them."""
    from openpifpaf_tpu.decoder.multi import Multi

    class FakeDecoder:
        last_decoder_time = 0.0

        def batch_decode(self, fields_batch):
            return [['eager']]

        def batch_decode_deferred(self, fields_batch):
            return lambda: [['deferred']]

    d = FakeDecoder()
    assert Multi([d]).batch_decode_deferred(None)() == [['deferred']]

    calls = []

    def wrapped(fields_batch):  # stand-in for the Profiler wrapper
        calls.append(1)
        return [['profiled']]

    d.batch_decode = wrapped  # instance-dict override, like the factory
    assert Multi([d]).batch_decode_deferred(None)() == [['profiled']]
    assert calls == [1]
