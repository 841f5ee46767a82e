"""Decoder factory (reference ``decoder/factory.py:85-172``)."""

import argparse
import logging

from .cifcaf import CifCaf, CifCafDense
from .cifdet import CifDet
from .tracking_pose import TrackingPose
from .pose_similarity import PoseSimilarity
from .multi import Multi

LOG = logging.getLogger(__name__)

DECODERS = {CifCaf, CifCafDense, CifDet, TrackingPose, PoseSimilarity}


#: wrap every built decoder's __call__ in a cProfile dump
#: (reference decoder/factory.py:153-158)
profile_decoder = None


def cli(parser: argparse.ArgumentParser, *, workers=None):
    group = parser.add_argument_group('decoder configuration')
    group.add_argument('--decoder', default=None, nargs='+',
                       help='decoders to be considered, e.g. "cifcaf:0"')
    group.add_argument('--decoder-workers', default=None, type=int,
                       help='compat flag: the reference fans decoding out '
                            'over a process pool; here decode is a batched '
                            'device op, so this is accepted and ignored')
    group.add_argument('--profile-decoder', default=None, nargs='?',
                       const='profile_decoder.prof',
                       help='profile the decoder and write a pstats file')
    group.add_argument('--decode-device', default=None, type=int,
                       help='run the decode on this local device index '
                            '(a second chip lets decode(i) overlap '
                            'NN(i+1) in the pipelined serving loop; '
                            'the TPU-native analogue of the '
                            'reference\'s decode worker pool)')
    # global CifHr / CafScored thresholds (reference factory.py:40-45)
    group.add_argument('--cif-th', default=CifCaf.cifhr_threshold,
                       type=float, help='cif threshold')
    group.add_argument('--caf-th', default=CifCaf.caf_score_th,
                       type=float, help='caf threshold')
    for decoder in DECODERS:
        decoder.cli(parser)


def configure(args: argparse.Namespace):
    global profile_decoder
    profile_decoder = args.profile_decoder
    from .cifcaf import CifCaf as _CifCaf
    _CifCaf.decode_device = getattr(args, 'decode_device', None)
    if args.decoder_workers:
        LOG.info('decoder workers requested (%d): decoding is a batched '
                 'device op here, no worker pool needed', args.decoder_workers)
    CifCaf.cifhr_threshold = args.cif_th
    CifCaf.caf_score_th = args.caf_th
    CifDet.cifhr_threshold = args.cif_th
    for decoder in DECODERS:
        decoder.configure(args)


def decoders(head_metas, requested=None):
    built = []
    for decoder_class in sorted(DECODERS, key=lambda d: d.__name__):
        instances = decoder_class.factory(head_metas)
        if requested is not None:
            name = decoder_class.__name__.lower()
            selected = []
            for request in requested:
                if ':' in request:
                    req_name, req_index = request.split(':')
                    if req_name == name:
                        selected.append(instances[int(req_index)])
                elif request == name:
                    selected.extend(instances)
            instances = selected
        built.extend(instances)
    return built


def factory(head_metas, requested=None) -> Multi:
    built = decoders(head_metas, requested)
    if profile_decoder:
        from ..profiler import Profiler
        for i, d in enumerate(built):
            suffix = f'.{type(d).__name__.lower()}{i}' if len(built) > 1 else ''
            d.batch_decode = Profiler(d.batch_decode,
                                      out_name=profile_decoder + suffix)
    if not built:
        raise ValueError('no decoders found for head metas '
                         f'{[type(m).__name__ for m in head_metas]}')
    LOG.debug('built %d decoders', len(built))
    return Multi(built)
