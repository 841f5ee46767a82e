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


def cli(parser: argparse.ArgumentParser, *, workers=None):
    group = parser.add_argument_group('decoder configuration')
    group.add_argument('--decoder', default=None, nargs='+',
                       help='decoders to be considered, e.g. "cifcaf:0"')
    for decoder in DECODERS:
        decoder.cli(parser)


def configure(args: argparse.Namespace):
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
    if not built:
        raise ValueError('no decoders found for head metas '
                         f'{[type(m).__name__ for m in head_metas]}')
    LOG.debug('built %d decoders', len(built))
    return Multi(built)
