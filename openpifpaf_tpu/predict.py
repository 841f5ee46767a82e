"""Predict CLI (reference ``predict.py:17-128``).

Example:
    python -m openpifpaf_tpu.predict image.jpg --checkpoint model --json-output
"""

import argparse
import glob
import json
import logging
import os

from . import __version__, decoder, logger
from .predictor import Predictor

LOG = logging.getLogger(__name__)


def cli():
    parser = argparse.ArgumentParser(
        prog='python3 -m openpifpaf_tpu.predict',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument('--version', action='version',
                        version=f'OpenPifPaf-TPU {__version__}')
    parser.add_argument('images', nargs='*', help='input images')
    parser.add_argument('--glob', help='glob expression for input images')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--long-edge', default=None, type=int,
                        help='rescale the long side of the image')
    parser.add_argument('--batch-size', default=1, type=int)
    parser.add_argument('--bf16', default=False, action='store_true',
                        help='run the backbone in bfloat16 (MXU-native); '
                             'heads and decode stay float32')
    parser.add_argument('--backbone-engine', default='auto',
                        choices=('auto', 'flax', 'folded', 'halves',
                                 'pallas', 'stencil', 'dwpallas'),
                        help='serving backbone engine (auto: BN-folded '
                             'lane-aligned halves formulation when the '
                             'backbone channel halves are 128-multiples, '
                             'flax graph otherwise)')
    parser.add_argument('--no-pipeline-decode',
                        dest='pipeline_decode', default=True,
                        action='store_false',
                        help='disable the 1-deep serving pipeline (dispatch of batch i+1 before batch i decode results are fetched)')
    parser.add_argument('--hflip-tta', default=False, action='store_true',
                        help='average fields with the mirrored-image '
                             'forward pass (test-time augmentation)')
    parser.add_argument('--multi-scale', default=False, action='store_true',
                        help='decode at multiple scales and merge with '
                             'OKS suppression (test-time augmentation)')
    parser.add_argument('--n-devices', default=None, type=int,
                        help='shard the forward batch over the first N '
                             'devices (batch size must be divisible)')
    parser.add_argument('--spatial-devices', default=None, type=int,
                        help='additionally shard the image height over '
                             'this many of the --n-devices (2-D data x '
                             'space serving mesh)')
    parser.add_argument('-o', '--image-output', default=None, nargs='?',
                        const=True, help='image output file or directory')
    parser.add_argument('--json-output', default=None, nargs='?',
                        const=True, help='json output file or directory')
    parser.add_argument('--precise-rescaling', dest='fast_rescaling',
                    default=True, action='store_false',
                    help='use more exact image rescaling (requires'
                         ' scipy)')
    parser.add_argument('--debug', default=False, action='store_true')
    logger.cli(parser)
    decoder.factory.cli(parser)
    from . import visualizer as visualizer_mod
    from .show import cli as show_cli_fn, configure as show_configure_fn
    visualizer_mod.cli(parser)
    show_cli_fn(parser)

    args = parser.parse_args()
    logger.configure(args, LOG)
    decoder.factory.configure(args)
    visualizer_mod.configure(args)
    show_configure_fn(args)

    if args.glob:
        args.images += glob.glob(args.glob)
    if not args.images:
        raise Exception('no image files given')
    return args


def out_name(arg, in_name, default_extension):
    """Determine an output name from args, input name and extension
    (reference predict.py:78-96)."""
    if arg is None:
        return None
    if arg is True:
        return in_name + default_extension
    if os.path.isdir(arg):
        return os.path.join(arg, os.path.basename(in_name)) + default_extension
    return arg


def main():
    args = cli()

    predictor = Predictor(checkpoint=args.checkpoint,
                      fast_rescaling=args.fast_rescaling)
    predictor.batch_size = args.batch_size
    predictor.bf16 = args.bf16
    predictor.backbone_engine = args.backbone_engine
    predictor.pipeline_decode = args.pipeline_decode
    predictor.hflip_tta = args.hflip_tta
    predictor.multi_scale = args.multi_scale
    predictor.n_devices = args.n_devices
    predictor.spatial_devices = args.spatial_devices
    predictor.long_edge = args.long_edge
    predictor.preprocess = predictor._build_preprocess()

    annotation_painter = None
    if args.image_output is not None or args.show:
        from . import show
        annotation_painter = show.AnnotationPainter()

    for pred, _, meta in predictor.images(args.images):
        json_out_name = out_name(
            args.json_output, meta['file_name'], '.predictions.json')
        if json_out_name is not None:
            LOG.debug('json output = %s', json_out_name)
            with open(json_out_name, 'w') as f:
                json.dump([ann.json_data() for ann in pred], f)

        if args.image_output is not None or args.show:
            import PIL.Image
            from .show.canvas import image_canvas
            image_out_name = out_name(
                args.image_output, meta['file_name'], '.predictions.jpg')
            with open(meta['file_name'], 'rb') as f:
                image = PIL.Image.open(f).convert('RGB')
            with image_canvas(image, image_out_name, show=args.show) as ax:
                annotation_painter.annotations(ax, pred)

        LOG.info('%s: %d annotations', meta['file_name'], len(pred))


if __name__ == '__main__':
    main()
