"""Video CLI (reference ``video.py``): webcam/file -> pose tracking.

Example:
    python -m openpifpaf_tpu.video --source video.mp4 --checkpoint model \
        --json-output out.json
"""

import argparse
import json
import logging
import os

import numpy as np

from . import __version__, decoder, logger, transforms
from .predictor import Predictor
from .stream import Stream

LOG = logging.getLogger(__name__)


def cli():
    parser = argparse.ArgumentParser(
        prog='python3 -m openpifpaf_tpu.video',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument('--version', action='version',
                        version=f'OpenPifPaf-TPU {__version__}')
    parser.add_argument('--source', default='0',
                        help='OpenCV source url or device id')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--long-edge', default=None, type=int)
    parser.add_argument('--video-output', default=None, nargs='?', const=True)
    parser.add_argument('--json-output', default=None, nargs='?', const=True)
    parser.add_argument('--scale', default=1.0, type=float)
    parser.add_argument('--start-frame', default=None, type=int)
    parser.add_argument('--start-msec', default=None, type=float)
    parser.add_argument('--max-frames', default=None, type=int)
    parser.add_argument('--crop', nargs=4, type=int, default=None)
    parser.add_argument('--rotate', default=None, type=int)
    parser.add_argument('--horizontal-flip', default=False,
                        action='store_true',
                        help='mirror the input video')
    parser.add_argument('--show', default=False, action='store_true')
    parser.add_argument('--precise-rescaling', dest='fast_rescaling',
                    default=True, action='store_false',
                    help='use more exact image rescaling (requires'
                         ' scipy)')
    parser.add_argument('--debug', default=False, action='store_true')
    logger.cli(parser)
    decoder.factory.cli(parser)
    decoder.TrackBase.cli(parser)

    args = parser.parse_args()
    logger.configure(args, LOG)
    decoder.factory.configure(args)
    decoder.TrackBase.configure(args)

    # output files
    if args.video_output is True:
        args.video_output = args.source + '.pifpaf.mp4'
        assert not os.path.exists(args.video_output)
    if args.json_output is True:
        args.json_output = args.source + '.pifpaf.json'
        assert not os.path.exists(args.json_output)
    return args


def main():
    args = cli()

    predictor = Predictor(checkpoint=args.checkpoint,
                          fast_rescaling=args.fast_rescaling)
    predictor.long_edge = args.long_edge
    predictor.preprocess = predictor._build_preprocess()

    stream = Stream(
        args.source,
        preprocess=predictor.preprocess,
        scale=args.scale,
        start_frame=args.start_frame,
        start_msec=args.start_msec,
        crop=args.crop,
        rotate=args.rotate,
        horizontal_flip=args.horizontal_flip,
        max_frames=args.max_frames,
        with_raw_image=True,
    )

    json_f = open(args.json_output, 'w') if args.json_output else None
    video_writer = None

    try:
        for raw_image, processed, anns, meta in stream:
            batch = ([raw_image], np.asarray(processed)[None], [anns], [meta])
            for pred, _, frame_meta in predictor._run_batch(batch):
                if json_f is not None:
                    json_f.write(json.dumps({
                        'frame': frame_meta.get('frame_i'),
                        'predictions': [ann.json_data() for ann in pred],
                    }) + '\n')

                if args.video_output or args.show:
                    import matplotlib
                    matplotlib.use('Agg')
                    from .show.painters import AnnotationPainter
                    from .show.canvas import image_canvas
                    painter = AnnotationPainter()
                    out_name = (args.video_output
                                + f'.{frame_meta.get("frame_i"):06d}.jpg') \
                        if args.video_output else None
                    with image_canvas(raw_image, out_name, show=args.show) as ax:
                        painter.annotations(ax, pred)

                LOG.info('frame %d: %d annotations',
                         frame_meta.get('frame_i', -1), len(pred))
    finally:
        if json_f is not None:
            json_f.close()
        if video_writer is not None:
            video_writer.release()


if __name__ == '__main__':
    main()
