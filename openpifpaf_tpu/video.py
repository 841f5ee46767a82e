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
    parser.add_argument('--separate-debug-ax', default=False,
                        action='store_true',
                        help='debug overlays on a separate axis next to '
                             'the annotated frame')
    parser.add_argument('--show', default=False, action='store_true')
    parser.add_argument('--bf16', default=False, action='store_true',
                        help='run the backbone in bfloat16 (MXU-native)')
    parser.add_argument('--backbone-engine', default='auto',
                        choices=('auto', 'flax', 'folded', 'halves',
                                 'pallas', 'stencil', 'dwpallas'),
                        help='serving backbone engine (see predict)')
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
    predictor.bf16 = args.bf16
    predictor.backbone_engine = args.backbone_engine
    # no pipelining here: the video loop is frame-at-a-time by design
    # (live display wants the current frame's poses, not +1 latency)
    predictor.pipeline_decode = False
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

    # with a usable writer (virtualcam or ffmpeg), render through
    # AnimationFrame (reference video.py:114-143); without ffmpeg, fall
    # back to per-frame jpgs next to the requested output name
    animation = None
    painter = None
    use_animation = False
    if args.video_output == 'virtualcam' or args.show:
        use_animation = True
    elif args.video_output:
        import matplotlib.animation as manimation
        use_animation = 'ffmpeg' in manimation.writers.list()
        if not use_animation:
            LOG.warning('ffmpeg not available: writing per-frame jpgs '
                        'instead of %s', args.video_output)

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
                    if not args.show:
                        import matplotlib
                        matplotlib.use('Agg')
                    from . import show, visualizer
                    if painter is None:
                        painter = show.AnnotationPainter()
                    if use_animation:
                        if animation is None:
                            animation = show.AnimationFrame(
                                video_output=args.video_output,
                                second_visual=args.separate_debug_ax)
                            ax, ax_second = animation.frame_init(raw_image)
                            visualizer.Base.common_ax = (
                                ax_second if args.separate_debug_ax else ax)
                        ax, _ = animation.frame(raw_image)
                        painter.annotations(ax, pred)
                        animation.frame_done()
                    else:
                        from .show.canvas import image_canvas
                        out_name = (args.video_output
                                    + f'.{frame_meta.get("frame_i"):06d}'
                                      '.jpg')
                        with image_canvas(raw_image, out_name,
                                          show=False) as ax:
                            painter.annotations(ax, pred)

                LOG.info('frame %d: %d annotations',
                         frame_meta.get('frame_i', -1), len(pred))
    finally:
        if json_f is not None:
            json_f.close()
        if animation is not None:
            animation.close()


if __name__ == '__main__':
    main()
