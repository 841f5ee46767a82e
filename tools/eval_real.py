"""Real-data COCO AP validation (opt-in; runnable the moment data exists).

This environment has zero egress, so COCO val2017 cannot be downloaded
here — but everything else is in place. Given a val2017 checkout and a
checkpoint (convert a reference torch checkpoint with
``python -m openpifpaf_tpu.migrate``), this script reproduces the
reference's eval protocol end-to-end (reference
``plugins/coco/cocokp.py:316-337`` + ``guide/predict_cli`` settings:
641px long edge, batched, rescaled annotations filter, Coco keypoint
metric with max 20 detections per image) and prints the AP table.

Usage:
    python tools/eval_real.py \
        --checkpoint shufflenetv2k16 \
        --annotations /data/coco/annotations/person_keypoints_val2017.json \
        --image-dir /data/coco/val2017 \
        [--n-images 500] [--batch-size 8] [--long-edge 641]

The defaults mirror the reference's published protocol, so the resulting
AP is directly comparable to BASELINE.md's 67.1 (shufflenetv2k16) /
71.4 (shufflenetv2k30) numbers.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument('--checkpoint', required=True,
                        help='checkpoint path or shorthand (migrated '
                             'reference checkpoints work: see migrate CLI)')
    parser.add_argument('--annotations', required=True,
                        help='person_keypoints_val2017.json')
    parser.add_argument('--image-dir', required=True, help='val2017/')
    parser.add_argument('--n-images', default=None, type=int)
    parser.add_argument('--batch-size', default=8, type=int)
    parser.add_argument('--long-edge', default=641, type=int)
    parser.add_argument('--output', default='eval_real')
    parser.add_argument('--write-predictions', default=False,
                        action='store_true')
    args = parser.parse_args()

    for path in (args.annotations, args.image_dir):
        if not os.path.exists(path):
            parser.error(f'{path} does not exist — mount COCO val2017 '
                         'first (no egress in this environment)')

    from openpifpaf_tpu import eval_cli

    argv = [
        '--dataset', 'cocokp',
        '--checkpoint', args.checkpoint,
        '--batch-size', str(args.batch_size),
        '--output', args.output,
        # reference protocol: rescale to long edge, eval-side filters on
        # (eval_annotations/eval_image_dir default to the val split)
        '--cocokp-val-annotations', args.annotations,
        '--cocokp-val-image-dir', args.image_dir,
        '--coco-eval-long-edge', str(args.long_edge),
    ]
    if args.n_images is not None:
        argv += ['--n-images', str(args.n_images)]
    if args.write_predictions:
        argv += ['--write-predictions']

    sys.argv = [sys.argv[0]] + argv
    eval_cli.main()


if __name__ == '__main__':
    main()
