"""Eval CLI (reference ``eval.py:39-310``).

Example:
    python -m openpifpaf_tpu.eval_cli --dataset cocokp --checkpoint model
"""

import argparse
import json
import logging
import os
import sys
import time

from . import __version__, datasets, decoder, logger
from .predictor import Predictor
from .training import checkpoint as ckpt_mod

LOG = logging.getLogger(__name__)


class Evaluator:
    skip_epoch0 = True
    skip_existing = True
    show_final_image = False
    show_final_ground_truth = False
    n_images = None
    loader_warmup = 3.0
    bf16 = False
    backbone_engine = 'auto'
    #: eval reports a per-stage nn/decoder timing split; the strict
    #: loop keeps it accurate (pipelining shifts overlapped decode
    #: waits into the next batch's nn time) — opt in for throughput
    pipeline_decode = False
    hflip_tta = False

    def __init__(self, dataset_name: str):
        self.dataset_name = dataset_name
        self.datamodule = datasets.factory(dataset_name)
        self.data_loader = self.datamodule.eval_loader()
        self.metrics = None

    def accumulate(self, predictor, metrics):
        prediction_loader = predictor.dataloader(self.data_loader)
        if self.loader_warmup:
            LOG.info('Data loader warmup (%.1fs) ...', self.loader_warmup)
            time.sleep(self.loader_warmup)
        total_start = time.perf_counter()
        loop_start = time.perf_counter()

        last = None
        for image_i, (pred, gt_anns, image_meta) in enumerate(prediction_loader):
            LOG.info('image %d / %d, last loop: %.3fs, images per second=%.1f',
                     image_i, len(self.data_loader),
                     time.perf_counter() - loop_start,
                     image_i / max(1e-6, time.perf_counter() - total_start))
            loop_start = time.perf_counter()
            for metric in metrics:
                metric.accumulate(pred, image_meta, ground_truth=gt_anns)
            last = (pred, gt_anns, image_meta)
            if self.n_images is not None and image_i >= self.n_images - 1:
                break

        total_time = time.perf_counter() - total_start
        if self.show_final_image and last is not None:
            self._show_final(*last)
        return total_time

    def _show_final(self, pred, gt_anns, image_meta):
        """--eval-show-final-image [-ground-truth]
        (reference eval.py:128-145)."""
        import PIL.Image
        from . import show

        with PIL.Image.open(image_meta['local_file_path']) as f:
            image = f.convert('RGB')
        annotation_painter = show.AnnotationPainter()
        out_name = f'{self.dataset_name}-eval-final-image.png'
        with show.image_canvas(image, fig_file=out_name, show=False) as ax:
            annotation_painter.annotations(ax, pred)
            if self.show_final_ground_truth:
                annotation_painter.annotations(
                    ax, gt_anns, color='grey')
        LOG.info('final image written: %s', out_name)

    def evaluate(self, output: str, *, checkpoint=None, model=None,
                 variables=None, write_predictions=False):
        predictor = Predictor(
            checkpoint=checkpoint, model=model, variables=variables,
            head_metas=self.datamodule.head_metas)
        predictor.bf16 = self.bf16
        predictor.backbone_engine = self.backbone_engine
        predictor.pipeline_decode = self.pipeline_decode
        predictor.hflip_tta = self.hflip_tta
        metrics = self.datamodule.metrics()

        total_time = self.accumulate(predictor, metrics)

        # model stats
        counted_ops = None
        file_size = -1
        if checkpoint and os.path.exists(checkpoint + '.arrays'):
            file_size = sum(
                os.path.getsize(os.path.join(dirpath, f))
                for dirpath, _, files in os.walk(checkpoint + '.arrays')
                for f in files)

        # write
        for metric_i, metric in enumerate(metrics):
            this_output = output if len(metrics) == 1 \
                else f'{output}.{metric_i}'
            if write_predictions:
                metric.write_predictions(this_output)

            stats = metric.stats()
            additional = {
                'total_time': total_time,
                'checkpoint': checkpoint,
                'dataset': self.dataset_name,
                'count_ops': counted_ops,
                'file_size': file_size,
                'n_images': predictor.total_images,
                'decoder_time': predictor.total_decoder_time,
                'nn_time': predictor.total_nn_time,
            }
            stats.update(additional)
            with open(this_output + '.stats.json', 'w') as f:
                json.dump(stats, f)
            LOG.info('stats:\n%s', json.dumps(stats, indent=4))
            LOG.info(
                'time per image: total %.3fs, nn %.3fs, dec %.3fs',
                total_time / max(1, predictor.total_images),
                predictor.total_nn_time / max(1, predictor.total_images),
                predictor.total_decoder_time / max(1, predictor.total_images))


def cli():
    parser = argparse.ArgumentParser(
        prog='python3 -m openpifpaf_tpu.eval_cli',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument('--version', action='version',
                        version=f'OpenPifPaf-TPU {__version__}')
    parser.add_argument('--output', default=None)
    parser.add_argument('--dataset', default='cocokp')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--batch-size', default=1, type=int)
    parser.add_argument('--loader-workers', default=0, type=int)
    parser.add_argument('--n-images', '--eval-n-images', dest='n_images',
                        default=None, type=int)
    parser.add_argument('--eval-loader-warmup',
                        default=Evaluator.loader_warmup, type=float)
    parser.add_argument('--eval-show-final-image', default=False,
                        action='store_true',
                        help='show the final image with predictions')
    parser.add_argument('--eval-show-final-ground-truth', default=False,
                        action='store_true',
                        help='show the final image with ground truth '
                             'annotations')
    parser.add_argument('--eval-no-skip-epoch0', dest='eval_skip_epoch0',
                        default=True, action='store_false',
                        help='do not skip epoch 0 in --watch')
    parser.add_argument('--eval-no-skip-existing', dest='eval_skip_existing',
                        default=True, action='store_false',
                        help='re-evaluate existing stats files in --watch')
    parser.add_argument('--bf16', default=False, action='store_true',
                        help='run the backbone in bfloat16')
    parser.add_argument('--backbone-engine', default='auto',
                        choices=('auto', 'flax', 'folded', 'halves',
                                 'pallas', 'stencil', 'dwpallas'),
                        help='serving backbone engine (see predict)')
    parser.add_argument('--pipeline-decode',
                        dest='pipeline_decode', default=False,
                        action='store_true',
                        help='overlap batch i+1 dispatch with batch i '
                             'decode (higher throughput, but the '
                             'per-stage nn/decoder timing split in the '
                             'stats becomes approximate: waiting for '
                             'the overlapped decode is attributed to '
                             'the next forward)')
    parser.add_argument('--hflip-tta', default=False, action='store_true',
                        help='average fields with the mirrored-image '
                             'forward pass')
    parser.add_argument('--write-predictions', '--eval-write-predictions',
                        dest='write_predictions', default=False,
                        action='store_true')
    parser.add_argument('--watch', default=False, nargs='?', const=60,
                        type=int,
                        help='poll for new checkpoints with this interval')
    parser.add_argument('--debug', default=False, action='store_true')
    logger.cli(parser)
    decoder.factory.cli(parser)
    for dm in datasets.DATAMODULES.values():
        dm.cli(parser)

    args = parser.parse_args()
    logger.configure(args, LOG)
    decoder.factory.configure(args)
    for dm in datasets.DATAMODULES.values():
        dm.configure(args)
    return args


def main():
    args = cli()

    for dm in datasets.DATAMODULES.values():
        dm.batch_size = args.batch_size
        dm.loader_workers = args.loader_workers

    Evaluator.loader_warmup = args.eval_loader_warmup
    Evaluator.show_final_image = args.eval_show_final_image
    Evaluator.show_final_ground_truth = args.eval_show_final_ground_truth
    Evaluator.skip_epoch0 = args.eval_skip_epoch0
    Evaluator.skip_existing = args.eval_skip_existing

    evaluator = Evaluator(args.dataset)
    evaluator.n_images = args.n_images
    evaluator.bf16 = args.bf16
    evaluator.backbone_engine = args.backbone_engine
    evaluator.pipeline_decode = args.pipeline_decode
    evaluator.hflip_tta = args.hflip_tta

    if args.output is None:
        args.output = (args.checkpoint or 'eval') + '.eval-' + args.dataset

    if args.watch:
        # reference eval.py:216-240: poll the checkpoint pattern and
        # evaluate each new checkpoint as it appears
        import glob

        evaluated = set()
        while True:
            for meta_file in sorted(glob.glob(args.checkpoint + '.epoch*.json')):
                checkpoint = meta_file[:-len('.json')]
                if checkpoint in evaluated:
                    continue
                if not os.path.exists(checkpoint + '.arrays'):
                    continue
                if (Evaluator.skip_epoch0
                        and checkpoint.endswith('.epoch000')):
                    continue
                # multi-metric datamodules write '<output>.<i>.stats.json'
                # instead of '<output>.stats.json'; glob covers both so
                # already-evaluated checkpoints survive a watch restart
                if (Evaluator.skip_existing and glob.glob(
                        checkpoint + '.eval-' + args.dataset
                        + '*.stats.json')):
                    evaluated.add(checkpoint)
                    continue
                LOG.info('watch: evaluating %s', checkpoint)
                evaluator = Evaluator(args.dataset)
                evaluator.n_images = args.n_images
                evaluator.bf16 = args.bf16
                evaluator.backbone_engine = args.backbone_engine
                evaluator.pipeline_decode = args.pipeline_decode
                evaluator.hflip_tta = args.hflip_tta
                evaluator.evaluate(
                    checkpoint + '.eval-' + args.dataset,
                    checkpoint=checkpoint,
                    write_predictions=args.write_predictions)
                evaluated.add(checkpoint)
            time.sleep(args.watch)
        return

    evaluator.evaluate(args.output, checkpoint=args.checkpoint,
                       write_predictions=args.write_predictions)


if __name__ == '__main__':
    main()
