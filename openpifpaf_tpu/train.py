"""Train CLI (reference ``train.py:18-196``).

Example:
    python -m openpifpaf_tpu.train --dataset cocokp --basenet shufflenetv2k16
"""

import argparse
import datetime
import logging
import os
import socket

import jax

from . import __version__, datasets, encoder, logger, plugin
from .models import factory as models_factory
from .training import checkpoint as ckpt_mod
from .training import losses, optimize
from .training.trainer import Trainer, make_mesh

LOG = logging.getLogger(__name__)


def default_output_file(args):
    base_name = args.basenet or 'default'
    now = datetime.datetime.now().strftime('%y%m%d-%H%M%S')
    out = f'outputs/{base_name}-{now}-{args.dataset}'
    # queued cluster jobs may start at the same second; disambiguate with
    # the job id (reference train.py:26-29)
    if os.getenv('SLURM_JOB_ID'):
        out += f'-slurm{os.getenv("SLURM_JOB_ID")}'
    return out


def cli():
    parser = argparse.ArgumentParser(
        prog='python3 -m openpifpaf_tpu.train',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument('--version', action='version',
                        version=f'OpenPifPaf-TPU {__version__}')
    parser.add_argument('--output', default=None, help='output file')
    parser.add_argument('--dataset', default='cocokp')
    parser.add_argument('--dataset-weights', default=None, nargs='+',
                        type=float,
                        help='round-robin sampling weights for multi-'
                             'dataset training (reference '
                             'datasets/factory.py:27)')
    parser.add_argument('--basenet', default='shufflenetv2k16')
    parser.add_argument('--checkpoint', default=None,
                        help='resume from checkpoint')
    parser.add_argument('--upsample', default=1, type=int,
                        help='head upsample stride')
    parser.add_argument('--batch-size', default=8, type=int)
    parser.add_argument('--loader-workers', default=0, type=int)
    parser.add_argument('--n-devices', default=None, type=int,
                        help='restrict the mesh to the first N devices')
    parser.add_argument('--spatial-partitions', default=1, type=int,
                        help='shard image height over this many devices '
                             '(2-D data x space mesh; use when the '
                             'per-device batch would drop below 1 or to '
                             'cut activation memory at high resolution)')
    parser.add_argument('--seed', default=42, type=int)
    parser.add_argument('--profile', default=None, nargs='?',
                        const='jax_trace',
                        help='capture a jax.profiler trace of each train '
                             'step into this directory prefix')
    parser.add_argument('--debug', default=False, action='store_true')

    logger.cli(parser)
    Trainer.cli(parser)
    optimize.cli(parser)
    models_factory.cli(parser)
    losses.Factory.cli(parser)
    encoder.cli(parser)
    for dm in datasets.DATAMODULES.values():
        dm.cli(parser)

    args = parser.parse_args()

    logger.configure(args, LOG)
    Trainer.configure(args)
    models_factory.configure(args)
    losses.Factory.configure(args)
    encoder.configure(args)
    for dm in datasets.DATAMODULES.values():
        dm.configure(args)

    if args.output is None:
        args.output = default_output_file(args)
        os.makedirs('outputs', exist_ok=True)
    return args


def main():
    args = cli()

    from .datasets.multimodule import MultiDataModule
    MultiDataModule.weights = args.dataset_weights
    datamodule = datasets.factory(args.dataset)
    datamodule.batch_size = args.batch_size
    datamodule.loader_workers = args.loader_workers

    if args.checkpoint:
        args.checkpoint = models_factory.resolve_checkpoint(args.checkpoint)
        model, variables = ckpt_mod.load_shell(
            args.checkpoint, head_metas=datamodule.head_metas,
            head_consolidation=models_factory.HEAD_CONSOLIDATION)
        loaded_meta = ckpt_mod.LAST_META or {}
        # resume from the checkpoint's epoch (reference factory.py:268-274)
        start_epoch = int(loaded_meta.get('epoch') or 0)
        # the checkpoint's architecture wins over the --basenet default so
        # that checkpoints written by this run remain loadable
        if loaded_meta.get('base_name'):
            args.basenet = loaded_meta['base_name']
        for family, options in (loaded_meta.get('backbone_options')
                                or {}).items():
            target = {'shufflenetv2k': models_factory.SHUFFLENETV2K_OPTIONS,
                      'resnet': models_factory.RESNET_OPTIONS}.get(family)
            if target is not None:
                target.update(options)
    else:
        net_factory = models_factory.Factory(
            base_name=args.basenet, upsample_stride=args.upsample)
        model, init_fn = net_factory.from_scratch(datamodule.head_metas)
        variables = init_fn(jax.random.PRNGKey(args.seed))
        start_epoch = 0

    loss_fn = losses.Factory().factory(datamodule.head_metas)

    train_loader = datamodule.train_loader()
    val_loader = datamodule.val_loader()
    LOG.info('training batches: %d, validation batches: %d',
             len(train_loader), len(val_loader))

    optimizer, schedule = optimize.factory_optimizer(
        args, training_batches_per_epoch=len(train_loader))

    n_devices = args.n_devices or len(jax.devices())
    spatial = max(1, args.spatial_partitions)
    if args.batch_size * spatial < n_devices:
        LOG.warning('batch size %d x spatial %d < %d devices: shrinking '
                    'the data mesh',
                    args.batch_size, spatial, n_devices)
        n_devices = max(spatial, args.batch_size * spatial)
    mesh = make_mesh(n_devices, spatial=spatial)
    LOG.info('mesh: %s', mesh)

    trainer = Trainer(
        model, loss_fn, optimizer, schedule, args.output,
        variables=variables,
        mesh=mesh,
        model_meta_data={
            'base_name': args.basenet,
            'backbone_options': {
                'shufflenetv2k': dict(models_factory.SHUFFLENETV2K_OPTIONS),
                'resnet': dict(models_factory.RESNET_OPTIONS),
            },
            'head_metas': [ckpt_mod.headmeta_to_dict(m)
                           for m in datamodule.head_metas],
            'args': vars(args),
            'version': __version__,
            'hostname': socket.gethostname(),
        })
    if args.profile:
        from .profiler import JaxProfiler
        trainer.train_step = JaxProfiler(trainer.train_step,
                                         out_name=args.profile)
    trainer.loop(train_loader, val_loader, start_epoch)


if __name__ == '__main__':
    main()
