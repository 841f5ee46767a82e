"""Trainer: jitted, mesh-sharded training loop.

Reference: ``network/trainer.py:17-425``. TPU-native redesign:
- the whole step (forward, loss, backward, inf-norm grad clip scaled by lr,
  optimizer update, EMA) is ONE jitted function;
- data parallelism is expressed with ``jax.sharding``: the batch is sharded
  over the mesh's ``data`` axis, parameters are replicated, and XLA inserts
  the gradient all-reduce over ICI (no NCCL/DDP machinery);
- EMA follows the reference update ``ema = (1 - d) * ema + d * p``
  (trainer.py:113-118) and is applied to checkpoints before writing.
"""

import dataclasses
import logging
import sys
import time
from typing import Any, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOG = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: Any
    loss_params: Any = dataclasses.field(default_factory=dict)
    loss_state: Any = dataclasses.field(default_factory=dict)
    grad_accum: Any = dataclasses.field(default_factory=dict)


jax.tree_util.register_dataclass(
    TrainState,
    ['params', 'batch_stats', 'opt_state', 'ema_params', 'step',
     'loss_params', 'loss_state', 'grad_accum'],
    [])


def make_mesh(n_devices: Optional[int] = None, *,
              spatial: int = 1) -> Mesh:
    """Data-parallel mesh; with ``spatial > 1`` a 2-D
    ``('data', 'space')`` mesh that additionally shards the image
    height across devices (parallel.grid_mesh)."""
    from ..parallel.mesh import grid_mesh
    return grid_mesh(n_devices, spatial=spatial)


def _spatial_constraint(mesh: Optional[Mesh], images, targets):
    """On a 2-D ('data', 'space') mesh, constrain images (B, H, W, 3)
    to shard H and targets (B, F, C, fh, fw) to shard fh over 'space'.

    Field rows are image rows / stride, so the two layouts align and
    GSPMD keeps loss math local up to the halo exchanges it inserts for
    the convolutions. Applied *inside* jit (with_sharding_constraint)
    because H/fh are usually not divisible by the spatial axis — GSPMD
    pads internally, which jit-boundary in_shardings cannot."""
    if mesh is None or 'space' not in mesh.axis_names:
        return images, targets
    from ..parallel.mesh import field_sharding, image_sharding
    images = jax.lax.with_sharding_constraint(images, image_sharding(mesh))
    field = field_sharding(mesh)
    targets = tuple(
        jax.lax.with_sharding_constraint(t, field) if t is not None
        else None
        for t in targets)
    return images, targets


def _bf16_split_forward(model, model_params, batch_stats, images, *,
                        head_mask, bn_train, dropout_rng=None):
    """Mixed-precision forward: backbone compute in bfloat16 (MXU-native)
    against f32 master params, heads in f32 for full-precision regressions.

    flax BatchNorm reduces mean/var in f32 (force_float32_reductions) and
    the running stats stay in the f32 ``batch_stats`` collection, so
    mixed-precision training does not drift the BN buffers.
    """
    base_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), model_params['base_net'])
    feats, new_base_state = model.base_net.apply(
        {'params': base_params,
         'batch_stats': batch_stats.get('base_net', {})},
        images.astype(jnp.bfloat16),
        train=bn_train if bn_train is not None else True,
        mutable=['batch_stats'])
    feats = feats.astype(jnp.float32)
    head_rngs = ({'dropout': dropout_rng} if dropout_rng is not None
                 else None)
    outputs = tuple(
        hn.apply({'params': model_params[f'head_nets_{i}']},
                 feats, train=True, rngs=head_rngs)
        if head_mask is None or head_mask[i] else None
        for i, hn in enumerate(model.head_nets))
    new_batch_stats = dict(batch_stats)
    new_batch_stats['base_net'] = new_base_state['batch_stats']
    return outputs, new_batch_stats


def _head_sparsity_penalty(model_params):
    """L1 sparsity on head conv kernels: max over input channels,
    clamped, summed (reference multi_head.py:130-137)."""
    total = 0.0
    for name, tree in model_params.items():
        if not name.startswith('head_nets'):
            continue
        for leaf in jax.tree_util.tree_leaves(tree):
            if leaf.ndim == 4:  # (kh, kw, cin, cout) conv kernel
                total = total + jnp.sum(
                    jnp.clip(jnp.max(jnp.abs(leaf), axis=2), 1e-6, None))
    return total


def _accumulate_head_losses(sums, counts, head_losses):
    """Running per-field sums/counts; None entries (heads of other
    datasets in multi-dataset training) don't contribute."""
    values = [float(l) if l is not None else None for l in head_losses]
    if sums is None:
        sums = [0.0] * len(values)
        counts = [0] * len(values)
    for i, v in enumerate(values):
        if v is not None and np.isfinite(v):
            sums[i] += v
            counts[i] += 1
    return sums, counts


def _mean_head_losses(sums, counts):
    if sums is None:
        return []
    return [round(s / c, 5) if c else None for s, c in zip(sums, counts)]


def build_train_step(model, loss_fn, optimizer, schedule, *,
                     clip_grad_norm=0.0, clip_grad_value=0.0, ema_decay=0.01,
                     cross_talk=0.0, stride_apply=1, fix_bn=False,
                     bf16=False, task_sparsity_weight=0.0, remat=False,
                     mesh: Optional[Mesh] = None):
    """Returns jitted fn(state, images, targets) -> (state, loss, head_losses).

    images: (B, H, W, 3); targets: tuple of per-head target arrays
    (B, F, C, H, W) (or None for heads without targets).

    stride_apply > 1 accumulates gradient *sums* across micro-batches in
    ``state.grad_accum`` and applies them every ``stride_apply`` steps
    (reference --stride-apply, trainer.py:293). fix_bn runs batch norm on
    running statistics without updating them (reference --fix-batch-norm,
    trainer.py:273-279).
    """

    def step_fn(state: TrainState, images, targets):
        head_mask = tuple(t is not None for t in targets)
        images, targets = _spatial_constraint(mesh, images, targets)
        if cross_talk:
            # train-time input cross-talk augmentation: blend each image
            # with the previous batch element (reference nets.py:51-60)
            images = images + jnp.roll(images, 1, axis=0) * cross_talk

        # per-step dropout rng (only consumed when a head has dropout,
        # --cf4-dropout)
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(4242),
                                         state.step)

        def compute_loss(opt_params):
            if bf16:
                outputs, new_batch_stats = _bf16_split_forward(
                    model, opt_params['model'], state.batch_stats, images,
                    head_mask=head_mask,
                    bn_train=False if fix_bn else None,
                    dropout_rng=dropout_rng)
            else:
                outputs, new_model_state = model.apply(
                    {'params': opt_params['model'],
                     'batch_stats': state.batch_stats},
                    images, train=True, head_mask=head_mask,
                    bn_train=False if fix_bn else None,
                    rngs={'dropout': dropout_rng},
                    mutable=['batch_stats'])
                new_batch_stats = new_model_state['batch_stats']
            total, head_losses, new_loss_state = loss_fn(
                outputs, targets, opt_params['loss'], state.loss_state)
            if task_sparsity_weight:
                total = total + task_sparsity_weight * \
                    _head_sparsity_penalty(opt_params['model'])
            return total, (head_losses, new_batch_stats,
                           new_loss_state)

        if remat:
            # coarse rematerialization: store only the loss inputs and
            # recompute the forward during backward, trading ~1 forward
            # of FLOPs for O(activations) of HBM -- fits larger
            # crops/batches (--remat)
            loss_for_grad = jax.checkpoint(compute_loss)
        else:
            loss_for_grad = compute_loss

        opt_params = {'model': state.params, 'loss': state.loss_params}
        (total, (head_losses, new_batch_stats, new_loss_state)), grads = \
            jax.value_and_grad(loss_for_grad, has_aux=True)(opt_params)

        if stride_apply > 1:
            grads = jax.tree_util.tree_map(
                lambda a, g: a + g, state.grad_accum, grads)
            grads_raw = grads  # accumulator keeps unclipped sums
            apply_flag = (state.step + 1) % stride_apply == 0
        else:
            apply_flag = None

        lr = schedule(state.step)
        if clip_grad_norm:
            # reference: inf-norm clip at clip_grad_norm / lr (trainer.py:191-202).
            # The norm is taken over the flat concatenation of all
            # gradients — one fused HBM pass instead of a per-leaf
            # max(abs(g)) kernel per parameter tensor. Step time is
            # unchanged (50.6 ms either way; the per-leaf reductions
            # overlapped with other work — tools/exp_train_roofline.py),
            # but the single pass keeps the profile legible and avoids
            # ~115 launches/step of scheduler pressure.
            max_norm = clip_grad_norm / jnp.maximum(lr, 1e-12)
            flat_grads, _ = jax.flatten_util.ravel_pytree(grads)
            total_norm = jnp.max(jnp.abs(flat_grads))
            scale = jnp.minimum(1.0, max_norm / (total_norm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        if clip_grad_value:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.clip(g, -clip_grad_value, clip_grad_value), grads)

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, opt_params)
        import optax
        new_opt_params = optax.apply_updates(opt_params, updates)

        if apply_flag is not None:
            # select between the applied and the deferred update; the
            # optimizer state and params only advance on apply steps
            def select(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(apply_flag, a, b), new, old)
            new_opt_params = select(
                new_opt_params,
                {'model': state.params, 'loss': state.loss_params})
            new_opt_state = select(new_opt_state, state.opt_state)
            new_grad_accum = jax.tree_util.tree_map(
                lambda g: jnp.where(apply_flag, jnp.zeros_like(g), g),
                grads_raw)
        else:
            new_grad_accum = state.grad_accum
        new_params = new_opt_params['model']

        new_ema = jax.tree_util.tree_map(
            lambda e, p: (1.0 - ema_decay) * e + ema_decay * p,
            state.ema_params, new_params)
        if apply_flag is not None:
            new_ema = jax.tree_util.tree_map(
                lambda n, o: jnp.where(apply_flag, n, o),
                new_ema, state.ema_params)

        new_state = TrainState(
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            step=state.step + 1,
            loss_params=new_opt_params['loss'],
            loss_state=new_loss_state,
            grad_accum=new_grad_accum,
        )
        return new_state, total, head_losses

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_sharded = NamedSharding(mesh, P('data'))
        return jax.jit(
            step_fn,
            in_shardings=(replicated, batch_sharded, batch_sharded),
            out_shardings=(replicated, replicated, replicated),
            donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))


def build_val_step(model, loss_fn, *, fix_bn=False,
                   mesh: Optional[Mesh] = None):
    def val_fn(state: TrainState, images, targets):
        head_mask = tuple(t is not None for t in targets)
        images, targets = _spatial_constraint(mesh, images, targets)
        # reference validates in train mode without grad (trainer.py:345-358)
        outputs, _ = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            images, train=True, head_mask=head_mask,
            bn_train=False if fix_bn else None, mutable=['batch_stats'])
        total, head_losses, _ = loss_fn(
            outputs, targets, state.loss_params, state.loss_state)
        return total, head_losses

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_sharded = NamedSharding(mesh, P('data'))
        return jax.jit(val_fn, in_shardings=(
            replicated, batch_sharded, batch_sharded))
    return jax.jit(val_fn)


class Trainer:
    epochs = None
    clip_grad_norm = 0.0
    clip_grad_value = 0.0
    cross_talk = 0.0
    log_interval = 11
    val_interval = 1
    ema_decay = 0.01
    stride_apply = 1
    remat = False
    fix_batch_norm = False  # False | True | epoch number
    bf16 = False
    n_train_batches = None
    n_val_batches = None

    def __init__(self, model, loss_fn, optimizer, schedule, out, *,
                 variables, mesh=None, model_meta_data=None):
        self.model = model
        self.loss_fn = loss_fn
        self.optimizer = optimizer
        self.out = out
        self.mesh = mesh
        self.model_meta_data = model_meta_data or {}

        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        loss_params = loss_fn.init_params()
        grad_accum = {}
        if self.stride_apply > 1:
            grad_accum = jax.tree_util.tree_map(
                jnp.zeros_like, {'model': params, 'loss': loss_params})
        self.state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=optimizer.init({'model': params, 'loss': loss_params}),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            step=jnp.zeros((), dtype=jnp.int32),
            loss_params=loss_params,
            loss_state=loss_fn.init_state(),
            grad_accum=grad_accum,
        )

        self.schedule = schedule
        self._built_fix_bn = None
        self._build_steps(fix_bn=self._fix_bn_active(0))

    def _fix_bn_active(self, epoch):
        if self.fix_batch_norm is True:
            return True
        if self.fix_batch_norm is not False:
            return self.fix_batch_norm <= epoch
        return False

    def _build_steps(self, *, fix_bn):
        if self._built_fix_bn == fix_bn:
            return
        if fix_bn:
            LOG.info('fix batchnorm')
        self.train_step = build_train_step(
            self.model, self.loss_fn, self.optimizer, self.schedule,
            clip_grad_norm=self.clip_grad_norm,
            clip_grad_value=self.clip_grad_value,
            ema_decay=self.ema_decay,
            cross_talk=self.cross_talk,
            stride_apply=self.stride_apply,
            fix_bn=fix_bn,
            bf16=self.bf16 and hasattr(self.model, 'base_net'),
            task_sparsity_weight=getattr(self.loss_fn,
                                         'task_sparsity_weight', 0.0),
            remat=self.remat,
            mesh=self.mesh)
        self.val_step = build_val_step(
            self.model, self.loss_fn, fix_bn=fix_bn, mesh=self.mesh)
        self._built_fix_bn = fix_bn

    @classmethod
    def cli(cls, parser):
        group = parser.add_argument_group('trainer')
        group.add_argument('--epochs', default=75, type=int)
        group.add_argument('--train-batches', default=None, type=int)
        group.add_argument('--val-batches', default=None, type=int)
        group.add_argument('--clip-grad-norm', default=cls.clip_grad_norm,
                           type=float)
        group.add_argument('--clip-grad-value', default=cls.clip_grad_value,
                           type=float)
        group.add_argument('--log-interval', default=cls.log_interval, type=int)
        group.add_argument('--val-interval', default=cls.val_interval, type=int)
        group.add_argument('--ema', default=cls.ema_decay, type=float)
        group.add_argument('--cross-talk', default=cls.cross_talk, type=float,
                           help='[experimental] input cross-talk strength')
        group.add_argument('--stride-apply', default=cls.stride_apply,
                           type=int,
                           help='apply and reset gradients every n batches')
        group.add_argument('--remat', default=cls.remat, action='store_true',
                           help='rematerialize the forward during backward '
                                '(less activation memory, ~1 extra forward '
                                'of compute; fits larger crops/batches)')
        group.add_argument('--fix-batch-norm',
                           default=False, const=True, type=int, nargs='?',
                           help='fix batch norm running statistics '
                                '(optionally specify start epoch)')
        group.add_argument('--bf16', default=False, action='store_true',
                           help='mixed-precision training: backbone compute '
                                'in bfloat16 (MXU-native), f32 master '
                                'weights, heads and loss in f32')

    @classmethod
    def configure(cls, args):
        cls.epochs = args.epochs
        cls.n_train_batches = args.train_batches
        cls.n_val_batches = args.val_batches
        cls.clip_grad_norm = args.clip_grad_norm
        cls.clip_grad_value = args.clip_grad_value
        cls.log_interval = args.log_interval
        cls.val_interval = args.val_interval
        cls.ema_decay = args.ema
        cls.cross_talk = args.cross_talk
        cls.stride_apply = args.stride_apply
        cls.remat = args.remat
        cls.fix_batch_norm = args.fix_batch_norm
        cls.bf16 = args.bf16

    def loop(self, train_loader, val_loader, start_epoch=0):
        # reference trainer.py:58-61: a config line names the per-head
        # loss fields so the logs CLI can label head-loss panels
        LOG.info({
            'type': 'config',
            'field_names': list(getattr(self.loss_fn, 'field_names', [])),
            'argv': sys.argv,
        })
        if start_epoch and int(self.state.step) == 0:
            # resumed run: the lr schedule is driven by the step counter
            self.state = dataclasses.replace(
                self.state,
                step=jnp.asarray(start_epoch * len(train_loader),
                                 dtype=jnp.int32))
        for epoch in range(start_epoch, self.epochs):
            if epoch == 0:
                self.write_model(0, final=False)
            if hasattr(train_loader, 'set_epoch'):
                train_loader.set_epoch(epoch)
            self.train(train_loader, epoch)
            if (epoch + 1) % self.val_interval == 0 or epoch + 1 == self.epochs:
                self.write_model(epoch + 1, epoch + 1 == self.epochs)
                self.val(val_loader, epoch + 1)

    def _prepare_targets(self, targets, metas):
        """Order per-head targets by meta['head_indices']."""
        n_heads = len(self.model.head_nets)
        head_indices = metas[0].get('head_indices',
                                    list(range(len(targets))))
        if len(targets) == n_heads and len(head_indices) < n_heads:
            # already expanded into global head slots by MultiLoader
            # (None marks heads of the other datasets)
            return tuple(jnp.asarray(t) if t is not None else None
                         for t in targets)
        out = [None] * n_heads
        for t, head_i in zip(targets, head_indices):
            out[head_i] = jnp.asarray(t)
        return tuple(out)

    def train(self, loader, epoch):
        self._build_steps(fix_bn=self._fix_bn_active(epoch))
        start_time = time.time()
        epoch_loss = 0.0
        epoch_head_losses = None
        epoch_head_counts = None
        n = 0
        last_batch_start = time.time()
        for batch_i, (images, targets, metas) in enumerate(loader):
            if self.n_train_batches and batch_i >= self.n_train_batches:
                break
            data_time = time.time() - last_batch_start

            targets = self._prepare_targets(targets, metas)
            self.state, loss, head_losses = self.train_step(
                self.state, jnp.asarray(images), targets)

            if batch_i % self.log_interval == 0:
                loss_v = float(loss)
                lr = float(self.schedule(self.state.step - 1))
                LOG.info({
                    'type': 'train', 'epoch': epoch, 'batch': batch_i,
                    'n_batches': len(loader),
                    'time': round(time.time() - last_batch_start, 3),
                    'data_time': round(data_time, 3),
                    'lr': round(lr, 8),
                    'loss': round(loss_v, 3),
                    'head_losses': [round(float(l), 3) if l is not None else None
                                    for l in head_losses],
                    **({'mtl_sigmas': [
                        # effective clamped log-sigmas (losses.py applies
                        # 3*tanh(x/3) before use)
                        round(float(3.0 * np.tanh(v / 3.0)), 3)
                        for v in np.asarray(
                            self.state.loss_params['log_sigmas'])]}
                       if 'log_sigmas' in (self.state.loss_params or {})
                       else {}),
                })
            loss_value = float(loss)
            if not np.isfinite(loss_value):
                # fail fast like the reference (losses/composite.py:134-136)
                raise ValueError(
                    f'non-finite loss {loss_value} in epoch {epoch} '
                    f'batch {batch_i}')
            epoch_loss += loss_value
            epoch_head_losses, epoch_head_counts = _accumulate_head_losses(
                epoch_head_losses, epoch_head_counts, head_losses)
            n += 1
            last_batch_start = time.time()

        LOG.info({
            'type': 'train-epoch', 'epoch': epoch + 1,
            'loss': round(epoch_loss / max(1, n), 5),
            'head_losses': _mean_head_losses(epoch_head_losses,
                                             epoch_head_counts),
            'time': round(time.time() - start_time, 1),
            'n_batches': n,
        })

    def val(self, loader, epoch):
        # reference: fix-BN check in val uses epoch-1 (trainer.py:358-359)
        self._build_steps(fix_bn=self._fix_bn_active(epoch - 1))
        start_time = time.time()
        epoch_loss = 0.0
        head_sums = None
        head_counts = None
        n = 0
        for batch_i, (images, targets, metas) in enumerate(loader):
            if self.n_val_batches and batch_i >= self.n_val_batches:
                break
            targets = self._prepare_targets(targets, metas)
            loss, head_losses = self.val_step(
                self.state, jnp.asarray(images), targets)
            epoch_loss += float(loss)
            head_sums, head_counts = _accumulate_head_losses(
                head_sums, head_counts, head_losses)
            n += 1
        LOG.info({
            'type': 'val-epoch', 'epoch': epoch,
            'loss': round(epoch_loss / max(1, n), 5),
            'head_losses': _mean_head_losses(head_sums, head_counts),
            'time': round(time.time() - start_time, 1),
            'n_batches': n,
        })

    def write_model(self, epoch, final=True):
        from . import checkpoint as ckpt_mod
        filename = f'{self.out}.epoch{epoch:03d}'
        LOG.debug('about to write model %s', filename)
        # EMA weights are applied into the saved model (trainer.py:120-128)
        ckpt_mod.save(
            filename,
            params=self.state.ema_params,
            batch_stats=self.state.batch_stats,
            meta={**self.model_meta_data, 'epoch': epoch},
        )
        if final:
            ckpt_mod.save(
                self.out,
                params=self.state.ema_params,
                batch_stats=self.state.batch_stats,
                meta={**self.model_meta_data, 'epoch': epoch},
            )
        LOG.info('model written: %s', filename)
