"""Optimizer and LR schedule factories (reference ``optimize.py``).

optax replaces torch.optim; the LambdaLR-style schedule (warm-up, stepped
exponential decays, warm restarts) is reproduced as a pure function of the
step index so it lives inside the jitted train step.
"""

import argparse
import logging

import jax.numpy as jnp
import optax

LOG = logging.getLogger(__name__)


def cli(parser: argparse.ArgumentParser):
    group = parser.add_argument_group('optimizer')
    group.add_argument('--momentum', type=float, default=0.9)
    group.add_argument('--beta2', type=float, default=0.999)
    group.add_argument('--adam-eps', type=float, default=1e-6)
    group.add_argument('--no-nesterov', dest='nesterov', default=True,
                       action='store_false')
    group.add_argument('--weight-decay', type=float, default=0.0)
    group.add_argument('--adam', action='store_true')
    group.add_argument('--amsgrad', action='store_true')

    group_s = parser.add_argument_group('learning rate scheduler')
    group_s.add_argument('--lr', type=float, default=1e-3)
    group_s.add_argument('--lr-decay', default=[], nargs='+', type=float)
    group_s.add_argument('--lr-decay-factor', default=0.1, type=float)
    group_s.add_argument('--lr-decay-epochs', default=1.0, type=float)
    group_s.add_argument('--lr-warm-up-start-epoch', default=0, type=float)
    group_s.add_argument('--lr-warm-up-epochs', default=1, type=float)
    group_s.add_argument('--lr-warm-up-factor', default=0.001, type=float)
    group_s.add_argument('--lr-warm-restarts', default=[], nargs='+',
                         type=float)
    group_s.add_argument('--lr-warm-restart-duration', default=0.5,
                         type=float)


class LearningRateLambda:
    """LR multiplier as a function of the (fractional) step index.

    Matches the reference schedule (optimize.py:46-88): exponential ramp-in
    warm-up, smooth stepped decay over ``decay_epochs``, warm restarts.
    Operates on jnp scalars so it traces into the train step.
    """

    def __init__(self, decay_schedule, *, decay_factor=0.1, decay_epochs=1.0,
                 warm_up_start_epoch=0, warm_up_epochs=2.0,
                 warm_up_factor=0.01, warm_restart_schedule=(),
                 warm_restart_duration=0.5):
        self.decay_schedule = decay_schedule
        self.decay_factor = decay_factor
        self.decay_epochs = decay_epochs
        self.warm_up_start_epoch = warm_up_start_epoch
        self.warm_up_epochs = warm_up_epochs
        self.warm_up_factor = warm_up_factor
        self.warm_restart_schedule = warm_restart_schedule
        self.warm_restart_duration = warm_restart_duration

    def __call__(self, step_i):
        step_i = jnp.asarray(step_i, dtype=jnp.float32)
        lambda_ = jnp.ones_like(step_i)

        w0 = self.warm_up_start_epoch
        we = self.warm_up_epochs
        lambda_ = jnp.where(
            step_i <= w0, lambda_ * self.warm_up_factor, lambda_)
        in_warmup = (step_i > w0) & (step_i < w0 + we)
        lambda_ = jnp.where(
            in_warmup,
            lambda_ * self.warm_up_factor ** (1.0 - (step_i - w0) / we),
            lambda_)

        for d in self.decay_schedule:
            full = step_i >= d + self.decay_epochs
            partial = (step_i > d) & ~full
            lambda_ = jnp.where(full, lambda_ * self.decay_factor, lambda_)
            lambda_ = jnp.where(
                partial,
                lambda_ * self.decay_factor ** ((step_i - d) / self.decay_epochs),
                lambda_)

        for r in self.warm_restart_schedule:
            in_restart = (step_i >= r) & (step_i < r + self.warm_restart_duration)
            lambda_ = jnp.where(
                in_restart,
                lambda_ ** ((step_i - r) / self.warm_restart_duration),
                lambda_)

        return lambda_


def schedule_from_args(args, training_batches_per_epoch):
    lr_lambda = LearningRateLambda(
        [s * training_batches_per_epoch for s in args.lr_decay],
        decay_factor=args.lr_decay_factor,
        decay_epochs=args.lr_decay_epochs * training_batches_per_epoch,
        warm_up_start_epoch=args.lr_warm_up_start_epoch * training_batches_per_epoch,
        warm_up_epochs=args.lr_warm_up_epochs * training_batches_per_epoch,
        warm_up_factor=args.lr_warm_up_factor,
        warm_restart_schedule=[r * training_batches_per_epoch
                               for r in args.lr_warm_restarts],
        warm_restart_duration=(args.lr_warm_restart_duration
                               * training_batches_per_epoch),
    )
    return lambda step: args.lr * lr_lambda(step)


def factory_optimizer(args, *, training_batches_per_epoch=1):
    schedule = schedule_from_args(args, training_batches_per_epoch)

    if args.amsgrad:
        args.adam = True
    if args.adam:
        LOG.info('Adam optimizer')
        opt = optax.adam(learning_rate=schedule, b1=args.momentum,
                         b2=args.beta2, eps=args.adam_eps)
    else:
        LOG.info('SGD optimizer')
        opt = optax.sgd(learning_rate=schedule, momentum=args.momentum,
                        nesterov=args.nesterov)

    if args.weight_decay:
        opt = optax.chain(
            optax.add_decayed_weights(args.weight_decay), opt)
    return opt, schedule
