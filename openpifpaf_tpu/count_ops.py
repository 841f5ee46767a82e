"""Count-ops CLI (reference ``count_ops.py:22-27``).

Uses XLA's compiled cost analysis instead of thop: reports GFLOPs and
parameter counts of the jitted forward at the standard 641x641 input.
"""

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import datasets
from .models import factory as models_factory

LOG = logging.getLogger(__name__)


def count(model, variables, *, input_shape=(1, 641, 641, 3)):
    """Returns (gflops, million_params) via XLA cost analysis."""
    dummy = jnp.zeros(input_shape, dtype=jnp.float32)

    def forward(variables, image):
        return model.apply(variables, image, train=False)

    lowered = jax.jit(forward).lower(variables, dummy)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get('flops', 0.0)) if cost else 0.0

    n_params = sum(
        np.prod(p.shape)
        for p in jax.tree_util.tree_leaves(variables['params']))
    return flops / 1e9, n_params / 1e6


def main():
    parser = argparse.ArgumentParser(
        prog='python3 -m openpifpaf_tpu.count_ops')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--basenet', default='shufflenetv2k16')
    parser.add_argument('--dataset', default='cocokp')
    args = parser.parse_args()

    if args.checkpoint:
        from .training import checkpoint as ckpt_mod
        model, variables = ckpt_mod.load_shell(args.checkpoint)
    else:
        datamodule = datasets.factory(args.dataset)
        net_factory = models_factory.Factory(base_name=args.basenet)
        model, init_fn = net_factory.from_scratch(datamodule.head_metas)
        variables = init_fn(jax.random.PRNGKey(0))

    gflops, mparams = count(model, variables)
    print(f'GFLOPS: {gflops:.2f}')
    print(f'million parameters: {mparams:.2f}')


if __name__ == '__main__':
    main()
