"""Sharded batched inference.

Replaces the reference's ``torch.nn.DataParallel`` wrap in the Predictor
(``predictor.py:33-37``): the forward (and optionally the decode pipeline)
is jitted once with the image batch sharded over the mesh's data axis and
parameters replicated; XLA splits the batch across chips over ICI.
"""

import logging
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import data_mesh, shard_batch

LOG = logging.getLogger(__name__)


class ShardedForward:
    """Jitted model forward with the batch sharded over devices.

    fn(images (B, H, W, 3)) -> head fields, B divisible by mesh size.
    With ``decoder`` given, returns decoded pose tensors instead.
    """

    def __init__(self, model, variables, *, mesh: Optional[Mesh] = None,
                 decoder=None, axis: str = 'data'):
        self.mesh = mesh or data_mesh(axis=axis)
        self.axis = axis
        replicated = NamedSharding(self.mesh, P())
        sharded = NamedSharding(self.mesh, P(axis))
        out_sharded = sharded
        # 2-D ('data', 'space') mesh: additionally shard image height —
        # serving-side spatial partitioning for large images; GSPMD
        # inserts the conv halo exchanges. Applied inside jit
        # (with_sharding_constraint) because H is usually not divisible
        # by the spatial axis. Outputs stay batch-sharded.
        spatial = NamedSharding(self.mesh, P(axis, 'space')) \
            if 'space' in self.mesh.axis_names else None

        self.variables = jax.device_put(variables, replicated)

        if decoder is not None:
            def forward(variables, images):
                if spatial is not None:
                    images = jax.lax.with_sharding_constraint(
                        images, spatial)
                fields = model.apply(variables, images, train=False)
                return decoder(*fields[:2])
        else:
            def forward(variables, images):
                if spatial is not None:
                    images = jax.lax.with_sharding_constraint(
                        images, spatial)
                return model.apply(variables, images, train=False)

        self._fn = jax.jit(
            forward,
            in_shardings=(replicated, sharded),
            out_shardings=out_sharded)

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def __call__(self, images):
        images = shard_batch(images, self.mesh, axis=self.axis)
        return self._fn(self.variables, images)
