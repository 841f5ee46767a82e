"""Parallelism utilities: device meshes, shardings, multi-host init.

TPU-native replacement for the reference's distributed machinery
(``train.py:76-165``: SLURM rendezvous, NCCL process groups, DDP wrap,
DistributedSampler; ``predictor.py:33-37``: DataParallel): here every
parallel form is expressed through ``jax.sharding`` over a ``Mesh`` and XLA
inserts the collectives (gradient psum over ICI for data parallelism,
all-gathers for replication) — there is no backend code to manage.

- :func:`initialize_multihost` replaces env-var/SLURM rendezvous
  (``jax.distributed`` reads the standard cluster envs itself).
- :func:`data_mesh` builds the 1-D data-parallel mesh used by the trainer
  and the sharded predictor.
- :func:`grid_mesh` builds the 2-D ``('data', 'space')`` mesh for
  data x spatial partitioning (images sharded along H; GSPMD inserts
  the convolution halo exchanges) — parallelism the reference's DDP
  cannot express.
- :func:`shard_batch` forms a globally-sharded batch from process-local
  data (replaces DistributedSampler + pin_memory H2D staging).
- :class:`ShardedForward` batches inference over all local devices.
"""

from .mesh import (initialize_multihost, data_mesh, grid_mesh,
                   image_sharding, field_sharding, replicate, shard_batch,
                   local_batch_slice)
from .inference import ShardedForward

__all__ = [
    'initialize_multihost', 'data_mesh', 'grid_mesh', 'image_sharding',
    'field_sharding', 'replicate', 'shard_batch',
    'local_batch_slice', 'ShardedForward',
]
