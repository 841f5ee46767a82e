"""Mesh construction, batch sharding and multi-host initialization."""

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOG = logging.getLogger(__name__)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Initialize jax.distributed for multi-host meshes.

    Replaces the reference's SLURM/env-var rendezvous + NCCL init
    (``train.py:76-97,146-165``). With no arguments, jax.distributed
    auto-detects the cluster environment (SLURM, GKE, Cloud TPU metadata).
    Safe to call when already initialized or single-host.
    """
    # do NOT touch jax.process_count()/devices() first: any backend query
    # initializes XLA and makes jax.distributed.initialize() fail
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        LOG.info('jax.distributed initialized: process %d/%d',
                 jax.process_index(), jax.process_count())
    except (ValueError, RuntimeError) as e:
        msg = str(e).lower()
        if 'already initialized' in msg or 'only be called once' in msg:
            return
        if 'backend' in msg or 'initialize' in msg:
            # initialize() was called too late (XLA already up): that is a
            # real bug on a multi-host cluster — make it visible
            LOG.warning('jax.distributed.initialize failed: %s', e)
            return
        LOG.debug('single-process run (jax.distributed not initialized: %s)',
                  e)


def data_mesh(n_devices: Optional[int] = None, *, axis: str = 'data') -> Mesh:
    """1-D mesh over all (or the first n) devices for data parallelism."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def grid_mesh(n_devices: Optional[int] = None, *, spatial: int = 1) -> Mesh:
    """2-D ``('data', 'space')`` mesh: data parallelism x spatial
    partitioning of the image height.

    Spatial partitioning is TPU-native model parallelism the reference's
    NCCL DDP (``train.py:146-165``) has no counterpart for: images are
    sharded along H, XLA/GSPMD inserts the convolution halo exchanges
    over ICI, and BatchNorm statistics stay exact because the mean/var
    reductions become cross-device collectives automatically. Use it
    when per-device batch would drop below 1 (large crops / few chips)
    or to cut per-device activation memory at high resolution.

    With ``spatial=1`` this degrades to the 1-D data mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if spatial <= 1:
        return Mesh(np.asarray(devices), ('data',))
    if len(devices) % spatial:
        raise ValueError(
            f'{len(devices)} devices not divisible by '
            f'spatial={spatial}')
    arr = np.asarray(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(arr, ('data', 'space'))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, H, W, C) images: batch over 'data', H over
    'space' when the mesh has a spatial axis."""
    if 'space' in mesh.axis_names:
        return NamedSharding(mesh, P('data', 'space'))
    return NamedSharding(mesh, P('data'))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, F, C, fh, fw) target/field tensors matching
    :func:`image_sharding` (field rows align with image rows / stride)."""
    if 'space' in mesh.axis_names:
        return NamedSharding(mesh, P('data', None, None, 'space'))
    return NamedSharding(mesh, P('data'))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, axis: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def local_batch_slice(global_batch_size: int) -> slice:
    """The slice of a globally-indexed batch this process should load.

    Host-local data loading replaces DistributedSampler
    (``datasets/module.py:119-134``): each host reads only its shard.
    """
    per_process = global_batch_size // jax.process_count()
    start = jax.process_index() * per_process
    return slice(start, start + per_process)


def shard_batch(batch, mesh: Mesh, *, axis: str = 'data'):
    """Form a globally-sharded array from process-local data.

    On a single host this is a device_put with a batch-dim sharding; on
    multi-host it assembles the global array from each process's local
    shard (jax.make_array_from_process_local_data).
    """
    sharding = batch_sharding(mesh, axis=axis)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
