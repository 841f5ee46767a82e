"""Parallelism helpers on the virtual 8-device CPU mesh."""

import jax
import numpy as np

import openpifpaf_tpu
from openpifpaf_tpu import parallel
from openpifpaf_tpu.models import factory as models_factory


def test_data_mesh_and_shard_batch():
    mesh = parallel.data_mesh(8)
    assert mesh.devices.size == 8
    batch = np.zeros((16, 4), np.float32)
    sharded = parallel.shard_batch(batch, mesh)
    assert sharded.shape == (16, 4)
    assert len(sharded.sharding.device_set) == 8


def test_local_batch_slice_single_process():
    s = parallel.local_batch_slice(16)
    assert (s.start, s.stop) == (0, 16)


def test_sharded_forward_fields():
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='resnet18')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 65, 65, 3))

    mesh = parallel.data_mesh(8)
    fwd = parallel.ShardedForward(model, variables, mesh=mesh)
    images = np.zeros((8, 65, 65, 3), np.float32)
    cif, caf = fwd(images)
    assert cif.shape == (8, 17, 5, 5, 5)
    assert caf.shape == (8, 19, 8, 5, 5)
    # batch stays sharded over the mesh
    assert len(cif.sharding.device_set) == 8


def test_sharded_forward_with_decoder():
    from openpifpaf_tpu.ops import build_cifcaf_decoder

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='resnet18')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 65, 65, 3))

    cif_meta, caf_meta = datamodule.head_metas
    decoder = build_cifcaf_decoder(
        stride=cif_meta.stride, skeleton=caf_meta.skeleton,
        n_keypoints=len(cif_meta.keypoints))

    mesh = parallel.data_mesh(8)
    fwd = parallel.ShardedForward(model, variables, mesh=mesh,
                                  decoder=decoder)
    images = np.zeros((8, 65, 65, 3), np.float32)
    poses, keep, order = fwd(images)
    assert poses.shape[0] == 8
    assert poses.shape[2:] == (17, 4)
    assert keep.shape[:2] == poses.shape[:2]


def test_predictor_sharded_forward():
    """Predictor --n-devices shards the forward batch over the mesh."""
    from openpifpaf_tpu.predictor import Predictor

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='resnet18')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 65, 65, 3))

    p = Predictor(model=model, variables=variables)
    p.n_devices = 8
    p.size_bucket = 0
    images = np.zeros((8, 65, 65, 3), np.float32)
    cif, caf = p.forward_fn(variables, images)
    assert cif.shape == (8, 17, 5, 5, 5)
    assert len(cif.sharding.device_set) == 8
