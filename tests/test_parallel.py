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


def test_grid_mesh_shapes():
    mesh = parallel.grid_mesh(8, spatial=2)
    assert mesh.axis_names == ('data', 'space')
    assert mesh.devices.shape == (4, 2)
    # spatial=1 degrades to the 1-D data mesh
    mesh1 = parallel.grid_mesh(8, spatial=1)
    assert mesh1.axis_names == ('data',)
    import pytest
    with pytest.raises(ValueError):
        parallel.grid_mesh(8, spatial=3)


def test_spatial_sharded_forward_parity():
    """Spatially-partitioned forward (H sharded over 'space') matches the
    single-device forward: GSPMD's halo exchanges are exact."""
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='resnet18')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 65, 65, 3))

    rng = np.random.RandomState(0)
    images = rng.randn(2, 65, 65, 3).astype(np.float32)

    ref = jax.jit(lambda v, im: model.apply(v, im, train=False))(
        variables, images)

    mesh = parallel.grid_mesh(8, spatial=4)
    fwd = parallel.ShardedForward(model, variables, mesh=mesh)
    out = fwd(images)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=2e-4, atol=2e-5)


def test_spatial_train_step_parity():
    """One train step on the 2-D (data x space) mesh produces the same
    loss and parameter update as the 1-D data mesh (BN stats and grad
    reductions become cross-device collectives but stay exact)."""
    import types
    import jax.numpy as jnp
    from openpifpaf_tpu.training import losses, optimize
    from openpifpaf_tpu.training.trainer import (TrainState,
                                                 build_train_step)

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='resnet18')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 65, 65, 3))

    args = types.SimpleNamespace(
        momentum=0.9, beta2=0.999, adam_eps=1e-6, nesterov=True,
        weight_decay=0.0, adam=False, amsgrad=False,
        lr=1e-3, lr_decay=[], lr_decay_factor=0.1, lr_decay_epochs=1.0,
        lr_warm_up_start_epoch=0, lr_warm_up_epochs=1,
        lr_warm_up_factor=0.001, lr_warm_restarts=[],
        lr_warm_restart_duration=0.5)
    optimizer, schedule = optimize.factory_optimizer(args)
    loss_fn = losses.Factory().factory(datamodule.head_metas)

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(8, 65, 65, 3).astype(np.float32))
    cif_t = jnp.asarray(rng.rand(8, 17, 5, 5, 5).astype(np.float32))
    caf_t = jnp.asarray(rng.rand(8, 19, 9, 5, 5).astype(np.float32))

    def fresh_state():
        params = jax.tree_util.tree_map(jnp.copy, variables['params'])
        loss_params = loss_fn.init_params()
        return TrainState(
            params=params,
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables.get('batch_stats', {})),
            opt_state=optimizer.init({'model': params,
                                      'loss': loss_params}),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            step=jnp.zeros((), dtype=jnp.int32),
            loss_params=loss_params,
            loss_state=loss_fn.init_state(),
        )

    losses_by_mesh = {}
    states = {}
    for name, mesh in (('dp', parallel.grid_mesh(8, spatial=1)),
                       ('dpxsp', parallel.grid_mesh(8, spatial=2))):
        step = build_train_step(model, loss_fn, optimizer, schedule,
                                clip_grad_norm=1.0, mesh=mesh)
        state, loss, _ = step(fresh_state(), images, (cif_t, caf_t))
        losses_by_mesh[name] = float(loss)
        states[name] = state

    assert np.isfinite(losses_by_mesh['dp'])
    np.testing.assert_allclose(losses_by_mesh['dp'],
                               losses_by_mesh['dpxsp'], rtol=1e-4)
    leaves_dp = jax.tree_util.tree_leaves(states['dp'].params)
    leaves_sp = jax.tree_util.tree_leaves(states['dpxsp'].params)
    for a, b in zip(leaves_dp, leaves_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


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


def test_predictor_spatial_devices_parity():
    """Predictor --n-devices N --spatial-devices S serves with the image
    height sharded; fields match the unsharded forward."""
    from openpifpaf_tpu.predictor import Predictor

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    f = models_factory.Factory(base_name='resnet18')
    model, init_fn = f.from_scratch(datamodule.head_metas)
    variables = init_fn(jax.random.PRNGKey(0), (1, 65, 65, 3))

    rng = np.random.RandomState(5)
    images = rng.randn(2, 65, 65, 3).astype(np.float32)

    p_ref = Predictor(model=model, variables=variables)
    p_ref.size_bucket = 0
    ref = p_ref.forward_fn(variables, images)

    p = Predictor(model=model, variables=variables)
    p.n_devices = 8
    p.spatial_devices = 4
    p.size_bucket = 0
    out = p.forward_fn(variables, images)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=2e-4, atol=2e-5)
