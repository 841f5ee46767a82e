"""Worker for tests/test_multihost.py: one process of a 2-process
CPU-device rendezvous running the real sharded train step.

Invoked as:
    multihost_worker.py <num_processes> <process_id> <port> \
        <devices_per_proc> [spatial]

``spatial`` > 1 builds the 2-D ``('data', 'space')`` grid mesh instead
of the 1-D data mesh — the train step's convolution halo exchanges and
BN reductions then cross the process boundary.

The caller must set JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<devices_per_proc>
before python starts. Prints one JSON line with the two step losses and
a parameter checksum; the test asserts they match a single-process run
of the same global computation (reference anchor: the DDP loop it
replaces, ``/root/reference/src/openpifpaf/train.py:146-165``).
"""

import json
import sys
import types

import numpy as np


def main(num_processes, process_id, port, devices_per_proc,
         spatial=1):
    import jax
    jax.config.update('jax_platforms', 'cpu')  # beat sitecustomize

    from openpifpaf_tpu.parallel import mesh as mesh_mod

    if num_processes > 1:
        mesh_mod.initialize_multihost(
            coordinator_address=f'localhost:{port}',
            num_processes=num_processes,
            process_id=process_id)
        assert jax.process_count() == num_processes, jax.process_count()
        assert jax.process_index() == process_id

    n_global = num_processes * devices_per_proc
    assert len(jax.devices()) == n_global, \
        (len(jax.devices()), n_global)
    assert len(jax.local_devices()) == devices_per_proc

    import jax.numpy as jnp
    import openpifpaf_tpu
    from openpifpaf_tpu.models import factory as models_factory
    from openpifpaf_tpu.training import losses, optimize
    from openpifpaf_tpu.training.trainer import TrainState, build_train_step

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    net_factory = models_factory.Factory(base_name='resnet18')
    model, init_fn = net_factory.from_scratch(datamodule.head_metas)
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

    mesh = mesh_mod.grid_mesh(n_global, spatial=spatial) \
        if spatial > 1 else mesh_mod.data_mesh()
    train_step = build_train_step(model, loss_fn, optimizer, schedule,
                                  clip_grad_norm=1.0, mesh=mesh)

    params = variables['params']
    loss_params = loss_fn.init_params()
    state = TrainState(
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=optimizer.init({'model': params, 'loss': loss_params}),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), dtype=jnp.int32),
        loss_params=loss_params,
        loss_state=loss_fn.init_state(),
    )

    # the GLOBAL batch is generated identically in every process; each
    # host then loads only its slice (host-local data loading replacing
    # DistributedSampler) and the global arrays are assembled across
    # process boundaries by shard_batch
    batch = n_global // spatial
    h = w = 64 if spatial > 1 else 65  # spatial needs H divisible by it
    fh = fw = 4 if spatial > 1 else 5
    rng = np.random.RandomState(42)
    images_g = rng.randn(batch, h, w, 3).astype(np.float32)
    cif_g = (0.1 * rng.randn(batch, 17, 5, fh, fw)).astype(np.float32)
    caf_g = (0.1 * rng.randn(batch, 19, 9, fh, fw)).astype(np.float32)

    sl = mesh_mod.local_batch_slice(batch)
    images = mesh_mod.shard_batch(images_g[sl], mesh)
    targets = (mesh_mod.shard_batch(cif_g[sl], mesh),
               mesh_mod.shard_batch(caf_g[sl], mesh))

    losses_out = []
    for _ in range(2):
        state, loss, _ = train_step(state, images, targets)
        losses_out.append(float(loss))

    # parameter checksum: replicated output shardings make params fully
    # addressable in every process
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    ema_leaves = jax.tree_util.tree_leaves(state.ema_params)
    ema_checksum = float(sum(float(jnp.sum(jnp.abs(l)))
                             for l in ema_leaves))

    print(json.dumps({
        'process_id': process_id,
        'process_count': jax.process_count(),
        'n_devices': len(jax.devices()),
        'losses': losses_out,
        'param_checksum': checksum,
        'ema_checksum': ema_checksum,
    }), flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         int(sys.argv[4]),
         int(sys.argv[5]) if len(sys.argv) > 5 else 1)
