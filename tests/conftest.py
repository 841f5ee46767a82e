import os

# Tests run on a virtual 8-device CPU mesh so that sharding paths are
# exercised without TPU hardware. The environment's sitecustomize registers
# the remote 'axon' TPU backend and force-sets jax_platforms='axon,cpu'
# via jax.config (which overrides the JAX_PLATFORMS env var), so the
# override here must go through jax.config too, before any backend is used.
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
