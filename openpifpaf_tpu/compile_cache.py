"""Persistent XLA compilation cache.

The adaptive decoder's crowd-tier graph costs ~17 s to compile; without a
persistent cache every *process* pays it on its first crowded image (each
``eval --watch`` re-run, each CLI invocation). The reference has no
compile step (torch eager), so this is a TPU-design-specific subsystem:
enabling JAX's persistent compilation cache makes the second process's
first-hit a disk load (<1 s).

Wired into every CLI entry point through ``logger.configure``; users can
point it elsewhere (or disable it) with --xla-compilation-cache.
"""

import logging
import os

LOG = logging.getLogger(__name__)

DEFAULT_DIR = os.path.join(
    os.path.expanduser(os.environ.get('XDG_CACHE_HOME', '~/.cache')),
    'openpifpaf_tpu', 'xla')

_enabled = False


def cli(parser):
    group = parser.add_argument_group('compilation cache')
    group.add_argument('--xla-compilation-cache', default=DEFAULT_DIR,
                       metavar='DIR',
                       help='persistent XLA compilation cache directory '
                            "('' disables caching)")


def configure(args):
    enable(getattr(args, 'xla_compilation_cache', DEFAULT_DIR))


def enable(cache_dir=DEFAULT_DIR):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Safe to call multiple times; a falsy dir disables. Compilations
    taking longer than 1 s are persisted (the crowd decode graph, the
    backbone forwards), trivial ones are not worth the disk round trip.
    """
    global _enabled
    if not cache_dir:
        return False
    cache_dir = os.path.expanduser(cache_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception as e:  # pragma: no cover - read-only fs, old jax
        LOG.warning('persistent compilation cache unavailable: %s', e)
        return False
    _enabled = True
    LOG.debug('persistent compilation cache: %s', cache_dir)
    return True
