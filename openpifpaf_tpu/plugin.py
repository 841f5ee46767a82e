"""Plugin discovery, mirroring reference ``plugin.py:17-41``.

Imports every ``openpifpaf_tpu.plugins.*`` submodule and every installed
top-level package named ``openpifpaf_tpu_*`` and calls its ``register()``.
"""

import importlib
import logging
import pkgutil

LOG = logging.getLogger(__name__)

REGISTERED = {}


def register():
    from . import plugins  # pylint: disable=import-outside-toplevel

    for _, name, _ in pkgutil.iter_modules(plugins.__path__,
                                           plugins.__name__ + '.'):
        module = importlib.import_module(name)
        if hasattr(module, 'register'):
            module.register()
            REGISTERED[name] = module

    for finder, name, _ in pkgutil.iter_modules():
        if not name.startswith('openpifpaf_tpu_'):
            continue
        try:
            module = importlib.import_module(name)
        except ImportError as e:
            LOG.warning('could not import plugin %s: %s', name, e)
            continue
        if hasattr(module, 'register'):
            module.register()
            REGISTERED[name] = module


def versions():
    return {
        name: getattr(module, '__version__', 'unknown')
        for name, module in REGISTERED.items()
    }
