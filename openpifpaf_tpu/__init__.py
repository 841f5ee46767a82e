"""openpifpaf_tpu: TPU-native composite-field pose estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of OpenPifPaf:
bottom-up multi-person 2D pose estimation, detection and tracking via
composite fields (CIF/CAF/TCAF). The reference's C++ CPU decoder is
reformulated as batched fixed-shape device ops; models are Flax modules;
training runs as a jitted, sharded step over a ``jax.sharding.Mesh``.

Registries mirror the reference's plugin architecture
(``src/openpifpaf/__init__.py:27-41``): plugins register datamodules,
backbones, heads, losses, decoders and checkpoints; auto-discovery imports
``openpifpaf_tpu.plugins.*`` and any installed ``openpifpaf_tpu_*`` package.
"""

__version__ = '0.1.0'

from . import headmeta
from .annotation import Annotation, AnnotationCrowd, AnnotationDet
from .configurable import Configurable
from .signal_ import Signal

# registries (must exist before plugins are imported)
from .models.factory import (BASE_FACTORIES, BASE_TYPES, HEADS,
                             CHECKPOINT_URLS, PRETRAINED_UNAVAILABLE)
from .datasets.factory import DATAMODULES
from .decoder.factory import DECODERS
from .training.losses import LOSSES

from . import ops
from . import models
from . import encoder
from . import decoder
from . import datasets
from . import transforms
from . import training
from . import metric
from . import parallel
from . import show
from . import visualizer
from .predictor import Predictor

from . import plugin
plugin.register()
