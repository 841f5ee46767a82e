"""Debug visualizers for intermediate fields (reference ``visualizer/``)."""

from .base import Base
from .fields_vis import (Cif, Caf, CifHr, CifDet, Seeds, Occupancy,
                         MultiTracking)
from .cli import cli, configure
