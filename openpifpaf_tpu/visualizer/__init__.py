"""Debug visualizers for intermediate fields (reference ``visualizer/``)."""

from .base import Base
from .fields_vis import (Cif, Caf, CifHr, CifDet, Seeds, Occupancy,
                         Tcaf, MultiTracking)
from .cli import cli, configure
