"""Debug visualizers for intermediate fields (reference ``visualizer/``).

Round 1 placeholder: the Base class stores the processed image / ground
truth like the reference's global stash; field visualizers arrive with the
show/debug milestone.
"""

from .base import Base
