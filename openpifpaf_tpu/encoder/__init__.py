"""Encoders: ground-truth annotations -> target fields for training.

Runs in data-loader worker processes on numpy arrays (like the reference
``encoder/`` package), but painted as batched scatters resolved by one
nearest-writer sort per image (see ``scatter.py``) instead of sequential
per-keypoint stamping. Output layouts match the loss channel contract:
CIF (F, 5, H, W) [c, x, y, bmin, scale],
CAF (F, 9, H, W) [c, x1, y1, x2, y2, b1, b2, s1, s2],
CifDet (C, 7, H, W) [c, x, y, w, h, bmin_reg, bmin_wh].
"""

from .annrescaler import AnnRescaler, AnnRescalerDet, TrackingAnnRescaler
from .caf import Caf
from .cif import Cif
from .cifdet import CifDet
from .factory import cli, configure
from .single_image import SingleImage
from .tcaf import Tcaf

__all__ = [
    'AnnRescaler', 'AnnRescalerDet', 'TrackingAnnRescaler',
    'Caf', 'Cif', 'CifDet', 'SingleImage', 'Tcaf',
    'cli', 'configure',
]
