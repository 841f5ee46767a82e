"""Transforms for image pairs (tracking training)."""

from .single_image import SingleImage, Ungroup
from .image_to_tracking import ImageToTracking
from .camera_shift import CameraShift
from .crop import Crop
from .pad import Pad
from .encoders import Encoders
from .blank_past import BlankPast, PreviousPast, RandomizeOneFrame
from .sample_pairing import SamplePairing
