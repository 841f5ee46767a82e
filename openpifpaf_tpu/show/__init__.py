"""Visualization of annotations (matplotlib painters)."""

from .painters import (KeypointPainter, DetectionPainter, CrowdPainter,
                       AnnotationPainter)
from .canvas import Canvas, annotation_canvas, image_canvas, canvas
from .animation_frame import AnimationFrame, VirtualCamWriter
from . import fields
from .fields import white_screen, quiver, boxes, circles
from .cli import cli, configure

PAINTERS = {
    'Annotation': KeypointPainter,
    'AnnotationDet': DetectionPainter,
    'AnnotationCrowd': CrowdPainter,
}
