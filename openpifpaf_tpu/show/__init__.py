"""Visualization of annotations (matplotlib painters)."""

from .painters import KeypointPainter, DetectionPainter, CrowdPainter, AnnotationPainter
from .canvas import Canvas, image_canvas, canvas

PAINTERS = {
    'Annotation': KeypointPainter,
    'AnnotationDet': DetectionPainter,
    'AnnotationCrowd': CrowdPainter,
}
