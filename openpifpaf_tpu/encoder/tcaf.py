"""Tcaf target encoder (reference ``encoder/tcaf.py:13-43``): cross-frame
CAF using the TrackingAnnRescaler over image pairs, fixed_size=True."""

import dataclasses
from typing import ClassVar, List, Optional, Tuple

from .. import headmeta
from .annrescaler import TrackingAnnRescaler
from .caf import CafGenerator


@dataclasses.dataclass
class Tcaf:
    meta: headmeta.Tcaf
    rescaler: Optional[TrackingAnnRescaler] = None
    v_threshold: int = 0
    bmin: float = 0.1
    visualizer: Optional[object] = None
    fill_plan: Optional[List[Tuple[int, int, int]]] = None

    min_size: ClassVar[int] = 3
    fixed_size: ClassVar[bool] = True
    aspect_ratio: ClassVar[float] = 0.0
    padding: ClassVar[int] = 10

    def __post_init__(self):
        if self.rescaler is None:
            self.rescaler = TrackingAnnRescaler(self.meta.stride,
                                                self.meta.pose)
        if self.fill_plan is None:
            self.fill_plan = [
                (caf_i, joint1i - 1, joint2i - 1)
                for caf_i, (joint1i, joint2i) in enumerate(self.meta.skeleton)
            ]

    def __call__(self, images, all_anns, metas):
        return CafGenerator(self)(images[0], all_anns, metas)
