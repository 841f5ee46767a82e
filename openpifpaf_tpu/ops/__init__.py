"""Device-side decoder ops (JAX/XLA/Pallas).

The reference implements these as sequential C++ TorchScript classes
(``src/openpifpaf/csrc/``). Here every stage is a batched, fixed-shape,
jit-compatible transformation:

- :mod:`cifhr` — high-resolution Gaussian accumulation (CifHr)
- :mod:`seeds` — seed extraction + rescoring + top-k (CifSeeds)
- :mod:`caf_scored` — association candidate rescoring (CafScored)
- :mod:`grow` — parallel-over-seeds greedy pose growth (CifCaf::_grow)
- :mod:`nms` — occupancy-grid keypoint NMS (NMSKeypoints)
- :mod:`decode_cifcaf` — the full jitted pipeline
"""

from . import cifhr, seeds, caf_scored, grow, nms, decode_cifcaf
from .decode_cifcaf import CifCafDecoderConfig, build_cifcaf_decoder
