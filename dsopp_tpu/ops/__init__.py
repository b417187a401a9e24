"""dsopp_tpu.ops — hardware-tuned sampling kernels (the J6 hot path).

The scattered bilinear patch gather is the TPU-unfriendliest op of the
pipeline (SURVEY §7 "hard parts"); this package holds its fast
implementations:

* :mod:`dsopp_tpu.ops.sample` — the corner-packed row-gather layout: one
  gather row per sample point instead of 4 corners x C channels of scalar
  gathers.  Measured 4.5x faster than the naive scattered ``take`` on a
  v5e chip at the depth-estimation operating point (scripts/gather_probe2.py).
* :mod:`dsopp_tpu.ops.pallas_blend` — Pallas kernel fusing the bilinear
  corner blend + patch reductions, with the XLA path as parity oracle.

Reference analog: PixelMap::Evaluate / interpolateLinear
(src/features/include/features/camera/pixel_map.hpp:227-300).
"""

from dsopp_tpu.ops.sample import (
    pack_corners,
    sample_packed,
    sample_packed_intensity,
)

__all__ = [
    "pack_corners",
    "sample_packed",
    "sample_packed_intensity",
]
