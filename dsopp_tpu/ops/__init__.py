"""dsopp_tpu.ops — hardware-tuned sampling kernels (the J6 hot path).

The scattered bilinear patch gather is the TPU-unfriendliest op of the
pipeline (SURVEY §7 "hard parts"); this package holds its fast
implementations:

* :mod:`dsopp_tpu.ops.sample` — the corner-packed row-gather layout: one
  gather row per sample point instead of 4 corners x C channels of scalar
  gathers.
* :mod:`dsopp_tpu.ops.nbhd` — the neighborhood-packed layout: ONE gather
  row per pattern group (8x fewer rows; the honest microbench shows the
  gather costs ~24 ns/row regardless of row width, PERF.md).

Reference analog: PixelMap::Evaluate / interpolateLinear
(src/features/include/features/camera/pixel_map.hpp:227-300).
"""

from dsopp_tpu.ops.nbhd import (
    pack_neighborhood,
    sample_nbhd,
)
from dsopp_tpu.ops.sample import (
    pack_corners,
    sample_packed,
    sample_packed_intensity,
)

__all__ = [
    "pack_corners",
    "pack_neighborhood",
    "sample_nbhd",
    "sample_packed",
    "sample_packed_intensity",
]
