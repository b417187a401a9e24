"""Keyframe decision policies.

Mirrors the reference strategies (src/tracker/keyframe_strategy/):

* ``MeanSquareOpticalFlowAndRmse`` — DSO's criterion
  (mean_square_optical_flow_and_rmse_keyframe_strategy.cpp:28-43):
  weighted flow + flow-without-rotation + relative-brightness factor against
  a threshold, OR the frontend RMSE jumping over 4× the value at the last
  keyframe;
* ``Frequency`` — every N-th frame.

Host-side policy objects over scalar summaries (the flow statistics are
computed on device by the tracker).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class OpticalFlowKeyframeStrategy:
    factor: float = 1.0  # config 'factor' (dense.yaml uses 2.0)

    MAX_SHIFT_WEIGHT: float = 4.5
    MAX_SHIFT_NO_ROT_WEIGHT: float = 9.0
    MAX_BRIGHTNESS_WEIGHT: float = 2.0
    THRESHOLD: float = 1.0
    MAX_EXCESS_ENERGY: float = 4.0

    _rmse: float = field(default=-1.0, repr=False)

    def need_new_keyframe(
        self,
        flow: float,
        flow_without_rotation: float,
        frame_rmse: float,
        exposure_ratio: float = 1.0,
        delta_affine_a: float = 0.0,
        reliable: bool = True,
    ) -> bool:
        if self._rmse < 0:
            self._rmse = frame_rmse
        brightness = abs(math.log(max(exposure_ratio * math.exp(delta_affine_a), 1e-12)))
        need = (
            self.factor
            * (
                self.MAX_SHIFT_WEIGHT * flow
                + self.MAX_SHIFT_NO_ROT_WEIGHT * flow_without_rotation
                + self.MAX_BRIGHTNESS_WEIGHT * brightness
            )
            > self.THRESHOLD
        ) or (frame_rmse / max(self._rmse, 1e-12) > self.MAX_EXCESS_ENERGY)
        need = need and reliable
        if need:
            self._rmse = -1.0
        return need


@dataclass
class FrequencyKeyframeStrategy:
    frequency: int = 5
    _count: int = field(default=0, repr=False)

    def need_new_keyframe(self, *_args, **_kwargs) -> bool:
        self._count += 1
        if self._count >= self.frequency:
            self._count = 0
            return True
        return False
