"""Camera calibration loading + photometric calibration + vignetting.

Mirrors the reference calibration stack (reference:
src/sensors/camera_calibration/src/fabric.cpp — ``calib.txt`` with a model
tag line then image size + intrinsics; camera_settings.cpp — ``pcalib.txt``
inverse response and ``vignette.png``; undistorter.hpp — remap tables
any-model → pinhole).

``CameraCalibration`` owns the model type + intrinsics and produces
per-pyramid-level camera models (cameraModel<Model>(lvl) analog).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax.numpy as jnp

from dsopp_tpu.core.camera import IOSCamera, Pinhole, SimpleRadial, TumFov


@dataclass
class CameraCalibration:
    model_type: str             # "pinhole" | "simple_radial"
    image_size: tuple           # (width, height)
    intrinsics: np.ndarray
    shutter_time: float = 0.0

    def camera_model(self, level: int = 0, dtype=jnp.float32):
        scale = float(2 ** level)
        if self.model_type == "pinhole":
            fx, fy, cx, cy = self.intrinsics
            model = Pinhole.create(self.image_size, (fx, fy), (cx, cy), dtype)
        elif self.model_type == "simple_radial":
            f, cx, cy, k1, k2 = self.intrinsics
            model = SimpleRadial.create(self.image_size, f, (cx, cy), k1, k2, dtype)
        elif self.model_type == "tum_fov":
            fx, fy, cx, cy, fov = self.intrinsics
            model = TumFov.create(self.image_size, (fx, fy), (cx, cy), fov, dtype)
        elif self.model_type == "ios":
            fx, fy, cx, cy = self.intrinsics[:4]
            model = IOSCamera.create(self.image_size, (fx, fy), (cx, cy),
                                     self.intrinsics[4:], dtype)
        else:
            raise ValueError(f"unknown model type {self.model_type!r}")
        return model.scaled(scale) if level else model


def load_calibration(path: str, shutter_time: float = 0.0) -> CameraCalibration:
    """Parse a reference-format ``calib.txt``.

    Format (fabric.cpp:90-108)::

        <model>           # pinhole | simple_radial | tum_fov
        <width> <height>
        <intrinsics...>   # pinhole: fx fy cx cy; simple_radial: f cx cy k1 k2
    """
    with open(path) as f:
        tokens = f.read().split()
    model = tokens[0]
    vals = [float(t) for t in tokens[1:]]
    w, h = vals[0], vals[1]
    rest = vals[2:]
    if model == "pinhole":
        assert len(rest) >= 4
        return CameraCalibration("pinhole", (w, h), np.asarray(rest[:4]), shutter_time)
    if model == "simple_radial":
        assert len(rest) >= 5
        return CameraCalibration("simple_radial", (w, h), np.asarray(rest[:5]), shutter_time)
    if model == "tum_fov":
        # fx fy cx cy (relative) + fov: rectified to pinhole by the
        # undistorter; stored here in absolute pixels for the remap builder.
        fx, fy, cx, cy, fov = rest[:5]
        intr = np.asarray([fx * w, fy * h, cx * w, cy * h, fov])
        return CameraCalibration("tum_fov", (w, h), intr, shutter_time)
    if model == "ios":
        # fx fy cx cy + N lookup-table magnifier entries (ARKit LUT)
        assert len(rest) >= 6
        return CameraCalibration("ios", (w, h), np.asarray(rest), shutter_time)
    raise ValueError(f"unknown calibration model {model!r}")


def load_photometric_calibration(path: Optional[str]) -> np.ndarray:
    """``pcalib.txt``: 256 values of the inverse response function G⁻¹.

    Missing file → identity response (fabric.cpp defaultPhotometricCalibration).
    """
    if path is None:
        return np.arange(256, dtype=np.float32)
    try:
        with open(path) as f:
            vals = [float(t) for t in f.read().split()]
    except OSError:
        return np.arange(256, dtype=np.float32)
    if len(vals) != 256:
        return np.arange(256, dtype=np.float32)
    return np.asarray(vals, np.float32)


def load_vignetting(path: Optional[str]) -> Optional[np.ndarray]:
    """``vignette.png`` (16-bit) → [H, W] multiplicative attenuation in (0,1]."""
    if path is None:
        return None
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        return None
    img = img.astype(np.float32)
    return img / img.max()
