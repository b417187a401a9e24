"""Undistortion: precomputed remap tables any-model → pinhole.

Mirrors the reference ``Undistorter``
(reference: src/sensors/camera_calibration/undistorter/undistorter.hpp:24,70
and fabric.cpp:41-71 — construct a pinhole target model covering the valid
region of the source model, plus (x, y) remap tables; images are remapped
once per frame, after which the whole pipeline runs on the pinhole model).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax.numpy as jnp

from dsopp_tpu.core.camera import Pinhole


@dataclass
class Undistorter:
    """Remap tables mapping target(pinhole) pixels → source pixels."""

    target_model: Pinhole
    map_x: Optional[np.ndarray] = None   # None → identity
    map_y: Optional[np.ndarray] = None

    @property
    def identity(self) -> bool:
        return self.map_x is None

    def undistort(self, image: np.ndarray) -> np.ndarray:
        if self.identity:
            return image
        import cv2

        return cv2.remap(
            image, self.map_x, self.map_y,
            interpolation=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)


def identity_undistorter(model: Pinhole) -> Undistorter:
    return Undistorter(model)


def build_remaps(source_model, dtype=jnp.float64) -> Undistorter:
    """Construct pinhole target + remap tables for a distorted source model.

    The target keeps the source's focal/center (reference chooses the
    pinhole covering the undistorted image region); each target pixel is
    unprojected through the pinhole and reprojected through the source
    model to produce the sampling position.
    """
    w, h = [int(v) for v in np.asarray(source_model.image_size)]
    if hasattr(source_model, "f"):
        focal = float(source_model.f)
        cx, cy = float(source_model.cx), float(source_model.cy)
    else:
        focal = float(source_model.fx)
        cx, cy = float(source_model.cx), float(source_model.cy)
    target = Pinhole.create((float(w), float(h)), (focal, focal), (cx, cy), dtype)

    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    uv = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    rays = target.unproject(uv)
    src_uv, _valid = source_model.project(rays)
    src = np.asarray(src_uv).reshape(h, w, 2).astype(np.float32)
    return Undistorter(target, src[..., 0], src[..., 1])
