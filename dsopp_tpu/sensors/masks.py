"""Camera masks (valid-region bitmaps with a per-level pyramid).

Mirrors the reference ``CameraMask`` (reference:
src/sensors/camera_calibration/mask/camera_mask.hpp:21-117 — ROI/semantic
valid-region test, resizable per level, filterSemanticObjects).  A mask is
a [H, W] bool array; level masks AND-pool 2×2 blocks so a coarse pixel is
valid only if its children are.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def mask_pyramid(mask, num_levels: int):
    """[H, W] bool → tuple of per-level masks (AND-pooled)."""
    levels = [mask]
    for _ in range(num_levels - 1):
        m = levels[-1]
        h = (m.shape[0] // 2) * 2
        w = (m.shape[1] // 2) * 2
        m = m[:h, :w]
        levels.append(
            m[0::2, 0::2] & m[0::2, 1::2] & m[1::2, 0::2] & m[1::2, 1::2])
    return tuple(levels)


def load_mask(path, image_size=None):
    """Mask image (zero pixels = invalid) or full-valid default."""
    if path is None:
        assert image_size is not None
        w, h = int(image_size[0]), int(image_size[1])
        return jnp.ones((h, w), bool)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise IOError(f"cannot read mask {path}")
    return jnp.asarray(img > 0)


def filter_semantic_objects(mask, semantic_image, excluded_ids):
    """Invalidate pixels whose semantic class is in ``excluded_ids``
    (reference CameraMask::filterSemanticObjects)."""
    sem = jnp.asarray(semantic_image)
    bad = jnp.zeros_like(mask)
    for cid in excluded_ids:
        bad = bad | (sem == cid)
    return mask & ~bad
