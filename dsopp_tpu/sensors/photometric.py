"""Photometric image correction (inverse response + vignetting).

Mirrors the reference ``photometrically_corrected_image``
(reference: src/features/src/photometrically_corrected_image.cpp — apply the
inverse response LUT G⁻¹ to raw intensities, then divide by the vignetting
attenuation).  Jitted; the LUT lookup is a gather over 256 entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def correct_image(image, inverse_response, vignetting=None):
    """[H, W] raw (0..255) → photometrically corrected irradiance image."""
    idx = jnp.clip(image, 0.0, 255.0)
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, 255)
    frac = idx - lo
    lut = jnp.asarray(inverse_response, image.dtype)
    corrected = lut[lo] * (1.0 - frac) + lut[hi] * frac
    if vignetting is not None:
        corrected = corrected / jnp.maximum(vignetting, 1e-3)
    return corrected
