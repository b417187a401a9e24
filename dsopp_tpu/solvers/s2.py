"""S2 unit-sphere local parameterization.

Mirrors the reference ``LocalParameterizationS2``
(src/energy/problems/internal/energy/problems/local_parameterization_s2.hpp):
a 3-vector on the unit sphere is updated through its spherical coordinates
(θ, φ) by a 2-dof local increment, with the analytic 3×2 plus-Jacobian.
Used by the SO3×S2 relative-pose refinement (fbs/geometry.py) where the
translation DIRECTION is observable but its scale is not (monocular
epipolar geometry), and available standalone for any unit-vector state.
"""

from __future__ import annotations

import jax.numpy as jnp


def s2_plus(v, delta):
    """S2 ⊞: perturb unit vector(s) ``v`` [..., 3] by ``delta`` [..., 2].

    θ' = acos(v_z) + δ₀, φ' = atan2(v_y, v_x) + δ₁ →
    (sinθ'cosφ', sinθ'sinφ', cosθ') — always exactly unit norm.
    """
    theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0)) + delta[..., 0]
    phi = jnp.arctan2(v[..., 1], v[..., 0]) + delta[..., 1]
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)], axis=-1)


def s2_plus_jacobian(v):
    """d(s2_plus(v, δ))/dδ at δ = 0 → [..., 3, 2]."""
    theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    rows = jnp.stack([
        ct * cp, st * (-sp),
        ct * sp, st * cp,
        -st, jnp.zeros_like(st),
    ], axis=-1)
    return rows.reshape(rows.shape[:-1] + (3, 2))
