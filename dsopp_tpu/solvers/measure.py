"""Residual measures: Huber-weighted SSD over patches.

Mirrors the reference semantics (similarity_measure_ssd.hpp:13-37 and the
Huber application in evaluate_jacobians.hpp / eigen_pose_alignment.cpp):
the loss operates on the **whole-patch** residual norm (all P pattern pixels
of one landmark share a single weight), with

    ‖r‖² ≤ σ²:  energy = ‖r‖²/2,          weight = 1
    ‖r‖² > σ²:  energy = σ‖r‖ − σ²/2,     weight = σ/‖r‖
"""

import jax.numpy as jnp


def huber_energy_weight(residual_sq_norm, sigma):
    """[...] patch squared norms → (energy [...], irls weight [...])."""
    sigma_sq = sigma * sigma
    norm = jnp.sqrt(jnp.maximum(residual_sq_norm, 1e-30))
    linear = residual_sq_norm > sigma_sq
    energy = jnp.where(linear, sigma * norm - 0.5 * sigma_sq, 0.5 * residual_sq_norm)
    weight = jnp.where(linear, sigma / norm, jnp.ones_like(norm))
    return energy, weight
