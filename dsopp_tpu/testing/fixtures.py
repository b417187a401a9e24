"""Builders turning the synthetic GT sequence into solver inputs.

The analog of the reference ``test_tools::SolverTestData``
(reference: test/tools/src/solver_test_data.cpp:31-90): seed solver problems
with GT poses/depths from the rendered sequence, optionally perturbed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.interpolate import sample
from dsopp_tpu.core.lie import SE3
from dsopp_tpu.features.pyramid import build_pyramid_maps
from dsopp_tpu.solvers.pose_alignment import LevelPoints
from dsopp_tpu.testing.synthetic import SyntheticSequence

# Reference kPoseDeviation (solver_test_data.cpp:84-90).
POSE_DEVIATION = 2e-2


def pyramid_models(camera, num_levels):
    return [camera.scaled(float(2 ** l)) for l in range(num_levels)]


def frame_pyramid_maps(seq: SyntheticSequence, frame: int, num_levels: int = 5):
    return build_pyramid_maps(jnp.asarray(seq.images[frame]), num_levels)


def gt_level_points(
    seq: SyntheticSequence,
    frame: int,
    num_levels: int = 5,
    stride: int = 6,
    border: int = 8,
):
    """Semi-dense GT points per level for frontend alignment tests.

    Points are taken on a stride grid at level 0 with GT inverse depth, then
    expressed at each level (uv/2^l, intensity sampled from that level).
    """
    h, w = seq.images[frame].shape
    ys, xs = np.meshgrid(
        np.arange(border, h - border, stride), np.arange(border, w - border, stride),
        indexing="ij",
    )
    uv0 = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), dtype=jnp.float64)
    idepth = jnp.asarray(seq.idepths[frame][ys, xs].reshape(-1))
    maps = frame_pyramid_maps(seq, frame, num_levels)

    levels = []
    for lvl in range(num_levels):
        uv_l = uv0 / (2.0 ** lvl)
        vals, inside = sample(maps[lvl], uv_l)
        levels.append(LevelPoints(uv_l, idepth, vals[..., 0], inside))
    return levels


def perturbed_pose(t: SE3, key, translation_sigma=POSE_DEVIATION, rotation_sigma=POSE_DEVIATION):
    """GT pose with reference-style noise (kPoseDeviation=2e-2)."""
    kt, kr = jax.random.split(key)
    xi = jnp.concatenate([
        jax.random.normal(kt, (3,), t.t.dtype) * translation_sigma,
        jax.random.normal(kr, (3,), t.t.dtype) * rotation_sigma,
    ])
    return t @ SE3.exp(xi)
