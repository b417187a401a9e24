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


def build_test_window(
    seq: SyntheticSequence,
    frame_ids,
    num_landmarks: int = 200,
    slots: int = 8,
    pose_noise: float = 0.0,
    idepth_noise: float = 0.0,
    seed: int = 0,
    dtype=jnp.float64,
    embedder=None,
):
    """Sliding-window PBA problem seeded from GT (SolverTestData analog).

    Keyframes at ``frame_ids`` with GT poses (optionally perturbed, first
    frame fixed and exact), landmarks from the candidate extractor with GT
    inverse depth (optionally perturbed).  ``embedder``: optional frame
    embedder (features/embedder.py) — the window then carries C-channel
    patch tables and [N, C·P] reference patches (reference
    pixel_map.hpp:17 template<int C>).
    """
    from dsopp_tpu.core.interpolate import build_pixel_map, sample
    from dsopp_tpu.core.pattern import shift_pattern
    from dsopp_tpu.features import select_candidates
    from dsopp_tpu.solvers.pba import Window, empty_window, push_frame

    h, w = seq.images[0].shape
    channels = 1 if embedder is None else embedder.channels
    window = empty_window(slots, num_landmarks, (3, h, w), dtype=dtype,
                          channels=channels)
    key = jax.random.PRNGKey(seed)

    for pos, f in enumerate(frame_ids):
        key, kp, kd = jax.random.split(key, 3)
        img = jnp.asarray(seq.images[f], dtype)
        pm = build_pixel_map(img)
        cands = select_candidates(pm, num_landmarks)
        pattern = shift_pattern(cands.uv)
        if embedder is None:
            patches, _ = sample(pm, pattern)
            lm_patch = patches[..., 0]
            embed = None
        else:
            embed = embedder(img)                        # [C, H, W]
            vals, _ = sample(embed, pattern)             # [N, P, C]
            lm_patch = jnp.swapaxes(vals, -1, -2).reshape(
                cands.uv.shape[0], -1)                   # [N, C*P]
        uv = np.asarray(cands.uv)
        gt_idepth = jnp.asarray(
            seq.idepths[f][uv[:, 1].astype(int), uv[:, 0].astype(int)], dtype)
        if idepth_noise > 0:
            gt_idepth = gt_idepth * (
                1.0 + idepth_noise * jax.random.normal(kd, gt_idepth.shape, dtype))
        pose = seq.pose_t_wc(f)
        if pose_noise > 0 and pos > 0:
            pose = perturbed_pose(pose, kp, pose_noise, pose_noise)
        window = push_frame(
            window, SE3(jnp.asarray(pose.q, dtype), jnp.asarray(pose.t, dtype)),
            pm, frame_id=f, fixed=(pos == 0),
            lm_uv=cands.uv, lm_patch=lm_patch, lm_idepth=gt_idepth,
            embed_channels=embed,
        )
    return window


def perturbed_pose(t: SE3, key, translation_sigma=POSE_DEVIATION, rotation_sigma=POSE_DEVIATION):
    """GT pose with reference-style noise (kPoseDeviation=2e-2)."""
    kt, kr = jax.random.split(key)
    xi = jnp.concatenate([
        jax.random.normal(kt, (3,), t.t.dtype) * translation_sigma,
        jax.random.normal(kr, (3,), t.t.dtype) * rotation_sigma,
    ])
    return t @ SE3.exp(xi)
