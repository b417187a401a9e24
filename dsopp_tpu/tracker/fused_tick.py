"""Fused regular-frame tick: one device program per tracked frame.

On remote-attached TPUs every dispatch and readback is a host round-trip,
so the per-frame hot path (pyramid → hypothesis batch → coarse-to-fine
alignment → epipolar depth update → flow statistics) is fused into a single
jitted program returning only scalar summaries + updated state.  The host
reads the scalars once and takes the keyframe decision (reference
monocular_tracker.cpp tick structure, SURVEY §7 "host↔device loop latency").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.features.pyramid import build_pyramid_maps
from dsopp_tpu.solvers.pose_alignment import AlignmentOptions, align_level
from dsopp_tpu.tracker.depth_estimation import estimate_depths
from dsopp_tpu.tracker.depth_map import mean_square_optical_flow
from dsopp_tpu.tracker.monocular import _initialization_hypotheses


class FusedTickResult(NamedTuple):
    maps: tuple                # pyramid maps of this frame
    pose_q: jnp.ndarray        # best T_w_t
    pose_t: jnp.ndarray
    affine: jnp.ndarray        # [2]
    rmse: jnp.ndarray          # scalar
    num_valid: jnp.ndarray     # scalar int
    flow: jnp.ndarray
    flow_no_rot: jnp.ndarray
    immature: object           # updated banks
    t_t_kf_q: jnp.ndarray
    t_t_kf_t: jnp.ndarray
    t_kf_frame_mat: jnp.ndarray  # 4x4 keyframe→frame (attach bookkeeping)


@partial(jax.jit, static_argnames=("align_opts", "with_perturbations",
                                   "num_levels", "huber_sigma"))
def fused_regular_tick(
    image,
    level_points,          # tuple of LevelPoints (static length)
    depth_idepth0,         # [H, W] level-0 depth map accumulators
    depth_weight0,
    window_poses_q,        # [K, 4] current keyframe poses
    window_poses_t,        # [K, 3]
    window_affines,        # [K, 2]
    kf_slot,               # scalar int: newest keyframe slot
    immature,              # ImmaturePoints bank [K]
    last_q, last_t,        # previous frame pose
    prev_q, prev_t,        # previous relative motion
    last_affine,           # [2]
    models,                # per-level camera models (static tuple)
    align_opts: AlignmentOptions,
    with_perturbations: bool,
    num_levels: int,
    huber_sigma: float,
) -> FusedTickResult:
    dtype = image.dtype
    maps = build_pyramid_maps(image, num_levels)

    # ---- batched hypothesis alignment, coarse → fine ------------------
    kf_q = window_poses_q[kf_slot]
    kf_t = window_poses_t[kf_slot]
    hyps = _initialization_hypotheses(
        SE3(last_q, last_t), SE3(prev_q, prev_t), SE3(kf_q, kf_t),
        with_perturbations, dtype)
    t_w_kf = SE3(jnp.broadcast_to(kf_q, hyps.q.shape),
                 jnp.broadcast_to(kf_t, hyps.t.shape))
    t = hyps.inverse().compose(t_w_kf)      # hypotheses of new ← keyframe
    affine = jnp.broadcast_to(last_affine, t.q.shape[:1] + (2,))

    result = None
    for level in range(num_levels - 1, -1, -1):
        result = jax.vmap(
            lambda tq, tt, ab, lvl=level: align_level(
                level_points[lvl], maps[lvl], models[lvl], SE3(tq, tt), ab,
                last_affine, 1.0, align_opts)
        )(t.q, t.t, affine)
        t = result.t_t_r
        affine = result.affine

    score = jnp.where(result.num_valid > 0, result.energy, jnp.inf)
    best = jnp.argmin(score)
    t_t_kf = SE3(result.t_t_r.q[best], result.t_t_r.t[best])
    best_affine = result.affine[best]
    rmse = result.rmse[best]
    num_valid = result.num_valid[best]

    t_w_t = SE3(kf_q, kf_t) @ t_t_kf.inverse()

    # ---- epipolar depth update over all keyframe banks ----------------
    k = window_poses_q.shape[0]
    t_inv = t_w_t.inverse()
    t_rel = SE3(jnp.broadcast_to(t_inv.q, (k, 4)),
                jnp.broadcast_to(t_inv.t, (k, 3))).compose(
        SE3(window_poses_q, window_poses_t))
    immature = jax.vmap(
        estimate_depths,
        in_axes=(0, None, None, 0, 0, None, 0, None, None),
    )(immature, maps[0], models[0], t_rel, window_affines, best_affine,
      jnp.ones(k, dtype), huber_sigma, 32)

    # ---- flow statistics ---------------------------------------------
    flow = mean_square_optical_flow(depth_idepth0, depth_weight0, models[0], t_t_kf)
    no_rot = SE3(jnp.asarray([1.0, 0, 0, 0], dtype), t_t_kf.t)
    flow_nr = mean_square_optical_flow(depth_idepth0, depth_weight0, models[0], no_rot)

    return FusedTickResult(
        maps=maps, pose_q=t_w_t.q, pose_t=t_w_t.t, affine=best_affine,
        rmse=rmse, num_valid=num_valid, flow=flow, flow_no_rot=flow_nr,
        immature=immature, t_t_kf_q=t_t_kf.q, t_t_kf_t=t_t_kf.t,
        t_kf_frame_mat=t_t_kf.inverse().matrix(),
    )
