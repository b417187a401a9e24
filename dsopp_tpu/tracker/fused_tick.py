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
from dsopp_tpu.tracker.monocular import (ENERGY_RATIO_THRESHOLD,
                                         _initialization_hypotheses)


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
    escalated: jnp.ndarray     # bool — perturbation re-track ran this tick


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
    rmse_last0=None,       # frontend reliability ledger (escalation gate)
) -> FusedTickResult:
    dtype = image.dtype
    maps = build_pyramid_maps(image, num_levels)

    # ---- batched hypothesis alignment, coarse → fine ------------------
    kf_q = window_poses_q[kf_slot]
    kf_t = window_poses_t[kf_slot]

    def run_hypotheses(hyps: SE3):
        t_w_kf = SE3(jnp.broadcast_to(kf_q, hyps.q.shape),
                     jnp.broadcast_to(kf_t, hyps.t.shape))
        t = hyps.inverse().compose(t_w_kf)  # hypotheses of new ← keyframe
        affine = jnp.broadcast_to(last_affine, t.q.shape[:1] + (2,))
        result = None
        for level in range(num_levels - 1, -1, -1):
            result = jax.vmap(
                lambda tq, tt, ab, lvl=level: align_level(
                    level_points[lvl], maps[lvl], models[lvl], SE3(tq, tt),
                    ab, last_affine, 1.0, align_opts)
            )(t.q, t.t, affine)
            t = result.t_t_r
            affine = result.affine
        # score by PER-POINT energy with a valid-count floor: a spurious
        # minimum that drops most points can have a lower SUMMED energy
        # than the true pose (the reference's per-try acceptance gates on
        # rmse, not total energy — monocular_tracker.cpp:185)
        nv = result.num_valid
        nv_floor = jnp.maximum(1, jnp.max(nv) // 2)
        score = jnp.where(nv >= nv_floor,
                          result.energy / jnp.maximum(nv, 1), jnp.inf)
        best = jnp.argmin(score)
        return (result.t_t_r.q[best], result.t_t_r.t[best],
                result.affine[best], result.rmse[best],
                result.num_valid[best], score[best])

    base = _initialization_hypotheses(
        SE3(last_q, last_t), SE3(prev_q, prev_t), SE3(kf_q, kf_t),
        False, dtype)
    bq, bt, b_affine, b_rmse, b_valid, b_score = run_hypotheses(base)

    escalated = jnp.asarray(False)
    if with_perturbations:
        # reference semantics (monocular_tracker.cpp:137-243): the ±1..3°
        # rotation-perturbed re-track runs only when the plain
        # initializations FAIL the reliability gate — under lax.cond the
        # steady state never pays for it, and the failure tick runs all
        # perturbations as one batch (strictly stronger than the
        # reference's sequential first-success scan).
        thr = jnp.asarray(jnp.inf if rmse_last0 is None else
                          ENERGY_RATIO_THRESHOLD * rmse_last0, dtype)
        failed = (b_valid == 0) | (b_rmse >= thr)

        def escalate(_):
            pert = _initialization_hypotheses(
                SE3(last_q, last_t), SE3(prev_q, prev_t), SE3(kf_q, kf_t),
                True, dtype)
            return run_hypotheses(pert)

        def keep(_):
            return bq, bt, b_affine, b_rmse, b_valid, b_score

        eq, et, e_affine, e_rmse, e_valid, e_score = jax.lax.cond(
            failed, escalate, keep, None)
        take = e_score < b_score
        bq = jnp.where(take, eq, bq)
        bt = jnp.where(take, et, bt)
        b_affine = jnp.where(take, e_affine, b_affine)
        b_rmse = jnp.where(take, e_rmse, b_rmse)
        b_valid = jnp.where(take, e_valid, b_valid)
        escalated = failed

    t_t_kf = SE3(bq, bt)
    best_affine = b_affine
    rmse = b_rmse
    num_valid = b_valid

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
        t_kf_frame_mat=t_t_kf.inverse().matrix(), escalated=escalated,
    )
