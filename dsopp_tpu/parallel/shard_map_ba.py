"""Explicit-collective BA step over a device mesh (shard_map + psum).

The sibling module :mod:`dsopp_tpu.parallel.sharded` uses sharding
annotations and lets XLA's SPMD partitioner insert the collectives.  This
module is the explicit formulation of the same math — the isolable
"distributed communication backend" component (SURVEY §5): each device owns
a shard of the landmark slot axis, evaluates its residuals/Jacobians and
partial Hessians locally, and the tiny pose system is reduced with
``lax.psum`` over the ``lm`` mesh axis (ICI within a host / pod slice, DCN
across hosts via :func:`dsopp_tpu.parallel.mesh.make_hybrid_mesh`).  The
dense (K·8)² solve is replicated; the idepth back-substitution stays
landmark-local (no communication).

This replaces the reference's mutex-merged TBB accumulators
(hessian_block_evaluation.hpp:102-246) with one all-reduce of the
(K·8)²-sized partial systems.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX ≥ 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from dsopp_tpu.parallel.mesh import LM_AXIS
from dsopp_tpu.solvers.pba import (
    PBAOptions,
    Window,
    _energy,
    _fej_cache,
    _linearize,
    _prior_system,
    _solve_step,
    active_lm_mask,
)


def _window_specs() -> Window:
    """PartitionSpec pytree: landmark-slot axis sharded over ``lm``."""
    frame = P(None)
    lm2 = P(None, LM_AXIS)
    res = P(None, None, LM_AXIS)
    return Window(
        t_lin_q=frame, t_lin_t=frame, affine0=frame, eps=frame,
        exposure=frame, frame_valid=frame, frame_fixed=frame,
        frame_marg=frame, frame_id=frame,
        lm_uv=lm2, lm_patch=lm2, lm_idepth=lm2, lm_valid=lm2,
        lm_marg_flag=lm2, lm_outlier=lm2, lm_inliers=lm2,
        lm_opt_count=lm2, lm_baseline=lm2,
        res_status=res,
        h_marg=P(), b_marg=P(), energy_marg=P(),
        h_marg_lo=P(), b_marg_lo=P(), energy_marg_lo=P(),
        maps=frame, patch=frame, patch_map=frame,
    )


def place_window(window: Window, mesh) -> Window:
    """Put a single Window on the mesh with the ``lm``-sharded layout."""
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        window, _window_specs())


def pba_iteration_shard_map(window: Window, model, regularizer,
                            opts: PBAOptions, mesh):
    """One LM iteration with explicit psum'd Hessian accumulation.

    Returns (eps' [K,8] replicated, idepth' [K,N] lm-sharded, step_sq,
    energy', n_valid') — the same quantities as the annotation-based path,
    bitwise-equal up to reduction order.
    """
    specs = _window_specs()

    @partial(jax.jit, static_argnames=())
    @partial(
        _shard_map, mesh=mesh,
        in_specs=(specs, P()),
        out_specs=(P(), P(None, LM_AXIS), P(), P(), P()),
        check_vma=False,
    )
    def step(win: Window, reg):
        lm_mask = active_lm_mask(win)
        fej = _fej_cache(win, model)
        sys = _linearize(win, model, fej, win.eps, win.lm_idepth, lm_mask,
                         opts, with_prior=False)
        # the all-reduce: partial (K·8)² photometric systems over the
        # landmark shards — the only communication in the iteration
        h_pose = jax.lax.psum(sys.h_pose, LM_AXIS)
        b_pose = jax.lax.psum(sys.b_pose, LM_AXIS)
        h_schur = jax.lax.psum(sys.h_schur, LM_AXIS)
        b_schur = jax.lax.psum(sys.b_schur, LM_AXIS)
        # priors are frame-indexed (replicated): added exactly once
        h_pr, b_pr = _prior_system(win, win.eps, opts)
        sys = sys._replace(h_pose=h_pose + h_pr, b_pose=b_pose + b_pr,
                           h_schur=h_schur, b_schur=b_schur)
        eps_new, idepth_new, pose_sq, d_sq = _solve_step(
            win, sys, win.eps, win.lm_idepth, reg, opts)
        step_sq = pose_sq + jax.lax.psum(d_sq, LM_AXIS)

        # energy at the candidate state: landmark sums reduce over shards
        e, n, _ = _energy(win, model, eps_new, idepth_new, lm_mask, opts)
        # _energy already includes priors + the marginalized quadratic,
        # which are replicated — psum only the landmark part
        e_land_local = e - _replicated_energy(win, eps_new, opts)
        e_total = (jax.lax.psum(e_land_local, LM_AXIS)
                   + _replicated_energy(win, eps_new, opts))
        n_total = jax.lax.psum(n, LM_AXIS)
        return eps_new, idepth_new, step_sq, e_total, n_total

    return step(window, regularizer)


def _replicated_energy(window: Window, eps, opts: PBAOptions):
    """Prior + marginalized-quadratic energy (identical on every shard)."""
    from dsopp_tpu.core import df64
    from dsopp_tpu.solvers.pba import _prior_energy

    # same compensated formula as pba._energy_from_ev for bitwise parity
    s = eps.reshape(-1)
    hs_hi, hs_lo = df64.df_matvec(window.h_marg, window.h_marg_lo, s)
    bs_hi, bs_lo = df64.df_dot(window.b_marg, window.b_marg_lo, s)
    shs_hi, shs_lo = df64.df_dot(hs_hi, hs_lo, s)
    e_hi, e_lo = df64.df_add(window.energy_marg, window.energy_marg_lo,
                             bs_hi, bs_lo)
    e_hi, e_lo = df64.df_add(e_hi, e_lo, 0.5 * shs_hi, 0.5 * shs_lo)
    return _prior_energy(window, eps, opts) + df64.value(
        e_hi, e_lo).astype(eps.dtype)
