"""Activation-time idepth refinement (the REFINE path).

Parity model: reference optimizeImmatureLandmark
(landmarks_activator.cpp:123-312) — a 3-iteration scalar LM on idepth per
to-activate point; refined idepth must move toward GT and inlier-poor points
must be rejected.
"""

import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.interpolate import sample
from dsopp_tpu.core.pattern import shift_pattern
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.testing.fixtures import build_test_window
from dsopp_tpu.tracker.activation import _refine_idepth_kernel
from dsopp_tpu.tracker.depth_estimation import make_immature_points

FRAMES = [0, 2, 4, 6, 8]


def _immature_bank(seq, window, host_pos, frame, n, idepth_scale, dtype):
    """Immature points in window frame ``host_pos`` with perturbed GT idepth."""
    from dsopp_tpu.features import select_candidates

    pm = window.maps[host_pos]
    cands = select_candidates(pm, n)
    patches, _ = sample(pm, shift_pattern(cands.uv))
    grads, _ = sample(pm, cands.uv)
    bank = make_immature_points(cands.uv, patches[..., 0], grads[..., 1:],
                                dtype=dtype)
    uv = np.asarray(cands.uv).astype(int)
    gt = seq.idepths[frame][uv[:, 1], uv[:, 0]]
    pert = jnp.asarray(gt * idepth_scale, dtype)
    bank = bank._replace(
        idepth_min=pert, idepth_max=pert,
        valid=bank.valid & cands.valid)
    return bank, jnp.asarray(gt, dtype)


def test_refinement_pulls_idepth_toward_gt():
    seq = render_sequence(num_frames=10, height=240, width=320)
    window = build_test_window(seq, FRAMES, seed=21)
    k = window.num_slots
    n = 96
    dtype = window.lm_uv.dtype

    bank, gt = _immature_bank(seq, window, 0, FRAMES[0], n, 1.10, dtype)
    imm = jnp.zeros((k,), bool)  # build the [K] banked pytree
    import jax

    banked = jax.tree_util.tree_map(
        lambda x: jnp.zeros((k,) + x.shape, x.dtype).at[0].set(x), bank)

    activate = jnp.zeros((k, n), bool).at[0].set(np.asarray(bank.valid))
    idepth, keep, selected = _refine_idepth_kernel(window, seq.camera, banked,
                                                   activate, 20.0)
    assert bool(jnp.all(selected == activate))  # all fit within the cap

    kept = np.asarray(keep[0])
    assert kept.sum() > n // 2, f"only {kept.sum()} survived refinement"
    err0 = np.abs(np.asarray(banked.idepth[0]) - np.asarray(gt)) / np.asarray(gt)
    err1 = np.abs(np.asarray(idepth[0]) - np.asarray(gt)) / np.asarray(gt)
    assert np.median(err1[kept]) < 0.5 * np.median(err0[kept]), (
        np.median(err0[kept]), np.median(err1[kept]))


def test_refinement_rejects_bogus_idepth():
    seq = render_sequence(num_frames=10, height=240, width=320)
    window = build_test_window(seq, FRAMES, seed=22)
    k = window.num_slots
    n = 64
    dtype = window.lm_uv.dtype

    bank, _ = _immature_bank(seq, window, 0, FRAMES[0], n, 6.0, dtype)
    import jax

    banked = jax.tree_util.tree_map(
        lambda x: jnp.zeros((k,) + x.shape, x.dtype).at[0].set(x), bank)
    activate = jnp.zeros((k, n), bool).at[0].set(np.asarray(bank.valid))
    _, keep, _ = _refine_idepth_kernel(window, seq.camera, banked, activate, 20.0)
    # wildly wrong idepth cannot be rescued by 3 LM iterations for most points
    assert np.asarray(keep[0]).sum() < 0.8 * np.asarray(bank.valid).sum()


def test_beyond_cap_candidates_defer_not_delete():
    """Activating candidates past the REFINE_CAP slots must stay immature
    (selected=False), not be deleted (advisor r4: bursty first-keyframe
    ticks would otherwise permanently lose points)."""
    import jax

    from dsopp_tpu.tracker import activation as act_mod

    seq = render_sequence(num_frames=10, height=240, width=320)
    window = build_test_window(seq, FRAMES, seed=23)
    k = window.num_slots
    n = 64
    dtype = window.lm_uv.dtype

    bank, _ = _immature_bank(seq, window, 0, FRAMES[0], n, 1.05, dtype)
    banked = jax.tree_util.tree_map(
        lambda x: jnp.zeros((k,) + x.shape, x.dtype).at[0].set(x), bank)
    activate = jnp.zeros((k, n), bool).at[0].set(np.asarray(bank.valid))
    n_act = int(np.asarray(activate).sum())
    cap = max(1, n_act // 2)  # force half the burst beyond the cap
    _, keep, selected = _refine_idepth_kernel(
        window, seq.camera, banked, activate, 20.0, cap=cap)
    sel = np.asarray(selected)
    assert sel.sum() == cap
    # the beyond-cap candidates are neither kept nor marked selected —
    # activate_deferred's `delete |= selected & ~keep` leaves them immature
    beyond = np.asarray(activate) & ~sel
    assert beyond.sum() == n_act - cap
    assert not np.any(np.asarray(keep) & beyond)
