"""Parity: [B]-batched multi-sequence tracking vs B independent runs.

The batched tick must be pure data parallelism: sequence b's results must
equal running sequence b alone through the device loop (vmap turns the
keyframe ``lax.cond`` into a select that keeps each sequence's own branch
result).

What can and cannot be asserted, measured on the f64 CPU oracle:

* WITHIN one compilation, parity is exact: B replicas of the same sequence
  stay **bitwise identical** over a full run (``test_replicated_batch``) —
  there is no cross-sequence interaction of any kind.
* ACROSS compilations (batched program vs solo program), XLA tiles
  reductions differently; last-ulp energy differences flip near-tied
  epipolar ``argmin`` samples, one flipped sample moves that landmark's
  idepth by a whole search step, and the keyframe/marginalization cascade
  amplifies this chaotically (measured: ~2e-9 after one tick, cm-level
  after 24 ticks).  So vs solo runs the tests assert one-tick closeness,
  identical keyframe decisions, and equal tracking QUALITY vs ground
  truth — not pose-wise equality over long horizons.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.batched_loop import BatchedPipelinedTracker
from dsopp_tpu.tracker.device_loop import PipelinedTracker
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

NUM_FRAMES = 30
INIT_FRAMES = 6
H, W = 120, 160
B = 3

CFG = TrackerConfig(
    num_frame_slots=7,
    landmarks_per_frame=96,
    immature_per_frame=192,
    desired_points=400,
    frontend_points=600,
    keyframe_factor=3.0,
    window_min=3,
    window_max=4,   # small window → frame marginalization happens in-run
    use_rotation_perturbations=False,
)


def _sequences():
    # different scene/trajectory per sequence (seed + advance vary)
    return [render_sequence(num_frames=NUM_FRAMES, height=H, width=W,
                            seed=seed, advance=adv)
            for seed, adv in ((7, 0.08), (11, 0.06), (13, 0.10))]


def _make_tracker(seq):
    tracker = MonocularTracker(seq.camera, CFG, dtype=jnp.float64)
    init = [
        (i, float(seq.timestamps[i]), seq.images[i],
         SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
             jnp.asarray(seq.pose_t_wc(i).t, jnp.float64)))
        for i in range(INIT_FRAMES)
    ]
    tracker.initialize(init)
    return tracker


@pytest.fixture(scope="module")
def runs():
    seqs = _sequences()

    # independent device-loop runs
    solo = []
    for seq in seqs:
        t = _make_tracker(seq)
        pipe = PipelinedTracker(t, flush_every=7)
        for i in range(INIT_FRAMES, NUM_FRAMES):
            pipe.tick(i, float(seq.timestamps[i]), seq.images[i])
        pipe.finalize()
        solo.append(t)

    # one batched run over the same three sequences
    batched_trackers = [_make_tracker(seq) for seq in seqs]
    bpipe = BatchedPipelinedTracker(batched_trackers, flush_every=7)
    for i in range(INIT_FRAMES, NUM_FRAMES):
        bpipe.tick([i] * B, [float(s.timestamps[i]) for s in seqs],
                   [s.images[i] for s in seqs])
    bpipe.finalize()
    return seqs, solo, batched_trackers


def test_keyframe_decisions_match(runs):
    """Cross-COMPILATION caveat (module docstring): a razor-thin keyframe
    threshold can flip between the batched and solo programs late in the
    run; decisions must agree except possibly at the FINAL tick (where a
    flipped decision has no downstream trajectory to validate)."""
    _, solo, batched = runs
    last = NUM_FRAMES - 1
    for s, b in zip(solo, batched):
        ks = {k for k in s.track.keyframe_timestamps if k != last}
        kb = {k for k in b.track.keyframe_timestamps if k != last}
        assert sorted(ks) == sorted(kb)
    # sequences genuinely diverge from each other (no trivial cross-talk)
    kfs = [tuple(sorted(t.track.keyframe_timestamps)) for t in batched]
    assert len(set(kfs)) > 1


def test_replicated_batch_bitwise(runs):
    """B replicas of ONE sequence stay bitwise identical over a full run —
    the strong no-cross-talk guarantee (one compilation, full horizon)."""
    import jax

    seqs, _, _ = runs
    seq = seqs[0]
    trackers = [_make_tracker(seq) for _ in range(B)]
    bpipe = BatchedPipelinedTracker(trackers, flush_every=9)
    for i in range(INIT_FRAMES, NUM_FRAMES):
        bpipe.tick([i] * B, [float(seq.timestamps[i])] * B,
                   [seq.images[i]] * B)
    bpipe.finalize()
    for leaf in jax.tree_util.tree_leaves(bpipe.states):
        arr = np.asarray(leaf)
        for b in range(1, B):
            np.testing.assert_array_equal(arr[b], arr[0])
    t0 = trackers[0].track.trajectory(trackers[0].window)
    for t in trackers[1:]:
        tb = t.track.trajectory(t.window)
        assert len(tb) == len(t0)
        for (ta, ma), (tb_, mb) in zip(t0, tb):
            assert ta == tb_
            np.testing.assert_array_equal(ma, mb)


def test_single_tick_parity(runs):
    """One batched tick from identical states ≈ the solo tick (tight)."""
    import jax

    from dsopp_tpu.tracker.batched_loop import (
        batched_device_tick, stack_states, unstack_state)
    from dsopp_tpu.tracker.device_loop import device_tick

    seqs, _, _ = runs
    trackers = [_make_tracker(seq) for seq in seqs]
    pipes = [PipelinedTracker(t) for t in trackers]
    states = stack_states([p.state for p in pipes])
    images = jnp.stack([jnp.asarray(s.images[INIT_FRAMES], jnp.float64)
                        for s in seqs])
    fids = jnp.asarray([INIT_FRAMES] * B, jnp.int32)
    force = jnp.zeros(B, bool)
    new_states, diag = batched_device_tick(
        states, images, fids, force, pipes[0].models, pipes[0].mask,
        pipes[0].cfg)
    for b, pipe in enumerate(pipes):
        solo_state, solo_diag = device_tick(
            pipe.state, images[b], fids[b], force[b], pipe.models,
            pipe.mask, pipe.cfg)
        got = unstack_state(new_states, b)
        # cross-COMPILATION parity: the batched and solo programs
        # reassociate f32 reductions differently, and threshold comparisons
        # (hypothesis argmin, reliability gate, activation spacing) can flip
        # on the last ulp — a single flipped candidate then re-pairs the
        # whole rank-matched activation scatter, so landmark BANK CONTENTS
        # are not comparable element-wise across compilations.  Agreement is
        # asserted on the trajectory-level state (poses, motion, affine,
        # reliability ledger) plus structural invariants of the banks.
        # Bitwise determinism is pinned by test_replicated_batch_bitwise
        # (one program, replicated inputs).
        for name in ("last_q", "last_t", "prev_q", "prev_t", "last_affine",
                     "rmse_last0", "kf_rmse", "min_distance"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name), np.float64),
                np.asarray(getattr(solo_state, name), np.float64),
                rtol=2e-2, atol=2e-2, err_msg=name)
        for name in ("t_lin_q", "t_lin_t", "affine0", "eps"):
            np.testing.assert_allclose(
                np.asarray(getattr(got.window, name), np.float64),
                np.asarray(getattr(solo_state.window, name), np.float64),
                rtol=2e-2, atol=2e-2, err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(got.window.frame_valid),
            np.asarray(solo_state.window.frame_valid))
        n_got = int(np.asarray(got.window.lm_valid).sum())
        n_want = int(np.asarray(solo_state.window.lm_valid).sum())
        assert abs(n_got - n_want) <= max(8, n_want // 20), (n_got, n_want)
        np.testing.assert_allclose(
            np.asarray(diag.pose_t[b]), np.asarray(solo_diag.pose_t),
            rtol=0, atol=1e-5)


def _rmse_vs_gt(seq, tracker):
    by_ts = {float(seq.timestamps[i]): np.asarray(seq.pose_t_wc(i).matrix())
             for i in range(NUM_FRAMES)}
    errs = [np.linalg.norm(mat[:3, 3] - by_ts[ts][:3, 3])
            for ts, mat in tracker.track.trajectory(tracker.window)
            if ts in by_ts]
    return float(np.sqrt(np.mean(np.square(errs))))


def test_tracking_quality_matches(runs):
    """Both runs track equally well vs ground truth (the operational claim
    that survives cross-compilation chaos — see module docstring)."""
    seqs, solo, batched = runs
    for seq, s, b in zip(seqs, solo, batched):
        ts = s.track.trajectory(s.window)
        tb = b.track.trajectory(b.window)
        assert len(ts) == len(tb)
        assert [t for t, _ in ts] == [t for t, _ in tb]
        rmse_s = _rmse_vs_gt(seq, s)
        rmse_b = _rmse_vs_gt(seq, b)
        # this fixture is deliberately harsh (window_max=4, 400 pts,
        # 120x160): solo runs measure 0.09-0.13 m — the claim is EQUAL
        # quality, not absolute accuracy (the e2e gate covers that)
        assert rmse_b < 0.2, f"batched run tracks poorly: {rmse_b:.4f} m"
        assert abs(rmse_b - rmse_s) < 5e-2


def test_marginalization_bookkeeping_matches(runs):
    # structural agreement: every keyframe ends up either marginalized or
    # in the live window, in both runs.  (WHICH tick marginalizes a given
    # frame can flip — the sparse strategy thresholds sit on the same
    # chaotically-amplified values as the trajectory, see module docstring.)
    _, solo, batched = runs
    assert any(len(s.track.marginalized) > 0 for s in solo)

    def coverage(t):
        ids = {m.frame_id for m in t.track.marginalized}
        ids |= {int(i) for i in np.asarray(t.window.frame_id) if i >= 0}
        return ids

    last = NUM_FRAMES - 1
    for s, b in zip(solo, batched):
        # a final-tick keyframe flip (see test_keyframe_decisions_match)
        # may add the last frame id to one run's coverage
        assert coverage(s) - {last} == coverage(b) - {last}
        assert abs(len(s.track.marginalized) - len(b.track.marginalized)) <= 1
