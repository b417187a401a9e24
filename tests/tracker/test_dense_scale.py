"""Dense operating point: 5000 points / W=15 window (dense.yaml-class).

Reference: /root/reference/test/test_data/tummono/dense.yaml — the
reference's stress configuration (5000 active points, window 15).  The
scale-sensitive banks are the FEJ cache [K,K,N,P,2,6]x2 and the residual
status tensor [K,K,N]: with K=17 slots and N=340 landmarks/slot these are
the memory cliffs the fixed-shape design must absorb.  This test runs the
full device-loop pipeline at those window/point counts (resolution reduced
to 320x240 to keep CPU suite time sane — the resolution-dependent maps bank
is exercised at VGA by bench.py on the real chip), and gates that the
trajectory holds and the window actually overflows into marginalization.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.device_loop import PipelinedTracker
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

NUM_FRAMES = 104     # natural ~1-in-4 keyframe rate → >16 KFs → W=15 overflow
INIT_FRAMES = 8
H, W = 240, 320

CFG = TrackerConfig(
    num_frame_slots=17,        # window_max + 2
    landmarks_per_frame=340,   # 340 x 15 ≈ 5000 active points
    immature_per_frame=1000,
    desired_points=5000,
    frontend_points=5000,
    keyframe_factor=3.0,
    window_min=5,
    window_max=15,
    use_rotation_perturbations=False,
)


@pytest.mark.slow
def test_dense_operating_point_end_to_end():
    seq = render_sequence(num_frames=NUM_FRAMES, height=H, width=W, seed=9,
                          advance=0.07)
    tracker = MonocularTracker(seq.camera, CFG, dtype=jnp.float64)
    tracker.initialize([
        (i, float(seq.timestamps[i]), seq.images[i],
         SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
             jnp.asarray(seq.pose_t_wc(i).t, jnp.float64)))
        for i in range(INIT_FRAMES)
    ])
    pipe = PipelinedTracker(tracker, flush_every=16)
    # natural keyframe cadence (keyframe_factor=3.0 → dense keyframes like
    # the e2e test, so the 15-KF window overflows in-run).  No synthetic
    # exposure gain: the reference-strength affine priors (1e12/1e8) pin
    # (a, b) — gained frames without dataset exposure times are
    # out-of-model (see test_ledger_drift_tracker.py)
    for i in range(INIT_FRAMES, NUM_FRAMES):
        pipe.tick(i, float(seq.timestamps[i]),
                  jnp.asarray(seq.images[i], jnp.float64))
    tracker = pipe.finalize()

    # the dense window filled and overflowed into marginalization
    assert tracker.num_keyframes >= 16, tracker.num_keyframes
    assert len(tracker.track.marginalized) >= 1, "W=15 window never overflowed"
    assert float(jnp.abs(tracker.window.h_marg).max()) > 0

    # active point population at dense scale.  At 320x240 the activation
    # P-controller's minimum-spacing floor caps real density below the
    # VGA-scale 5000 (76k pixels / min-distance ≈ 2k); the bank CAPACITY
    # (K=17 x N=340) and the W=15 solver are what this test stresses —
    # bench.py exercises the resolution-dependent banks at VGA on chip.
    n_active = int(jnp.sum(tracker.window.lm_valid & ~tracker.window.lm_outlier))
    assert n_active > 1000, f"only {n_active} active landmarks at dense point"

    # trajectory holds under exposure variation: final pose error vs GT
    traj = {round(t, 6): np.asarray(m)[:3, 3]
            for t, m in tracker.track.trajectory(tracker.window)}
    errs = []
    for i in range(INIT_FRAMES, NUM_FRAMES):
        t = round(float(seq.timestamps[i]), 6)
        if t in traj:
            errs.append(np.linalg.norm(traj[t] - np.asarray(
                seq.pose_t_wc(i).t, np.float64)))
    errs = np.asarray(errs)
    assert len(errs) >= NUM_FRAMES - INIT_FRAMES - 2
    rmse = float(np.sqrt((errs ** 2).mean()))
    # ~1.3% of the ~6 m path (the 40-frame e2e gate is 3e-2 over 2.5 m;
    # monocular scale drift grows with path length)
    assert rmse < 8e-2, f"dense-config trajectory RMSE {rmse:.4f} m"
