"""Checkpoint/resume test: a resumed tracker must continue identically."""

import jax.numpy as jnp
import numpy as np
import pytest

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.output.checkpoint import load_checkpoint, save_checkpoint
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig


def test_checkpoint_resume_continues_identically(tmp_path):
    seq = render_sequence(num_frames=24, height=120, width=160)
    cfg = TrackerConfig(landmarks_per_frame=128, immature_per_frame=256,
                        desired_points=600, frontend_points=800,
                        keyframe_factor=3.0, window_min=3, window_max=5,
                        use_rotation_perturbations=False)

    def bootstrap(tracker):
        for i in range(6):
            pose = SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
                       jnp.asarray(seq.pose_t_wc(i).t, jnp.float64))
            tracker.tick(i, float(seq.timestamps[i]), seq.images[i],
                         known_pose=pose, force_keyframe=(i == 5))

    # run A: straight through
    tr_a = MonocularTracker(seq.camera, cfg, dtype=jnp.float64)
    bootstrap(tr_a)
    poses_a = []
    for i in range(6, 24):
        out = tr_a.tick(i, float(seq.timestamps[i]), seq.images[i])
        poses_a.append(np.asarray(out["pose"].t))

    # run B: checkpoint at frame 14, resume in a fresh tracker
    tr_b = MonocularTracker(seq.camera, cfg, dtype=jnp.float64)
    bootstrap(tr_b)
    poses_b = []
    for i in range(6, 14):
        out = tr_b.tick(i, float(seq.timestamps[i]), seq.images[i])
        poses_b.append(np.asarray(out["pose"].t))

    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, tr_b)
    tr_c = load_checkpoint(ckpt, seq.camera, cfg, dtype=jnp.float64)
    assert tr_c.num_keyframes == tr_b.num_keyframes
    assert tr_c.window.frame_count() == tr_b.window.frame_count()

    for i in range(14, 24):
        out = tr_c.tick(i, float(seq.timestamps[i]), seq.images[i])
        poses_b.append(np.asarray(out["pose"].t))

    for i, (a, b) in enumerate(zip(poses_a, poses_b)):
        np.testing.assert_allclose(a, b, atol=1e-6,
                                   err_msg=f"divergence at frame {6 + i}")

    # history preserved through the round-trip
    traj_b = tr_c.track.trajectory(tr_c.window)
    traj_a = tr_a.track.trajectory(tr_a.window)
    assert len(traj_a) == len(traj_b)
