"""Determinism: two identical runs must produce identical trajectories.

SURVEY §5: the reference offers a --deterministic mode (thread capping);
JAX gives determinism by construction — this test pins it.
"""

import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig


def _run(seq, cfg):
    tracker = MonocularTracker(seq.camera, cfg, dtype=jnp.float64)
    for i in range(5):
        pose = SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
                   jnp.asarray(seq.pose_t_wc(i).t, jnp.float64))
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i],
                     known_pose=pose, force_keyframe=(i == 4))
    out = []
    for i in range(5, 16):
        r = tracker.tick(i, float(seq.timestamps[i]), seq.images[i])
        out.append(np.asarray(r["pose"].t))
    return np.stack(out)


def test_two_runs_bitwise_identical():
    seq = render_sequence(num_frames=16, height=120, width=160)
    cfg = TrackerConfig(landmarks_per_frame=96, immature_per_frame=192,
                        desired_points=400, frontend_points=512,
                        keyframe_factor=3.0, window_min=3, window_max=4,
                        use_rotation_perturbations=False)
    a = _run(seq, cfg)
    b = _run(seq, cfg)
    np.testing.assert_array_equal(a, b)
