"""Live HTTP viewer (the reference Visualizer's role, headless-ready).

Parity model: src/output/visualizer/.../visualizer.hpp:35 — semi-dense
cloud + trajectory + keyframe frusta rendered live while tracking, with
landmark-class toggles; here served over HTTP and smoke-driven with a real
tracked sequence (no display in this environment).
"""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.output.live_viewer import LiveViewer
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read()


def test_viewer_serves_live_state_from_a_tracked_run():
    seq = render_sequence(num_frames=22, height=96, width=128)
    cfg = TrackerConfig(
        num_frame_slots=6, landmarks_per_frame=64, immature_per_frame=128,
        desired_points=300, frontend_points=400, pyramid_levels=3,
        window_min=2, window_max=3, keyframe_factor=3.0,
        use_rotation_perturbations=False)
    tr = MonocularTracker(seq.camera, cfg, dtype=jnp.float64)
    viewer = LiveViewer(seq.camera, port=0)
    tr.track.observers.append(viewer)
    try:
        tr.initialize([
            (i, float(seq.timestamps[i]), seq.images[i],
             SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
                 jnp.asarray(seq.pose_t_wc(i).t, jnp.float64)))
            for i in range(5)])
        for i in range(5, 22):
            out = tr.tick(i, float(seq.timestamps[i]), seq.images[i])
            viewer.on_frame(type("F", (), {"frame_id": i})(), out)
        viewer.finish(tr)

        page = _get(viewer.port, "/").decode()
        assert "<canvas" in page and "state.json" in page
        assert "marginalized cloud" in page      # landmark-class toggle

        state = json.loads(_get(viewer.port, "/state.json"))
        assert state["frame_id"] == 21
        assert state["num_keyframes"] >= 3
        assert len(tr.track.marginalized) >= 1
        # the marginalized cloud carries [x, y, z, color] quads near the
        # rendered corridor geometry
        pts = np.asarray(state["points"]).reshape(-1, 4)
        assert len(pts) > 30
        assert np.isfinite(pts).all()
        assert len(state["traj"]) % 3 == 0 and len(state["traj"]) >= 3
        assert len(state["frusta"]) >= tr.window.frame_count()
        assert state["fps"] > 0
    finally:
        viewer.close()


def test_viewer_point_cap_rolls():
    viewer = LiveViewer(None, port=0)
    try:
        viewer.MAX_POINTS = 10
        viewer._points = list(range(4 * 10))
        kf = type("KF", (), {
            "t_wc": np.eye(4), "lm_uv": np.zeros((0, 2)),
            "lm_idepth": np.zeros(0), "lm_valid": np.zeros(0, bool),
            "lm_outlier": np.zeros(0, bool)})()
        viewer.on_marginalize(kf)
        assert len(viewer._points) <= 4 * viewer.MAX_POINTS
    finally:
        viewer.close()
