"""Parity: fully device-resident loop vs the host-orchestrated tracker.

Both run the identical kernels; the device loop moves the keyframe decision,
marginalization policy, and P-controller on device under ``lax.cond``.  From
the same initialization the two must produce the same keyframe decisions and
(near-bitwise on the f64 CPU oracle) the same trajectory and bookkeeping.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.device_loop import PipelinedTracker
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

NUM_FRAMES = 26
INIT_FRAMES = 6
H, W = 120, 160

CFG = TrackerConfig(
    num_frame_slots=7,
    landmarks_per_frame=128,
    immature_per_frame=256,
    desired_points=600,
    frontend_points=800,
    keyframe_factor=3.0,
    window_min=3,
    window_max=5,
    use_rotation_perturbations=False,
)


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
def both_runs():
    seq = render_sequence(num_frames=NUM_FRAMES, height=H, width=W)

    host = _make_tracker(seq)
    host_out = []
    for i in range(INIT_FRAMES, NUM_FRAMES):
        out = host.tick(i, float(seq.timestamps[i]), seq.images[i])
        host_out.append(out)

    dev_base = _make_tracker(seq)
    pipe = PipelinedTracker(dev_base, flush_every=5)
    for i in range(INIT_FRAMES, NUM_FRAMES):
        pipe.tick(i, float(seq.timestamps[i]), seq.images[i])
    pipe.finalize()
    return seq, host, host_out, dev_base, pipe


def test_keyframe_decisions_match(both_runs):
    _, host, host_out, dev, pipe = both_runs
    host_kf = sorted(host.track.keyframe_timestamps)
    dev_kf = sorted(dev.track.keyframe_timestamps)
    assert host_kf == dev_kf, f"keyframe ids differ: {host_kf} vs {dev_kf}"
    assert host.num_keyframes == dev.num_keyframes
    assert any(out["keyframe"] for out in host_out), "test run made no keyframes"


def test_trajectory_matches(both_runs):
    _, host, _, dev, _ = both_runs
    # final window states agree
    hp = host.window.poses()
    dp = dev.window.poses()
    np.testing.assert_array_equal(np.asarray(host.window.frame_id),
                                  np.asarray(dev.window.frame_id))
    np.testing.assert_allclose(np.asarray(dp.t), np.asarray(hp.t),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dp.q), np.asarray(hp.q),
                               rtol=0, atol=1e-8)
    # last tracked pose agrees
    np.testing.assert_allclose(np.asarray(dev.t_w_last.t),
                               np.asarray(host.t_w_last.t), atol=1e-8)


def test_bookkeeping_matches(both_runs):
    _, host, _, dev, pipe = both_runs
    assert len(host.track.marginalized) == len(dev.track.marginalized)
    for h, d in zip(host.track.marginalized, dev.track.marginalized):
        assert h.frame_id == d.frame_id
        np.testing.assert_allclose(d.t_wc, h.t_wc, atol=1e-8)
        np.testing.assert_array_equal(d.lm_valid, h.lm_valid)
    h_attached = {k: len(v) for k, v in host.track.attached.items()}
    d_attached = {k: len(v) for k, v in dev.track.attached.items()}
    assert h_attached == d_attached
    # attach matrices agree
    for k in h_attached:
        for ha, da in zip(host.track.attached[k], dev.track.attached[k]):
            assert ha.frame_id == da.frame_id
            np.testing.assert_allclose(da.t_keyframe_frame,
                                       ha.t_keyframe_frame, atol=1e-8)


def test_controller_state_matches(both_runs):
    _, host, _, dev, _ = both_runs
    assert abs(host.activator.min_distance_to_neighbor
               - dev.activator.min_distance_to_neighbor) < 1e-6
    assert abs(host.rmse_last[0] - dev.rmse_last[0]) < 1e-6 * max(
        1.0, abs(host.rmse_last[0]))
