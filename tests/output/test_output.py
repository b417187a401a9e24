"""Output layer tests: TUM I/O, ATE metric, track storage round-trip.

Parity model: reference test_track_storage.cpp round-trip and the TUM
evaluation scripts.
"""

import numpy as np

import jax.numpy as jnp

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.output.ate import absolute_trajectory_error, align_trajectories
from dsopp_tpu.output.storage import load_track, point_cloud, save_track
from dsopp_tpu.output.tum import export_tum, load_tum
from dsopp_tpu.track.state import AttachedFrame, MarginalizedKeyframe, OdometryTrack


def _random_trajectory(n=20, seed=0):
    rng = np.random.default_rng(seed)
    entries = []
    for i in range(n):
        xi = jnp.asarray(rng.normal(0, 0.3, 6), jnp.float64)
        entries.append((0.1 * i, np.asarray(SE3.exp(xi).matrix())))
    return entries


def test_tum_roundtrip(tmp_path):
    entries = _random_trajectory()
    path = tmp_path / "traj.tum"
    export_tum(path, entries)
    loaded = load_tum(path)
    assert len(loaded) == len(entries)
    for (t0, m0), (t1, m1) in zip(entries, loaded):
        assert abs(t0 - t1) < 1e-6
        np.testing.assert_allclose(m0, m1, atol=1e-7)


def test_ate_identical_trajectories_zero(tmp_path):
    entries = _random_trajectory()
    stats = absolute_trajectory_error(entries, entries)
    assert stats["rmse"] < 1e-12
    assert stats["matched"] == len(entries)


def test_ate_alignment_removes_rigid_offset():
    gt = _random_trajectory(30, seed=1)
    offset = np.asarray(SE3.exp(jnp.asarray([1.0, -2.0, 0.5, 0.3, 0.2, -0.1],
                                            jnp.float64)).matrix())
    est = [(t, offset @ m) for t, m in gt]
    stats = absolute_trajectory_error(est, gt, align=True)
    assert stats["rmse"] < 1e-9


def test_ate_scale_alignment():
    gt = _random_trajectory(30, seed=2)
    est = []
    for t, m in gt:
        m2 = m.copy()
        m2[:3, 3] *= 1.25
        est.append((t, m2))
    stats = absolute_trajectory_error(est, gt, align=True, with_scale=True)
    assert stats["rmse"] < 1e-9
    stats_noscale = absolute_trajectory_error(est, gt, align=True, with_scale=False)
    assert stats_noscale["rmse"] > 0.01


def test_track_storage_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    track = OdometryTrack()
    track.on_keyframe(0, 0.0)
    kf = MarginalizedKeyframe(
        frame_id=0, timestamp=0.0,
        t_wc=np.asarray(SE3.exp(jnp.asarray(rng.normal(0, 0.1, 6))).matrix()),
        affine=np.asarray([0.01, -0.5]),
        exposure=1.2,
        lm_uv=rng.uniform(0, 100, (50, 2)).astype(np.float32),
        lm_idepth=rng.uniform(0.1, 1, 50).astype(np.float32),
        lm_valid=rng.uniform(size=50) > 0.3,
        lm_outlier=np.zeros(50, bool),
        lm_baseline=rng.uniform(0, 1, 50).astype(np.float32),
    )
    track.attached[0] = [AttachedFrame(1, 0.05, 0, np.eye(4))]
    track.on_marginalize(kf)

    path = str(tmp_path / "track.npz")
    save_track(path, track, camera_info={"fx": 100, "fy": 100, "cx": 50, "cy": 50})
    data = load_track(path)
    assert data["meta"]["num_keyframes"] == 1
    out = data["keyframes"][0]
    np.testing.assert_allclose(out["t_wc"], kf.t_wc, atol=1e-12)
    np.testing.assert_allclose(out["lm_idepth"], kf.lm_idepth, atol=1e-7)
    np.testing.assert_array_equal(out["lm_valid"], kf.lm_valid & ~kf.lm_outlier)
    assert data["attached"][0]["frame_id"] == 1

    cloud = point_cloud(data)
    assert cloud.shape[1] == 3 and len(cloud) == int(out["lm_valid"].sum())
