"""Offline viewer parity (viewer_main + visualizer rendering)."""

import math

import numpy as np

from dsopp_tpu.app.viewer import (
    _landmark_points,
    _trajectory,
    render_cloud,
    render_track,
)


def _fake_track(n_kf=4, n_lm=50):
    rng = np.random.default_rng(0)
    kfs = []
    for i in range(n_kf):
        t_wc = np.eye(4)
        t_wc[:3, 3] = [0.1 * i, 0.0, 0.5 * i]
        pts = []
        for _ in range(n_lm):
            d = rng.normal(size=3)
            d = d / np.linalg.norm(d)
            d = np.abs(d) + [0, 0, 0.5]     # in front of camera
            pts.append({"direction": tuple(d / np.linalg.norm(d)),
                        "idepth": float(rng.uniform(0.2, 2.0)),
                        "uv": (0.0, 0.0), "baseline": 0.0, "variance": 0.0})
        kfs.append({"t_world_agent": t_wc,
                    "landmarks": [{"sensor_id": 0, "points": pts}]})
    return {"keyframes": kfs}


def test_landmark_points_and_trajectory():
    track = _fake_track()
    pts = _landmark_points(track)
    assert pts.shape == (200, 3)
    traj = _trajectory(track)
    assert traj.shape == (4, 3)
    np.testing.assert_allclose(traj[-1], [0.3, 0.0, 1.5])


def test_render_cloud_draws_points_and_trajectory():
    track = _fake_track()
    img = render_cloud(_landmark_points(track), _trajectory(track),
                       width=320, height=240)
    assert img.shape == (240, 320, 3)
    # some colored landmark pixels and some green trajectory pixels
    colored = (img != 0).any(axis=-1).sum()
    assert colored > 100
    green = ((img[..., 1] == 255) & (img[..., 0] == 0)).sum()
    assert green > 0


def test_render_empty_track():
    img = render_cloud(np.zeros((0, 3)), np.zeros((0, 3)), 64, 48)
    assert img.shape == (48, 64, 3) and (img == 0).all()


def test_render_track_writes_files(tmp_path):
    track = _fake_track()
    paths = render_track(track, str(tmp_path / "view"), frames=2,
                         width=160, height=120)
    assert len(paths) == 2
    import os
    for p in paths:
        assert os.path.exists(p) or os.path.exists(p + ".npy")


def test_viewer_cli_on_saved_track(tmp_path):
    """End-to-end: save a track.bin, view it through the CLI entry."""
    from dsopp_tpu.app.viewer import main
    from dsopp_tpu.output.protobuf_track import save_track_bin
    from dsopp_tpu.track.state import MarginalizedKeyframe, OdometryTrack

    track = OdometryTrack()
    n = 20
    rng = np.random.default_rng(1)
    for i in range(3):
        t_wc = np.eye(4)
        t_wc[:3, 3] = [0, 0, 0.3 * i]
        track.on_marginalize(MarginalizedKeyframe(
            frame_id=i, timestamp=float(i), t_wc=t_wc,
            affine=np.zeros(2), exposure=1.0,
            lm_uv=rng.uniform(4, 60, (n, 2)),
            lm_idepth=rng.uniform(0.2, 2.0, n),
            lm_valid=np.ones(n, bool), lm_outlier=np.zeros(n, bool),
            lm_baseline=np.zeros(n)))

    class Cam:
        fx = fy = 50.0
        cx, cy = 32.0, 32.0

    bin_path = tmp_path / "track.bin"
    save_track_bin(bin_path, track, camera=Cam())
    rc = main(["--track", str(bin_path),
               "--output_dir", str(tmp_path / "view"),
               "--frames", "1", "--image_size", "160", "120"])
    assert rc == 0
    import os
    files = os.listdir(tmp_path / "view")
    assert any(f.startswith("view_0000") for f in files)
