"""Reference-format track.bin round-trip tests.

Parity model: reference test/pydsopp/python_reader (C++ writes → Python
reads → compare at 1e-14).  The wire encoding was additionally validated
against the google.protobuf library with the reference .proto schema.
"""

import numpy as np

from dsopp_tpu.output.protobuf_track import load_track_bin, save_track_bin
from dsopp_tpu.track.state import AttachedFrame, MarginalizedKeyframe, OdometryTrack


def _rot(w):
    from dsopp_tpu.fbs.geometric_ba import _so3_exp

    return _so3_exp(np.asarray(w))


def _track(seed=0, n_kf=3, n_lm=40):
    rng = np.random.default_rng(seed)
    track = OdometryTrack()
    for i in range(n_kf):
        mat = np.eye(4)
        mat[:3, :3] = _rot(rng.normal(0, 0.2, 3))
        mat[:3, 3] = rng.normal(0, 1, 3)
        track.on_keyframe(i * 10, 0.5 * i)
        kf = MarginalizedKeyframe(
            frame_id=i * 10, timestamp=0.5 * i, t_wc=mat,
            affine=rng.normal(0, 0.1, 2), exposure=1.0 + 0.1 * i,
            lm_uv=rng.uniform(10, 300, (n_lm, 2)).astype(np.float32),
            lm_idepth=rng.uniform(0.1, 1.0, n_lm).astype(np.float32),
            lm_valid=rng.uniform(size=n_lm) > 0.2,
            lm_outlier=np.zeros(n_lm, bool),
            lm_baseline=rng.uniform(0, 1, n_lm).astype(np.float32),
        )
        amat = np.eye(4)
        amat[:3, 3] = rng.normal(0, 0.05, 3)
        track.attached[i * 10] = [AttachedFrame(i * 10 + 1, 0.5 * i + 0.1,
                                                i * 10, amat, exposure=1.1)]
        track.on_marginalize(kf)
    return track


class _FakeCam:
    fx, fy, cx, cy = 260.0, 260.0, 160.0, 120.0


def test_track_bin_roundtrip(tmp_path):
    track = _track()
    path = str(tmp_path / "track.bin")
    save_track_bin(path, track, camera=_FakeCam())
    data = load_track_bin(path)
    assert len(data["keyframes"]) == 3

    for i, kf in enumerate(data["keyframes"]):
        src = track.marginalized[i]
        assert kf["frame_id"] == src.frame_id
        assert abs(kf["timestamp"] - src.timestamp) < 1e-9
        np.testing.assert_allclose(kf["t_world_agent"], src.t_wc, atol=1e-12)
        np.testing.assert_allclose(kf["affine"], src.affine, atol=1e-12)
        assert abs(kf["exposure"] - src.exposure) < 1e-12
        pts = kf["landmarks"][0]["points"]
        valid = src.lm_valid & ~src.lm_outlier
        assert len(pts) == int(valid.sum())
        np.testing.assert_allclose(
            [p["uv"][0] for p in pts], src.lm_uv[valid][:, 0], atol=1e-6)
        np.testing.assert_allclose(
            [p["idepth"] for p in pts], src.lm_idepth[valid], atol=1e-7)
        att = kf["attached"][0]
        np.testing.assert_allclose(
            att["t_keyframe_agent"], track.marginalized[i].attached[0].t_keyframe_frame,
            atol=1e-12)


def test_track_bin_framing(tmp_path):
    """Framing matches the reference: u64 count + u32-prefixed messages +
    five trailing sections."""
    import struct

    track = _track(n_kf=2)
    path = str(tmp_path / "track.bin")
    save_track_bin(path, track, camera=_FakeCam())
    blob = open(path, "rb").read()
    n = struct.unpack_from("<Q", blob, 0)[0]
    assert n == 2
    off = 8
    for _ in range(n):
        size = struct.unpack_from("<I", blob, off)[0]
        off += 4 + size
    sections = 0
    while off < len(blob):
        size = struct.unpack_from("<I", blob, off)[0]
        off += 4 + size
        sections += 1
    assert sections == 5  # connections, gnss, ecef, sanity, agent settings
    assert off == len(blob)
