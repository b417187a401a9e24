"""Exporter tests (pydsopp utils analog)."""

import json

import numpy as np

from dsopp_tpu.output.exporters import (
    export_colmap,
    export_json,
    export_nerf_transforms,
    export_ply,
    export_xyz,
)


def _track_data(n_kf=2, n_lm=20, seed=0):
    rng = np.random.default_rng(seed)
    keyframes = []
    for i in range(n_kf):
        t = np.eye(4)
        t[:3, 3] = rng.normal(0, 1, 3)
        keyframes.append({
            "frame_id": i, "timestamp": 0.1 * i, "t_wc": t,
            "affine": np.zeros(2), "exposure": 1.0,
            "lm_uv": rng.uniform(0, 100, (n_lm, 2)),
            "lm_idepth": rng.uniform(0.2, 1.0, n_lm),
            "lm_valid": np.ones(n_lm, bool),
        })
    return {
        "meta": {"camera": {"fx": 100.0, "fy": 100.0, "cx": 50.0, "cy": 50.0,
                            "width": 100, "height": 100}},
        "keyframes": keyframes,
        "attached": [],
    }


def test_json_export(tmp_path):
    data = _track_data()
    path = tmp_path / "track.json"
    export_json(data, path)
    loaded = json.loads(path.read_text())
    assert len(loaded["keyframes"]) == 2
    assert len(loaded["keyframes"][0]["landmarks"]) == 20


def test_xyz_and_ply(tmp_path):
    data = _track_data()
    n1 = export_xyz(data, tmp_path / "cloud.xyz")
    n2 = export_ply(data, tmp_path / "cloud.ply")
    assert n1 == n2 == 40
    pts = np.loadtxt(tmp_path / "cloud.xyz")
    assert pts.shape == (40, 3)
    header = (tmp_path / "cloud.ply").read_text().splitlines()
    assert header[0] == "ply" and "element vertex 40" in header[2]


def test_colmap(tmp_path):
    data = _track_data()
    n = export_colmap(data, str(tmp_path / "sparse"))
    assert n == 40
    images = (tmp_path / "sparse" / "images.txt").read_text()
    assert "1 " in images and "0.png" in images
    cams = (tmp_path / "sparse" / "cameras.txt").read_text()
    assert "PINHOLE 100 100 100.0 100.0 50.0 50.0" in cams


def test_nerf_transforms(tmp_path):
    data = _track_data()
    n = export_nerf_transforms(data, tmp_path / "transforms.json")
    assert n == 2
    t = json.loads((tmp_path / "transforms.json").read_text())
    assert t["fl_x"] == 100.0 and len(t["frames"]) == 2
    # y/z flipped vs OpenCV
    m = np.asarray(t["frames"][0]["transform_matrix"])
    assert m[1, 1] == -1.0 and m[2, 2] == -1.0
