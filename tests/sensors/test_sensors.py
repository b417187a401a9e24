"""Sensors layer tests (parity model: reference provider/calibration/mask tests)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dsopp_tpu.sensors import (
    Camera,
    CameraSettings,
    ImageFolderProvider,
    load_calibration,
    load_photometric_calibration,
)
from dsopp_tpu.sensors.masks import filter_semantic_objects, load_mask, mask_pyramid
from dsopp_tpu.sensors.photometric import correct_image
from dsopp_tpu.sensors.undistorter import build_remaps


@pytest.fixture
def dataset(tmp_path):
    import cv2

    folder = tmp_path / "images"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        img = (rng.uniform(0, 255, (48, 64))).astype(np.uint8)
        cv2.imwrite(str(folder / f"{i}.png"), img)
    times = tmp_path / "times.txt"
    times.write_text("".join(f"{i} {0.1 * i:.3f} {1.0 + 0.1*i}\n" for i in range(5)))
    calib = tmp_path / "calib.txt"
    calib.write_text("pinhole\n64 48\n40 40 32 24\n")
    pcalib = tmp_path / "pcalib.txt"
    pcalib.write_text(" ".join(str(v * 0.9) for v in range(256)))
    return tmp_path


def test_image_folder_provider(dataset):
    p = ImageFolderProvider(str(dataset / "images"), str(dataset / "times.txt"))
    frames = []
    while (f := p.next_frame()) is not None:
        frames.append(f)
    assert [f.frame_id for f in frames] == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(frames[2].timestamp, 0.2)
    np.testing.assert_allclose(frames[3].exposure, 1.3)
    assert frames[0].image.shape == (48, 64)
    assert frames[0].image.dtype == np.float32


def test_provider_start_frame(dataset):
    p = ImageFolderProvider(str(dataset / "images"), str(dataset / "times.txt"),
                            start_frame=3)
    assert p.next_frame().frame_id == 3


def test_calibration_parsing(dataset):
    calib = load_calibration(str(dataset / "calib.txt"))
    assert calib.model_type == "pinhole"
    assert calib.image_size == (64.0, 48.0)
    model = calib.camera_model(0, jnp.float64)
    uv, valid = model.project(jnp.array([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(uv, [32.0, 24.0])
    # pyramid level models scale
    m1 = calib.camera_model(1, jnp.float64)
    assert float(m1.fx) == 20.0


def test_simple_radial_calibration(tmp_path):
    calib_file = tmp_path / "calib.txt"
    calib_file.write_text("simple_radial\n640 480\n300 320 240 -0.05 0.004\n")
    calib = load_calibration(str(calib_file))
    assert calib.model_type == "simple_radial"
    m = calib.camera_model(0, jnp.float64)
    assert float(m.k1) == -0.05


def test_photometric_lut(dataset):
    lut = load_photometric_calibration(str(dataset / "pcalib.txt"))
    assert lut.shape == (256,)
    img = jnp.asarray([[0.0, 100.0, 255.0]])
    out = correct_image(img, jnp.asarray(lut))
    np.testing.assert_allclose(out, [[0.0, 90.0, 229.5]], atol=1e-4)


def test_photometric_default_identity():
    lut = load_photometric_calibration(None)
    img = jnp.asarray([[13.5, 200.0]])
    out = correct_image(img, jnp.asarray(lut))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_camera_pipeline(dataset):
    cam = Camera.from_config(
        "camera_1",
        {
            "provider": {"type": "image_folder", "folder": "images",
                         "timestamps": "times.txt"},
            "model": {"calibration": "calib.txt",
                      "photometric_calibration": "pcalib.txt"},
        },
        base_dir=str(dataset),
    )
    frame = cam.next_frame()
    assert frame is not None
    assert np.asarray(frame.image).shape == (48, 64)
    model = cam.camera_model()
    assert float(model.fx) == 40.0


def test_mask_pyramid():
    mask = jnp.ones((16, 16), bool).at[:8, :8].set(False)
    pyr = mask_pyramid(mask, 3)
    assert pyr[1].shape == (8, 8)
    assert not bool(pyr[1][0, 0]) and bool(pyr[1][7, 7])
    assert not bool(pyr[2][1, 1]) and bool(pyr[2][3, 3])


def test_semantic_filter():
    mask = jnp.ones((4, 4), bool)
    sem = jnp.zeros((4, 4), jnp.int32).at[1, 1].set(7).at[2, 2].set(9)
    out = filter_semantic_objects(mask, sem, [7])
    assert not bool(out[1, 1]) and bool(out[2, 2])


def test_undistorter_rectifies_radial():
    """Remapped distorted render must match the pinhole render."""
    from dsopp_tpu.core.camera import Pinhole, SimpleRadial

    w, h = 128, 96
    radial = SimpleRadial.create((float(w), float(h)), 80.0, (w / 2, h / 2),
                                 -0.15, 0.0, jnp.float64)
    und = build_remaps(radial)
    pin = und.target_model

    # render a scene (plane z=4, smooth texture) through both models
    def render(model):
        ys, xs = np.meshgrid(np.arange(h, dtype=float), np.arange(w, dtype=float),
                             indexing="ij")
        rays = np.asarray(model.unproject(jnp.asarray(np.stack([xs, ys], -1))))
        p = rays / rays[..., 2:3] * 4.0
        return np.sin(p[..., 0] * 2.0) * np.cos(p[..., 1] * 1.5) * 100 + 128

    img_radial = render(radial).astype(np.float32)
    img_pin_expected = render(pin)
    rectified = und.undistort(img_radial)
    center = np.s_[20:-20, 20:-20]
    err = np.abs(rectified[center] - img_pin_expected[center])
    assert np.median(err) < 2.0, np.median(err)
