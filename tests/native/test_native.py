"""Native C++ kernel tests: must match the JAX reference implementations."""

import numpy as np

import jax.numpy as jnp

from dsopp_tpu import native
from dsopp_tpu.core.interpolate import build_pixel_map
from dsopp_tpu.features.pyramid import build_pyramid_maps
from dsopp_tpu.sensors.photometric import correct_image


def test_native_available():
    assert native.available(), "C++ kernels failed to build/load"


def test_pixel_map_matches_jax():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    got = native.pixel_map(img)
    expected = np.asarray(build_pixel_map(jnp.asarray(img)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_pyramid_matches_jax():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    got = native.pyramid_pixel_maps(img, 4)
    expected = build_pyramid_maps(jnp.asarray(img), 4)
    assert len(got) == 4
    for g, e in zip(got, expected):
        np.testing.assert_allclose(g, np.asarray(e), atol=1e-3)


def test_photometric_matches_jax():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (32, 40)).astype(np.float32)
    lut = (np.arange(256, dtype=np.float32) ** 1.1) / (255 ** 0.1)
    vig = rng.uniform(0.5, 1.0, (32, 40)).astype(np.float32)
    got = native.photometric_correct(img, lut, vig)
    expected = np.asarray(correct_image(jnp.asarray(img), jnp.asarray(lut),
                                        jnp.asarray(vig)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-3)


def test_native_faster_or_equal_on_repeat():
    """Smoke perf check: native pyramid on 640x480 completes quickly."""
    import time

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    native.pyramid_pixel_maps(img, 5)  # warm
    t0 = time.time()
    for _ in range(10):
        native.pyramid_pixel_maps(img, 5)
    dt = (time.time() - t0) / 10
    assert dt < 0.05, f"native pyramid too slow: {dt*1000:.1f}ms"
