"""Pyramid tests (parity model: reference downscale/pixel-frame tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.features import build_pyramid, build_pyramid_maps
from dsopp_tpu.features.pyramid import downscale


def test_downscale_is_2x2_average():
    img = jax.random.uniform(jax.random.PRNGKey(0), (8, 12), dtype=jnp.float64)
    small = downscale(img)
    assert small.shape == (4, 6)
    expected = 0.25 * (img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2] + img[1::2, 1::2])
    np.testing.assert_allclose(small, expected, atol=1e-15)


def test_downscale_drops_odd_edge():
    img = jnp.ones((9, 13), dtype=jnp.float64)
    assert downscale(img).shape == (4, 6)


def test_pyramid_shapes_and_mean_preservation():
    img = jax.random.uniform(jax.random.PRNGKey(1), (64, 96), dtype=jnp.float64) * 255
    pyr = build_pyramid(img, 5)
    assert [p.shape for p in pyr] == [(64, 96), (32, 48), (16, 24), (8, 12), (4, 6)]
    for p in pyr:
        assert abs(float(p.mean()) - float(img.mean())) < 1.0


def test_pyramid_maps_channels():
    img = jax.random.uniform(jax.random.PRNGKey(2), (32, 32), dtype=jnp.float64)
    maps = build_pyramid_maps(img, 3)
    assert [m.shape for m in maps] == [(3, 32, 32), (3, 16, 16), (3, 8, 8)]
    np.testing.assert_allclose(maps[0][0], img, atol=1e-15)


def test_batched_pyramid():
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 48), dtype=jnp.float64)
    pyr = build_pyramid(imgs, 3)
    assert pyr[2].shape == (4, 8, 12)
