"""Pixel-map sampling tests (parity model: reference pixel_map tests, test_dxdy_accelerated.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.interpolate import (
    build_pixel_map,
    image_gradients,
    sample,
    sample_intensity,
)


def _random_image(key, h=48, w=64):
    return jax.random.uniform(key, (h, w), dtype=jnp.float64) * 255.0


def test_gradients_match_numpy_reference():
    img = np.asarray(_random_image(jax.random.PRNGKey(0)))
    dx, dy = image_gradients(jnp.asarray(img))
    # interior: central differences / 2
    np.testing.assert_allclose(
        np.asarray(dx)[:, 1:-1], 0.5 * (img[:, 2:] - img[:, :-2]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(dy)[1:-1, :], 0.5 * (img[2:, :] - img[:-2, :]), atol=1e-12
    )
    # borders: one-sided, undivided
    np.testing.assert_allclose(np.asarray(dx)[:, 0], img[:, 1] - img[:, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(dy)[-1, :], img[-1, :] - img[-2, :], atol=1e-12)


def test_sample_at_integer_pixels_is_exact():
    img = _random_image(jax.random.PRNGKey(1))
    pm = build_pixel_map(img)
    ys, xs = jnp.meshgrid(jnp.arange(5, 40, 7), jnp.arange(5, 60, 11), indexing="ij")
    uv = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float64)
    out, inside = sample(pm, uv)
    np.testing.assert_allclose(
        out[:, 0], img[uv[:, 1].astype(int), uv[:, 0].astype(int)], atol=1e-12
    )
    assert bool(jnp.all(inside))


def test_sample_linear_function_is_exact():
    """Bilinear interpolation reproduces affine images exactly."""
    h, w = 32, 40
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float64),
                          jnp.arange(w, dtype=jnp.float64), indexing="ij")
    img = 3.0 * xx - 2.0 * yy + 7.0
    uv = jax.random.uniform(
        jax.random.PRNGKey(2), (256, 2),
        minval=jnp.array([1.0, 1.0]), maxval=jnp.array([w - 2.0, h - 2.0]),
        dtype=jnp.float64,
    )
    vals, _ = sample_intensity(img, uv)
    expected = 3.0 * uv[:, 0] - 2.0 * uv[:, 1] + 7.0
    np.testing.assert_allclose(vals, expected, atol=1e-10)


def test_interpolated_gradient_channels_match_manual():
    img = _random_image(jax.random.PRNGKey(3))
    pm = build_pixel_map(img)
    dx, dy = image_gradients(img)
    uv = jnp.array([[10.3, 20.7], [33.9, 5.1]], dtype=jnp.float64)
    out, _ = sample(pm, uv)
    vdx, _ = sample_intensity(dx, uv)
    vdy, _ = sample_intensity(dy, uv)
    np.testing.assert_allclose(out[:, 1], vdx, atol=1e-12)
    np.testing.assert_allclose(out[:, 2], vdy, atol=1e-12)


def test_outside_mask():
    img = _random_image(jax.random.PRNGKey(4))
    pm = build_pixel_map(img)
    uv = jnp.array([[-1.0, 5.0], [5.0, 100.0], [62.5, 46.5]], dtype=jnp.float64)
    _, inside = sample(pm, uv)
    assert list(np.asarray(inside)) == [False, False, True]
