"""Parity: corner-packed sampler vs the reference XLA sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsopp_tpu.core.interpolate import build_pixel_map, sample
from dsopp_tpu.ops import pack_corners, sample_packed, sample_packed_intensity


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    h, w = 60, 80
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    pm = build_pixel_map(img)
    uv = jnp.asarray(
        np.stack(
            [rng.uniform(-3, w + 2, 4000), rng.uniform(-3, h + 2, 4000)], -1
        ),
        jnp.float32,
    )
    return pm, uv, h, w


def test_sample_packed_matches_reference(setup):
    pm, uv, h, w = setup
    ref_vals, ref_inside = sample(pm, uv)
    packed = pack_corners(pm)
    vals, inside = sample_packed(packed, uv, h, w)
    np.testing.assert_array_equal(np.asarray(inside), np.asarray(ref_inside))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=0, atol=1e-5)


def test_sample_packed_intensity_matches(setup):
    pm, uv, h, w = setup
    ref_vals, ref_inside = sample(pm, uv)
    packed = pack_corners(pm)
    packed_i = packed.reshape(h * w, 4, 3)[:, :, 0]
    vals, inside = sample_packed_intensity(packed_i, uv, h, w)
    np.testing.assert_array_equal(np.asarray(inside), np.asarray(ref_inside))
    # summation order differs (sum vs einsum) — f32 rounding only
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals[..., 0]), rtol=1e-6, atol=1e-4)


def test_sample_packed_batched_shapes(setup):
    pm, uv, h, w = setup
    packed = pack_corners(pm)
    uv_b = uv.reshape(10, 20, 20, 2)
    vals, inside = sample_packed(packed, uv_b, h, w)
    assert vals.shape == (10, 20, 20, 3)
    assert inside.shape == (10, 20, 20)
    ref_vals, _ = sample(pm, uv_b)
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=0, atol=1e-5)


def test_sample_packed_under_jit_and_grad(setup):
    pm, uv, h, w = setup
    packed = pack_corners(pm)

    @jax.jit
    def f(uv_):
        vals, _ = sample_packed(packed, uv_, h, w)
        return jnp.sum(vals)

    g = jax.grad(f)(uv[:16])
    assert np.all(np.isfinite(np.asarray(g)))


def test_pack_corners_layout(setup):
    pm, _, h, w = setup
    packed = pack_corners(pm)
    assert packed.shape == (h * w, 12)
    p = 5 * w + 7
    corners = np.asarray(packed[p].reshape(4, 3))
    pm_np = np.asarray(pm)
    np.testing.assert_array_equal(corners[0], pm_np[:, 5, 7])
    np.testing.assert_array_equal(corners[1], pm_np[:, 5, 8])
    np.testing.assert_array_equal(corners[2], pm_np[:, 6, 7])
    np.testing.assert_array_equal(corners[3], pm_np[:, 6, 8])
