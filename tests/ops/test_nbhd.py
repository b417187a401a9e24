"""Neighborhood-packed sampling vs the corner-packed oracle."""

import numpy as np

import jax.numpy as jnp

from dsopp_tpu.core.pattern import PATTERN_CENTER, shift_pattern
from dsopp_tpu.ops import (
    pack_corners,
    pack_neighborhood,
    sample_nbhd,
    sample_packed_intensity,
)

H, W = 48, 64


def _map():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.uniform(0, 255, (H, W)))


def test_matches_packed_oracle_on_pattern_groups():
    img = _map()
    nb = pack_neighborhood(img)
    packed_i = pack_corners(img[None])[:, :]  # [HW, 4] (C=1)
    rng = np.random.default_rng(5)
    centers = jnp.asarray(rng.uniform((4, 4), (W - 5, H - 5), (200, 2)))
    uv = shift_pattern(centers)                      # [200, P, 2]
    # moderate subpixel jitter per pattern point (warp-like)
    uv = uv + jnp.asarray(rng.uniform(-0.45, 0.45, uv.shape))

    got, ok_got = sample_nbhd(nb, uv, uv[..., PATTERN_CENTER, :], H, W)
    want, ok_want = sample_packed_intensity(packed_i, uv, H, W)
    assert bool(jnp.all(ok_got))
    np.testing.assert_array_equal(np.asarray(ok_want), np.asarray(ok_got))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-9)


def test_out_of_window_points_invalid():
    img = _map()
    nb = pack_neighborhood(img)
    center = jnp.asarray([[20.0, 20.0]])
    # one point 10 px from its group's window
    uv = jnp.asarray([[[20.0, 20.0], [30.0, 20.0]]])
    vals, ok = sample_nbhd(nb, uv, center[0], H, W)
    assert bool(ok[0, 0])
    assert not bool(ok[0, 1])


def test_image_border_clamping():
    img = _map()
    nb = pack_neighborhood(img)
    packed_i = pack_corners(img[None])[:, :]
    # groups hugging every border
    centers = jnp.asarray([[1.2, 1.3], [W - 2.2, 1.1],
                           [1.4, H - 2.3], [W - 2.5, H - 2.5]])
    uv = shift_pattern(centers)
    got, ok_got = sample_nbhd(nb, uv, uv[..., PATTERN_CENTER, :], H, W)
    want, ok_want = sample_packed_intensity(packed_i, uv, H, W)
    match = np.asarray(ok_got)
    # wherever both consider the point valid, values agree exactly
    np.testing.assert_allclose(np.asarray(got)[match],
                               np.asarray(want)[match], rtol=0, atol=1e-9)
    # nbhd validity is a subset of plain validity (window restriction)
    assert not np.any(match & ~np.asarray(ok_want))
