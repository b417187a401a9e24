"""sample_packed over tile-padded rows == unpadded (channels=...)."""

import numpy as np

import jax.numpy as jnp

from dsopp_tpu.core.interpolate import build_pixel_map
from dsopp_tpu.ops import pack_corners, sample_packed


def test_padded_rows_match_unpadded():
    rng = np.random.default_rng(2)
    pm = build_pixel_map(jnp.asarray(rng.uniform(0, 255, (40, 48)),
                                     jnp.float64))
    packed = pack_corners(pm)
    padded = jnp.pad(packed, ((0, 0), (0, 128 - packed.shape[-1])))
    uv = jnp.asarray(rng.uniform(2, [45, 37], (100, 2)), jnp.float64)
    want, ok_w = sample_packed(packed, uv, 40, 48)
    got, ok_g = sample_packed(padded, uv, 40, 48, channels=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(ok_g), np.asarray(ok_w))
