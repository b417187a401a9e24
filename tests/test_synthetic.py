"""Sanity checks for the synthetic GT fixture: rendering must be
photometrically and geometrically self-consistent, because every solver test
builds on it (parity model: reference SolverTestData on track30seconds)."""

import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.interpolate import build_pixel_map, sample
from dsopp_tpu.core.reproject import reproject
from dsopp_tpu.testing import render_sequence


def test_sequence_shapes_and_ranges():
    seq = render_sequence(num_frames=6, height=120, width=160)
    assert seq.images.shape == (6, 120, 160)
    assert seq.depths.shape == (6, 120, 160)
    assert np.all(np.isfinite(seq.depths)) and np.all(seq.depths > 0.1)
    assert 40 < seq.images.mean() < 220
    # texture must have usable gradient energy for direct tracking
    gx = np.abs(np.diff(seq.images[0], axis=1))
    assert np.percentile(gx, 75) > 1.0


def test_cross_frame_photometric_consistency():
    """Warping frame i pixels into frame j with GT depth + GT poses must
    reproduce frame j intensities (up to interpolation error)."""
    seq = render_sequence(num_frames=8, height=120, width=160)
    i, j = 0, 5
    h, w = 120, 160
    ys, xs = np.meshgrid(np.arange(10, h - 10, 2), np.arange(10, w - 10, 2), indexing="ij")
    uv = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), dtype=jnp.float64)
    idep = jnp.asarray(seq.idepths[i][ys, xs].reshape(-1))
    rp = reproject(seq.camera, seq.camera, uv, idep, seq.t_target_ref(j, i))
    pm = build_pixel_map(jnp.asarray(seq.images[j]))
    vals, inside = sample(pm, rp.uv)
    ref = seq.images[i][ys, xs].reshape(-1)
    m = np.asarray(rp.valid) & np.asarray(inside)
    assert m.sum() > 1000
    err = np.abs(np.asarray(vals[:, 0]) - ref)[m]
    assert np.median(err) < 1.5, f"median warp error {np.median(err)}"


def test_depth_consistency_across_frames():
    """GT depth warped to another frame must match that frame's GT depth."""
    seq = render_sequence(num_frames=8, height=120, width=160)
    i, j = 1, 6
    ys, xs = np.meshgrid(np.arange(20, 100, 5), np.arange(20, 140, 5), indexing="ij")
    uv = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), dtype=jnp.float64)
    idep = jnp.asarray(seq.idepths[i][ys, xs].reshape(-1))
    rp = reproject(seq.camera, seq.camera, uv, idep, seq.t_target_ref(j, i))
    m = np.asarray(rp.valid)
    uvj = np.asarray(rp.uv)[m]
    idj_expected = seq.idepths[j][
        np.round(uvj[:, 1]).astype(int), np.round(uvj[:, 0]).astype(int)
    ]
    rel = np.abs(np.asarray(rp.idepth)[m] - idj_expected) / idj_expected
    # away from plane boundaries the match is exact; allow boundary outliers
    assert np.median(rel) < 0.02


def test_determinism():
    a = render_sequence(num_frames=3, height=60, width=80, cache=False)
    b = render_sequence(num_frames=3, height=60, width=80, cache=False)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.depths, b.depths)
