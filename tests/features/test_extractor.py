"""Candidate extractor tests (parity model: reference extractor count/spacing tests)."""

import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.interpolate import build_pixel_map
from dsopp_tpu.features import select_candidates
from dsopp_tpu.testing import render_sequence


def _frame_map():
    seq = render_sequence(num_frames=1, height=240, width=320)
    return build_pixel_map(jnp.asarray(seq.images[0]))


def test_count_and_validity():
    pm = _frame_map()
    cands = select_candidates(pm, 600)
    assert cands.uv.shape == (600, 2)
    frac = float(np.mean(np.asarray(cands.valid)))
    assert frac > 0.8, f"only {frac:.0%} valid on a fully textured frame"


def test_points_have_high_gradient():
    pm = _frame_map()
    cands = select_candidates(pm, 400)
    g2 = np.asarray(pm[1] ** 2 + pm[2] ** 2)
    sel = np.asarray(cands.uv[np.asarray(cands.valid)]).astype(int)
    sel_g2 = g2[sel[:, 1], sel[:, 0]]
    # selected points must be well above the median gradient energy
    assert np.median(sel_g2) > 4.0 * np.median(g2)


def test_spatial_spread():
    """Points cover the image, not one corner (the reference enforces spacing
    via per-window selection)."""
    pm = _frame_map()
    cands = select_candidates(pm, 500)
    sel = np.asarray(cands.uv[np.asarray(cands.valid)])
    h, w = 240, 320
    counts = np.histogram2d(sel[:, 1], sel[:, 0], bins=4, range=[[0, h], [0, w]])[0]
    assert counts.min() >= 5, f"quadrant coverage too uneven: {counts}"


def test_mask_respected():
    pm = _frame_map()
    mask = jnp.ones((240, 320), bool).at[:, :160].set(False)
    cands = select_candidates(pm, 300, mask=mask)
    sel = np.asarray(cands.uv[np.asarray(cands.valid)])
    assert np.all(sel[:, 0] >= 160)


def test_border_respected():
    pm = _frame_map()
    cands = select_candidates(pm, 500)
    sel = np.asarray(cands.uv[np.asarray(cands.valid)])
    assert sel[:, 0].min() >= 4 and sel[:, 1].min() >= 4
    assert sel[:, 0].max() < 316 and sel[:, 1].max() < 236


def test_textureless_image_yields_invalid_slots():
    flat = build_pixel_map(jnp.full((240, 320), 100.0))
    cands = select_candidates(flat, 200)
    assert not bool(np.any(np.asarray(cands.valid)))
