"""Debug-imagery parity (monocular_tracker.cpp:323-374 debug views)."""

import numpy as np

from dsopp_tpu.output.debug_images import (
    KeyframeDepthDebug,
    debug_current_frame,
    _jet,
)


def test_mask_overlay_tints_invalid_region():
    img = np.full((10, 10), 100.0)
    mask = np.ones((10, 10), bool)
    mask[:5] = False
    out = debug_current_frame(img, mask)
    assert out.shape == (10, 10, 3)
    assert (out[:5, :, 2] > out[:5, :, 0]).all()      # red-tinted
    assert (out[5:, :, 2] == out[5:, :, 0]).all()     # untouched


def test_jet_extremes():
    cold = _jet(np.zeros(1))[0]
    hot = _jet(np.ones(1))[0]
    assert cold[0] > cold[2]   # blue end
    assert hot[2] > hot[0]     # red end


def test_idepth_colormap_stable_scale():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 32))
    idep = np.zeros((32, 32))
    wei = np.zeros((32, 32))
    idep[8, 8] = 0.5
    wei[8, 8] = 1.0
    idep[20, 20] = 2.0
    wei[20, 20] = 1.0

    dbg = KeyframeDepthDebug(radius=1)
    out1 = dbg.render(img, idep, wei)
    scale1 = dbg.visualization_maximum_idepth
    out2 = dbg.render(img, idep, wei)
    scale2 = dbg.visualization_maximum_idepth
    assert out1.shape == (32, 32, 3)
    # colored dots actually drawn
    assert (out1[8, 8] != out1[0, 0]).any()
    # exponential smoothing keeps the scale stable
    assert abs(scale2 - scale1) < 0.2 * scale1
    # far point (higher idepth) is warmer than near point
    assert out1[20, 20, 2] >= out1[8, 8, 2]
