"""Epipolar depth estimation tests.

Parity model: reference test/test/tracker/test_depth_estimation.cpp and the
test_depth_estimation_accuracy harness — immature points traced over frames
with GT poses must converge to GT inverse depth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.interpolate import build_pixel_map, sample
from dsopp_tpu.core.pattern import shift_pattern
from dsopp_tpu.features import select_candidates
from dsopp_tpu.tracker.depth_estimation import (
    STATUS_GOOD,
    STATUS_OOB,
    STATUS_UNINITIALIZED,
    estimate_depths,
    make_immature_points,
)
from dsopp_tpu.testing import render_sequence


def _make_points(seq, frame=0, num=300):
    img = jnp.asarray(seq.images[frame])
    pm = build_pixel_map(img)
    cands = select_candidates(pm, num)
    pattern = shift_pattern(cands.uv)
    patches, _ = sample(pm, pattern)
    grad, _ = sample(pm, cands.uv)
    pts = make_immature_points(
        cands.uv, patches[..., 0], grad[..., 1:], dtype=jnp.float64
    )
    return pts._replace(valid=pts.valid & cands.valid), pm


def test_initial_state():
    seq = render_sequence(num_frames=8, height=240, width=320)
    pts, _ = _make_points(seq)
    assert bool(jnp.all(pts.status == STATUS_UNINITIALIZED))
    assert float(pts.idepth_min.min()) == 0.0


def test_interval_shrinks_and_contains_gt():
    seq = render_sequence(num_frames=8, height=240, width=320)
    pts, _ = _make_points(seq)
    cam64 = seq.camera

    for tgt in range(1, 6):
        tm = build_pixel_map(jnp.asarray(seq.images[tgt]))
        pts = estimate_depths(
            pts, tm, cam64, seq.t_target_ref(tgt, 0),
            jnp.zeros(2, jnp.float64), jnp.zeros(2, jnp.float64), 1.0,
        )

    good = np.asarray(pts.valid & (pts.status == STATUS_GOOD))
    assert good.sum() > 50, f"only {good.sum()} good points"

    uv = np.asarray(pts.uv)[good].astype(int)
    gt_idepth = seq.idepths[0][uv[:, 1], uv[:, 0]]
    est = np.asarray(pts.idepth)[good]
    lo = np.asarray(pts.idepth_min)[good]
    hi = np.asarray(pts.idepth_max)[good]

    rel_err = np.abs(est - gt_idepth) / gt_idepth
    assert np.median(rel_err) < 0.05, f"median rel idepth err {np.median(rel_err)}"
    # intervals must have shrunk dramatically from [0, 1000]
    assert np.median(hi - lo) < 0.2
    # and mostly contain GT (allow boundary-pixel outliers)
    contains = (gt_idepth > lo - 0.05) & (gt_idepth < hi + 0.05)
    assert contains.mean() > 0.8


def test_no_translation_skips():
    """Pure rotation gives no epipolar baseline — points must not become GOOD."""
    from dsopp_tpu.core.lie import SE3

    seq = render_sequence(num_frames=4, height=240, width=320)
    pts, _ = _make_points(seq)
    rot_only = SE3.exp(jnp.array([0, 0, 0, 0.01, 0.02, 0.005], jnp.float64))
    tm = build_pixel_map(jnp.asarray(seq.images[0]))
    out = estimate_depths(
        pts, tm, seq.camera, rot_only,
        jnp.zeros(2, jnp.float64), jnp.zeros(2, jnp.float64), 1.0,
    )
    good_frac = float(np.mean(np.asarray(out.status == STATUS_GOOD)[np.asarray(out.valid)]))
    assert good_frac < 0.05, f"{good_frac:.0%} became GOOD with no baseline"


def test_oob_when_points_leave_view():
    """Large forward-lateral motion pushes many points out of the target view."""
    from dsopp_tpu.core.lie import SE3

    seq = render_sequence(num_frames=4, height=240, width=320)
    pts, _ = _make_points(seq)
    big = SE3.exp(jnp.array([1.5, 0, 0.5, 0, 0.3, 0], jnp.float64))
    tm = build_pixel_map(jnp.asarray(seq.images[0]))
    out = estimate_depths(
        pts, tm, seq.camera, big,
        jnp.zeros(2, jnp.float64), jnp.zeros(2, jnp.float64), 1.0,
    )
    oob_frac = float(np.mean(np.asarray(out.status == STATUS_OOB)[np.asarray(out.valid)]))
    assert oob_frac > 0.3


def test_invalid_slots_untouched():
    seq = render_sequence(num_frames=4, height=240, width=320)
    pts, _ = _make_points(seq, num=100)
    pts = pts._replace(valid=pts.valid.at[:50].set(False))
    before = np.asarray(pts.idepth_max[:50])
    tm = build_pixel_map(jnp.asarray(seq.images[2]))
    out = estimate_depths(
        pts, tm, seq.camera, seq.t_target_ref(2, 0),
        jnp.zeros(2, jnp.float64), jnp.zeros(2, jnp.float64), 1.0,
    )
    np.testing.assert_array_equal(np.asarray(out.idepth_max[:50]), before)
