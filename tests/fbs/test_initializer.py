"""Feature-based bootstrap tests.

Parity model: reference calculate_monocular_initializer_deviations harness —
initializer poses must match GT up to the monocular scale/gauge.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dsopp_tpu.fbs import MonocularInitializer, InitializerOptions
from dsopp_tpu.fbs.geometry import (
    decompose_essential,
    essential_8pt,
    ransac_essential,
    ransac_pnp,
    sampson_distance,
    so3_inlier_ratio,
    triangulate,
)
from dsopp_tpu.fbs.geometric_ba import refine
from dsopp_tpu.output.ate import absolute_trajectory_error
from dsopp_tpu.testing import render_sequence


def _synthetic_two_view(seed=0, n=100, noise=0.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 3], [2, 2, 8], (n, 3))
    r_gt = _rot(np.array([0.05, -0.1, 0.02]))
    t_gt = np.array([0.5, 0.1, -0.05])
    t_gt = t_gt / np.linalg.norm(t_gt)
    m1 = pts[:, :2] / pts[:, 2:3]
    cam2 = pts @ r_gt.T + t_gt
    m2 = cam2[:, :2] / cam2[:, 2:3]
    if noise:
        m1 = m1 + rng.normal(0, noise, m1.shape)
        m2 = m2 + rng.normal(0, noise, m2.shape)
    return pts, r_gt, t_gt, m1, m2


def _rot(w):
    from dsopp_tpu.fbs.geometric_ba import _so3_exp

    return _so3_exp(w)


def test_essential_exact():
    pts, r_gt, t_gt, m1, m2 = _synthetic_two_view()
    e = essential_8pt(m1, m2)
    d = sampson_distance(e, m1, m2)
    assert d.max() < 1e-12


def test_decompose_recovers_pose():
    pts, r_gt, t_gt, m1, m2 = _synthetic_two_view()
    e = essential_8pt(m1, m2)
    r, t, tri, valid = decompose_essential(e, m1, m2)
    np.testing.assert_allclose(r, r_gt, atol=1e-8)
    np.testing.assert_allclose(t / np.linalg.norm(t), t_gt, atol=1e-8)
    assert valid.mean() > 0.95
    scale = np.median(pts[:, 2] / tri[:, 2])
    np.testing.assert_allclose(tri * scale, pts, rtol=1e-6)


def test_ransac_essential_with_outliers():
    pts, r_gt, t_gt, m1, m2 = _synthetic_two_view(n=150, noise=5e-4)
    rng = np.random.default_rng(1)
    bad = rng.choice(150, 40, replace=False)
    m2 = m2.copy()
    m2[bad] += rng.uniform(-0.2, 0.2, (40, 2))
    e, inliers = ransac_essential(m1, m2, threshold=3e-3)
    assert inliers.sum() > 90
    assert np.intersect1d(np.where(inliers)[0], bad).size < 5


def test_so3_ratio_detects_standstill():
    pts, _, _, m1, _ = _synthetic_two_view()
    r_pure = _rot(np.array([0.03, -0.02, 0.01]))
    cam2 = pts @ r_pure.T
    m2 = cam2[:, :2] / cam2[:, 2:3]
    assert so3_inlier_ratio(m1, m2, 5e-3) > 0.9
    # with translation, rotation can't explain the flow
    _, _, _, m1b, m2b = _synthetic_two_view()
    assert so3_inlier_ratio(m1b, m2b, 5e-3) < 0.7


def test_pnp():
    pts, r_gt, t_gt, m1, m2 = _synthetic_two_view(n=80, noise=1e-4)
    r, t, inliers = ransac_pnp(pts, m2, threshold=3e-3)
    assert inliers.sum() > 70
    np.testing.assert_allclose(r, r_gt, atol=1e-2)
    np.testing.assert_allclose(t, t_gt, atol=1e-2)


def test_geometric_ba_reduces_error():
    pts, r_gt, t_gt, m1, m2 = _synthetic_two_view(n=60, noise=1e-4)
    rng = np.random.default_rng(2)
    poses_r = np.stack([np.eye(3), _rot(rng.normal(0, 0.01, 3)) @ r_gt])
    poses_t = np.stack([np.zeros(3), t_gt + rng.normal(0, 0.02, 3)])
    pts_noisy = pts * (1 + rng.normal(0, 0.02, (len(pts), 1)))
    obs_f = np.concatenate([np.zeros(60, int), np.ones(60, int)])
    obs_p = np.concatenate([np.arange(60), np.arange(60)])
    obs_m = np.concatenate([m1, m2])
    r_out, t_out, pts_out, rms = refine(
        poses_r, poses_t, pts_noisy, obs_f, obs_p, obs_m)
    assert rms < 3e-4, rms
    np.testing.assert_allclose(r_out[1], r_gt, atol=2e-3)


def test_initializer_on_synthetic_sequence():
    seq = render_sequence(num_frames=16, height=240, width=320)
    init = MonocularInitializer(
        seq.camera,
        InitializerOptions(min_parallax_px=6.0, min_frames=5,
                           reference_image_width=320.0),
    )
    done = False
    for i in range(16):
        done = init.process(i, float(seq.timestamps[i]), seq.images[i])
        if done:
            break
    assert done, "initializer never finished on a moving sequence"

    est = [(ts, mat) for _, ts, mat in init.poses]
    gt = [(float(seq.timestamps[fid]), np.asarray(seq.pose_t_wc(fid).matrix()))
          for fid, _, _ in init.poses]
    stats = absolute_trajectory_error(est, gt, align=True, with_scale=True)
    # monocular bootstrap: similarity-aligned trajectory must match GT
    assert stats["rmse"] < 0.02, stats


def test_so3xs2_refinement_improves_noisy_pose():
    """refineSO3xS2 parity (so3xs2_refinement.cpp:11-49): Sampson LM pulls a
    perturbed (R, t̂) back toward GT."""
    from dsopp_tpu.fbs.geometry import so3xs2_refine

    focal = 400.0
    pts, r_gt, t_gt, m1, m2 = _synthetic_two_view(seed=3, n=150, noise=5e-4)
    pc1 = m1 * focal
    pc2 = m2 * focal

    r0 = _rot(np.array([0.01, -0.008, 0.012])) @ r_gt
    t0 = t_gt + np.array([0.05, -0.04, 0.03])

    def angle(r):
        return np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))

    r, t, f, rms = so3xs2_refine(pc1, pc2, r0, t0, focal, threshold=2.0)
    assert f == pytest.approx(focal)  # focal fixed in the calibrated path
    assert angle(r @ r_gt.T) < 0.3 * angle(r0 @ r_gt.T)
    err0 = np.linalg.norm(t0 / np.linalg.norm(t0) - t_gt)
    assert np.linalg.norm(t - t_gt) < 0.3 * err0
    assert rms < 1.0


def test_so3xs2_autocalibration_recovers_focal():
    """Autocalibration variant: wrong focal guess must move toward truth."""
    from dsopp_tpu.fbs.geometry import AutocalibrationSelector, so3xs2_refine

    focal_gt = 400.0
    selector = AutocalibrationSelector()
    for seed in (1, 2, 3):
        pts, r_gt, t_gt, m1, m2 = _synthetic_two_view(seed=seed, n=200, noise=2e-4)
        pc1 = m1 * focal_gt
        pc2 = m2 * focal_gt
        r0 = _rot(np.array([0.004, -0.003, 0.005])) @ r_gt
        t0 = t_gt + np.array([0.02, -0.02, 0.01])
        _, _, f, _ = so3xs2_refine(
            pc1, pc2, r0, t0, 300.0, threshold=2.0,
            optimize_focal=True, iterations=80)
        selector.add_result(f)
    f_sel = selector.get_focal_length()
    assert abs(f_sel - focal_gt) < 0.25 * abs(300.0 - focal_gt), f_sel


def test_orb_initializer_on_synthetic_sequence():
    """Distinct-features (ORB) matcher bootstrap — re-detection per frame
    (reference distinct_features_extractor_orb.cpp)."""
    seq = render_sequence(num_frames=16, height=240, width=320)
    init = MonocularInitializer(
        seq.camera,
        InitializerOptions(matcher="orb", num_features=2000,
                           min_parallax_px=6.0, min_frames=5,
                           reference_image_width=320.0),
    )
    done = False
    for i in range(16):
        done = init.process(i, float(seq.timestamps[i]), seq.images[i])
        if done:
            break
    assert done, "ORB initializer never finished on a moving sequence"
    est = [(ts, mat) for _, ts, mat in init.poses]
    gt = [(float(seq.timestamps[fid]), np.asarray(seq.pose_t_wc(fid).matrix()))
          for fid, _, _ in init.poses]
    stats = absolute_trajectory_error(est, gt, align=True, with_scale=True)
    assert stats["rmse"] < 0.03, stats


def test_orb_survives_frame_gaps_where_lk_chain_breaks():
    """Large-baseline robustness: feed every 4th frame only.  The ORB
    matcher re-detects and matches first↔current directly, so wide gaps
    keep plenty of correspondences; the LK chain loses most points."""
    seq = render_sequence(num_frames=33, height=240, width=320, advance=0.1)
    frames = list(range(0, 33, 4))

    def run(opts):
        init = MonocularInitializer(seq.camera, opts)
        matched = []
        for i in frames:
            init.process(i, float(seq.timestamps[i]), seq.images[i])
            if len(init.frames) >= 2:
                first = init.frames[0]
                cur = init.frames[-1]
                both = (np.isfinite(first.points[:, 0])
                        & np.isfinite(cur.points[:, 0]))
                matched.append(int(both.sum()))
            if init.initialized:
                break
        return init, matched

    orb_init, orb_matched = run(
        InitializerOptions(matcher="orb", num_features=2000,
                           min_parallax_px=6.0, min_frames=3,
                           reference_image_width=320.0))
    assert orb_matched and orb_matched[-1] >= 30, (
        f"ORB kept too few correspondences across gaps: {orb_matched}")
    assert orb_init.initialized

    est = [(ts, mat) for _, ts, mat in orb_init.poses]
    gt = [(float(seq.timestamps[fid]), np.asarray(seq.pose_t_wc(fid).matrix()))
          for fid, _, _ in orb_init.poses]
    stats = absolute_trajectory_error(est, gt, align=True, with_scale=True)
    assert stats["rmse"] < 0.05, stats
