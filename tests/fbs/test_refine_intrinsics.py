"""Calibration refinement (reference --refine_calibration path).

Parity model: the geometric BA's intrinsics-refinement flags
(ceres_geometric_bundle_adjustment.hpp:16-35) behind dsopp_main.cpp:30 —
from a perturbed pinhole guess, joint pose/structure/intrinsics refinement
must recover the true focal/center from exact observations.
"""

import numpy as np

from dsopp_tpu.fbs.geometric_ba import refine_intrinsics


def _scene(seed=3, f_frames=6, n_pts=120):
    rng = np.random.default_rng(seed)
    fx, fy, cx, cy = 450.0, 455.0, 320.0, 240.0
    pts = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
                    rng.uniform(4.0, 9.0, n_pts)], axis=1)
    poses_r, poses_t = [], []
    obs_f, obs_p, obs_px = [], [], []
    for i in range(f_frames):
        w = rng.normal(0, 0.01, 3)
        th = np.linalg.norm(w)
        k = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        r = np.eye(3) + np.sin(th) / max(th, 1e-12) * k + \
            (1 - np.cos(th)) / max(th, 1e-12) ** 2 * (k @ k)
        t = np.array([0.15 * i, 0.02 * i, 0.0]) + rng.normal(0, 0.01, 3)
        poses_r.append(r)
        poses_t.append(t)
        cam = pts @ r.T + t
        uv = cam[:, :2] / cam[:, 2:3] * [fx, fy] + [cx, cy]
        obs_f.append(np.full(n_pts, i))
        obs_p.append(np.arange(n_pts))
        obs_px.append(uv)
    return (np.stack(poses_r), np.stack(poses_t), pts,
            np.concatenate(obs_f), np.concatenate(obs_p),
            np.concatenate(obs_px), (fx, fy, cx, cy))


def test_recovers_true_intrinsics_from_perturbed_guess():
    poses_r, poses_t, pts, obs_f, obs_p, obs_px, (fx, fy, cx, cy) = _scene()
    # perturbed initial guess: 4% focal error, 5 px center error
    _, _, _, (fx_e, fy_e, cx_e, cy_e), rms = refine_intrinsics(
        poses_r, poses_t, pts.copy(), obs_f, obs_p, obs_px,
        fx * 1.04, fy * 0.96, cx + 5.0, cy - 5.0)
    assert abs(fx_e - fx) / fx < 0.005, (fx_e, fx)
    assert abs(fy_e - fy) / fy < 0.005, (fy_e, fy)
    assert abs(cx_e - cx) < 1.5 and abs(cy_e - cy) < 1.5, (cx_e, cy_e)
    assert rms < 0.5, rms


def test_fix_flags_hold_parameters():
    poses_r, poses_t, pts, obs_f, obs_p, obs_px, (fx, fy, cx, cy) = _scene(5)
    _, _, _, (fx_e, fy_e, cx_e, cy_e), _ = refine_intrinsics(
        poses_r, poses_t, pts.copy(), obs_f, obs_p, obs_px,
        fx * 1.03, fy * 1.03, cx, cy, fix_center=True)
    assert (cx_e, cy_e) == (cx, cy)
    assert abs(fx_e - fx) / fx < 0.01

    _, _, _, (fx_e, fy_e, cx_e, cy_e), _ = refine_intrinsics(
        poses_r, poses_t, pts.copy(), obs_f, obs_p, obs_px,
        fx, fy, cx + 4.0, cy - 4.0, fix_focal=True)
    assert (fx_e, fy_e) == (fx, fy)
    assert abs(cx_e - cx) < 1.5 and abs(cy_e - cy) < 1.5
