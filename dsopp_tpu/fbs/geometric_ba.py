"""Geometric (reprojection-error) bundle adjustment for the initializer.

Mirrors the reference ``CeresGeometricBundleAdjustmentSolver``
(reference: src/energy/problems/.../geometric_bundle_adjustment/
ceres_geometric_bundle_adjustment.hpp:16-35 — Huber-robust reprojection BA
used by the FBS initializer refinement).  Implemented as a self-contained
Levenberg–Marquardt with the point-block Schur complement (same structure
as the photometric backend, 3×3 point blocks instead of scalar idepths).

Sizes are tiny (≤ ~10 frames × ~500 points), so this runs vectorized NumPy
on host — the bootstrap is not a hot path.

Conventions: poses are world→camera (x_c = R X + t); normalized image
coordinates; frame 0 is fixed (gauge); scale is re-normalized after the
solve to preserve the initial baseline.
"""

from __future__ import annotations

import numpy as np


def _so3_exp(w):
    theta = np.linalg.norm(w)
    k = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if theta < 1e-12:
        return np.eye(3) + k
    return (np.eye(3) + np.sin(theta) / theta * k
            + (1 - np.cos(theta)) / theta ** 2 * k @ k)


def _hat(v):
    out = np.zeros(v.shape[:-1] + (3, 3))
    out[..., 0, 1] = -v[..., 2]
    out[..., 0, 2] = v[..., 1]
    out[..., 1, 0] = v[..., 2]
    out[..., 1, 2] = -v[..., 0]
    out[..., 2, 0] = -v[..., 1]
    out[..., 2, 1] = v[..., 0]
    return out


def refine(poses_r, poses_t, points, obs_frame, obs_point, obs_m,
           huber=2e-3, iterations=15, fix_intrinsics=True):
    """LM refinement of poses + points.

    ``poses_r`` [F,3,3], ``poses_t`` [F,3] world→cam; ``points`` [P,3];
    observations: frame idx [M], point idx [M], measurement [M,2]
    (normalized coords).  Returns refined (poses_r, poses_t, points,
    final rms).
    """
    del fix_intrinsics
    f = len(poses_r)
    p = len(points)
    poses_r = poses_r.copy()
    poses_t = poses_t.copy()
    points = points.copy()
    lam = 1e-4
    baseline0 = np.linalg.norm(poses_t[-1]) or 1.0

    def residuals():
        cam = np.einsum("mij,mj->mi", poses_r[obs_frame], points[obs_point]) \
            + poses_t[obs_frame]
        z = np.maximum(cam[:, 2], 1e-9)
        proj = cam[:, :2] / z[:, None]
        r = proj - obs_m
        return r, cam

    def energy(r):
        n = np.linalg.norm(r, axis=1)
        e = np.where(n < huber, 0.5 * n ** 2, huber * n - 0.5 * huber ** 2)
        return e.sum()

    r, cam = residuals()
    e_prev = energy(r)

    for _ in range(iterations):
        # weights (IRLS huber)
        n = np.linalg.norm(r, axis=1)
        w = np.where(n < huber, 1.0, huber / np.maximum(n, 1e-18))

        z = np.maximum(cam[:, 2], 1e-9)
        iz = 1.0 / z
        # d proj / d cam
        j_proj = np.zeros((len(r), 2, 3))
        j_proj[:, 0, 0] = iz
        j_proj[:, 1, 1] = iz
        j_proj[:, 0, 2] = -cam[:, 0] * iz * iz
        j_proj[:, 1, 2] = -cam[:, 1] * iz * iz

        # d cam / d pose (left increment: δt, δω) and d cam / d point
        j_pose = np.concatenate(
            [np.broadcast_to(np.eye(3), (len(r), 3, 3)), -_hat(cam)], axis=2)
        j_p = np.einsum("mab,mbc->mac", j_proj, j_pose)       # [M,2,6]
        j_x = np.einsum("mab,mbc->mac", j_proj, poses_r[obs_frame])  # [M,2,3]

        # assemble H blocks
        hw = w[:, None, None]
        h_pp = np.zeros((f, 6, 6))
        b_p = np.zeros((f, 6))
        h_ll = np.zeros((p, 3, 3))
        b_l = np.zeros((p, 3))
        h_pl = np.zeros((f, p, 6, 3))

        np.add.at(h_pp, obs_frame, hw * np.einsum("mab,mac->mbc", j_p, j_p))
        np.add.at(b_p, obs_frame, np.einsum("mab,ma->mb", j_p, w[:, None] * r))
        np.add.at(h_ll, obs_point, hw * np.einsum("mab,mac->mbc", j_x, j_x))
        np.add.at(b_l, obs_point, np.einsum("mab,ma->mb", j_x, w[:, None] * r))
        np.add.at(h_pl, (obs_frame, obs_point),
                  hw * np.einsum("mab,mac->mbc", j_p, j_x))

        # LM damping + fixed frame 0
        h_pp += lam * np.eye(6) * np.maximum(
            np.einsum("fii->f", h_pp), 1e-9)[:, None, None] / 6.0
        h_ll_d = h_ll + lam * np.eye(3) * np.maximum(
            np.einsum("pii->p", h_ll), 1e-9)[:, None, None] / 3.0
        h_pp[0] += np.eye(6) * 1e12

        # Schur: eliminate points
        h_ll_inv = np.linalg.pinv(h_ll_d)
        # S = H_pp − Σ_l H_pl H_ll⁻¹ H_plᵀ (block over frame pairs)
        hpl_inv = np.einsum("fpab,pbc->fpac", h_pl, h_ll_inv)   # [F,P,6,3]
        s = np.zeros((f * 6, f * 6))
        for a in range(f):
            for b in range(f):
                blk = np.einsum("pac,pbc->ab", hpl_inv[a], h_pl[b])
                s[a * 6:(a + 1) * 6, b * 6:(b + 1) * 6] -= blk
        for a in range(f):
            s[a * 6:(a + 1) * 6, a * 6:(a + 1) * 6] += h_pp[a]
        rhs = (b_p - np.einsum("fpac,pc->fa", hpl_inv, b_l)).reshape(-1)

        try:
            delta_p = -np.linalg.solve(s, rhs).reshape(f, 6)
        except np.linalg.LinAlgError:
            lam *= 10
            continue
        delta_x = -np.einsum(
            "pab,pb->pa", h_ll_inv,
            b_l + np.einsum("fpab,fa->pb", h_pl, delta_p))

        # apply
        new_r = poses_r.copy()
        new_t = poses_t.copy()
        for i in range(f):
            rot = _so3_exp(delta_p[i, 3:])
            new_r[i] = rot @ poses_r[i]
            new_t[i] = rot @ poses_t[i] + delta_p[i, :3]
        new_pts = points + delta_x

        cam_new = np.einsum("mij,mj->mi", new_r[obs_frame], new_pts[obs_point]) \
            + new_t[obs_frame]
        zb = np.maximum(cam_new[:, 2], 1e-9)
        r_new = cam_new[:, :2] / zb[:, None] - obs_m
        e_new = energy(r_new)
        if e_new < e_prev:
            poses_r, poses_t, points = new_r, new_t, new_pts
            r, cam = r_new, cam_new
            if abs(e_prev - e_new) / max(e_prev, 1e-18) < 1e-8:
                e_prev = e_new
                break
            e_prev = e_new
            lam = max(lam / 2, 1e-8)
        else:
            lam *= 10

    # re-normalize scale (monocular gauge)
    scale = baseline0 / max(np.linalg.norm(poses_t[-1]), 1e-12)
    poses_t *= scale
    points *= scale
    rms = np.sqrt(np.mean(np.sum(r ** 2, axis=1)))
    return poses_r, poses_t, points, rms
