"""Frontend pose-alignment tests.

Parity model: reference test_photometric_bundle_adjustment.cpp:90-113 — the
solver must land within 1e-2 m translation / 1 degree rotation of GT starting
from a perturbed initialization on the GT-rendered sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.solvers.pose_alignment import (
    AlignmentOptions,
    align_level,
    align_pyramid,
)
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.testing.fixtures import (
    frame_pyramid_maps,
    gt_level_points,
    perturbed_pose,
    pyramid_models,
)

NUM_LEVELS = 5


def _setup(ref=0, tgt=2):
    seq = render_sequence(num_frames=8, height=240, width=320)
    pts = gt_level_points(seq, ref, NUM_LEVELS)
    maps = frame_pyramid_maps(seq, tgt, NUM_LEVELS)
    models = pyramid_models(seq.camera, NUM_LEVELS)
    t_gt = seq.t_target_ref(tgt, ref)
    return seq, pts, maps, models, t_gt


def _pose_error(t, t_gt):
    delta = t.inverse() @ t_gt
    trans = float(jnp.linalg.norm(delta.t))
    rot = float(jnp.linalg.norm(SE3(delta.q, jnp.zeros(3, delta.t.dtype)).log()[3:]))
    return trans, np.degrees(rot)


def test_align_from_gt_stays_at_gt():
    _, pts, maps, models, t_gt = _setup()
    res = align_pyramid(
        pts, maps, models, t_gt, jnp.zeros(2, jnp.float64),
        jnp.zeros(2, jnp.float64), 1.0,
    )
    trans, rot = _pose_error(res.t_t_r, t_gt)
    # stays within interpolation-noise distance of GT (reference gate: 1e-2 m / 1 deg)
    assert trans < 5e-3 and rot < 0.2, (trans, rot)
    assert int(res.num_valid) > 500


def test_align_from_perturbed_init():
    _, pts, maps, models, t_gt = _setup()
    init = perturbed_pose(t_gt, jax.random.PRNGKey(0))
    res = align_pyramid(
        pts, maps, models, init, jnp.zeros(2, jnp.float64),
        jnp.zeros(2, jnp.float64), 1.0,
    )
    trans, rot = _pose_error(res.t_t_r, t_gt)
    assert trans < 1e-2, f"translation error {trans}"
    assert rot < 1.0, f"rotation error {rot} deg"


def test_align_from_identity_via_coarse_to_fine():
    """Identity init (const-motion fallback) must still converge on a
    moderate-baseline pair thanks to the pyramid."""
    _, pts, maps, models, t_gt = _setup(ref=0, tgt=1)
    res = align_pyramid(
        pts, maps, models, SE3.identity((), jnp.float64),
        jnp.zeros(2, jnp.float64), jnp.zeros(2, jnp.float64), 1.0,
    )
    trans, rot = _pose_error(res.t_t_r, t_gt)
    assert trans < 1e-2 and rot < 1.0, (trans, rot)


def test_batched_hypotheses_pick_best():
    """27-perturbation retry loop of the reference becomes one vmapped solve."""
    _, pts, maps, models, t_gt = _setup(ref=0, tgt=2)
    key = jax.random.PRNGKey(1)
    # bad hypotheses + one decent one
    xis = jax.random.normal(key, (8, 6), jnp.float64) * 0.15
    xis = xis.at[3].set(jnp.zeros(6))
    hyps = SE3.exp(xis)
    init = SE3(
        jnp.stack([(h @ t_gt).q for h in map(lambda i: hyps.slice(i), range(8))]),
        jnp.stack([(hyps.slice(i) @ t_gt).t for i in range(8)]),
    )
    res = align_pyramid(
        pts, maps, models, init,
        jnp.zeros((8, 2), jnp.float64), jnp.zeros(2, jnp.float64), 1.0,
    )
    trans, rot = _pose_error(res.t_t_r, t_gt)
    assert trans < 1e-2 and rot < 1.0, (trans, rot)


def test_level_jacobian_matches_autodiff_on_affine_image():
    """The hand-built GN system must equal autodiff of the residual.

    Uses an affine target image: there bilinear interpolation and the
    precomputed gradient channels are both exact, so the DSO convention
    (interpolate precomputed per-pixel gradients) coincides with autodiff
    through the sampler and the comparison is tight.
    """
    from dsopp_tpu.core.camera import Pinhole
    from dsopp_tpu.core.interpolate import build_pixel_map, sample
    from dsopp_tpu.core.reproject import reproject_jacobian
    from dsopp_tpu.solvers.pose_alignment import LevelPoints, _residual_system

    h_img, w_img = 120, 160
    yy, xx = jnp.meshgrid(jnp.arange(h_img, dtype=jnp.float64),
                          jnp.arange(w_img, dtype=jnp.float64), indexing="ij")
    img = 0.7 * xx - 0.4 * yy + 90.0
    pm = build_pixel_map(img)
    model = Pinhole.create((float(w_img), float(h_img)), (120.0, 120.0),
                           (w_img / 2, h_img / 2), jnp.float64)

    key = jax.random.PRNGKey(7)
    uv = jax.random.uniform(key, (200, 2), minval=jnp.array([20.0, 20.0]),
                            maxval=jnp.array([140.0, 100.0]), dtype=jnp.float64)
    idepth = jax.random.uniform(jax.random.PRNGKey(8), (200,), minval=0.1,
                                maxval=0.5, dtype=jnp.float64)
    intens = jax.random.uniform(jax.random.PRNGKey(9), (200,), dtype=jnp.float64) * 100
    pts = LevelPoints(uv, idepth, intens, jnp.ones(200, bool))

    t0 = SE3.exp(jnp.array([0.05, -0.02, 0.03, 0.01, -0.02, 0.005], jnp.float64))
    opts = AlignmentOptions(huber_sigma=1e9)  # disable huber for the check
    affine = jnp.array([0.01, 0.5], jnp.float64)
    affine_ref = jnp.array([0.02, 0.1], jnp.float64)

    def residuals(eps, ab):
        t = SE3.exp(eps) @ t0
        rj = reproject_jacobian(model, model, pts.uv, pts.idepth, t)
        patch, inside = sample(pm, rj.uv)
        scale = jnp.exp(ab[0] - affine_ref[0])
        r = (patch[..., 0] - ab[1]) - scale * (pts.intensity - affine_ref[1])
        ok = pts.valid & rj.valid & inside
        return jnp.where(ok, r, 0.0), ok

    z = jnp.zeros(6, jnp.float64)
    r0, ok = residuals(z, affine)
    j_pose = jax.jacobian(lambda e: residuals(e, affine)[0])(z)
    j_ab = jax.jacobian(lambda ab: residuals(z, ab)[0])(affine)
    j_full = jnp.concatenate([j_pose, j_ab], axis=-1)
    m = np.asarray(ok)
    assert m.sum() > 100

    h_expected = jnp.einsum("ni,nj->ij", j_full[m], j_full[m])
    b_expected = jnp.einsum("ni,n->i", j_full[m], r0[m])

    _, _, (hh, bb) = _residual_system(
        pts, pm, model, t0, affine, affine_ref, 1.0, opts, with_jacobian=True,
    )
    hh = hh.at[6, 6].add(-opts.affine_reg_a).at[7, 7].add(-opts.affine_reg_b)
    bb = bb.at[6].add(-opts.affine_reg_a * affine[0]).at[7].add(-opts.affine_reg_b * affine[1])

    np.testing.assert_allclose(hh, h_expected, rtol=1e-6)
    np.testing.assert_allclose(bb, b_expected, rtol=1e-6, atol=1e-8)


def test_rotation_prior_hook():
    """Rotation-prior term (reference eigen_pose_alignment.cpp:39): a
    strong prior pulls the solved rotation to the prior; weight 0 with a
    prior quaternion supplied is a strict no-op."""
    _, pts, maps, models, t_gt = _setup()
    init = perturbed_pose(t_gt, jax.random.PRNGKey(1))
    z2 = jnp.zeros(2, jnp.float64)

    base = align_level(pts[0], maps[0], models[0], init, z2, z2, 1.0,
                       AlignmentOptions())

    # weight 0 + prior passed == no prior at all (python-level skip)
    off = align_level(pts[0], maps[0], models[0], init, z2, z2, 1.0,
                      AlignmentOptions(rotation_prior_weight=0.0),
                      rotation_prior_q=t_gt.q)
    np.testing.assert_array_equal(np.asarray(off.t_t_r.q),
                                  np.asarray(base.t_t_r.q))

    # a strong prior at a rotation offset from GT drags the solution there
    q_prior = (SE3.exp(jnp.asarray([0, 0, 0, 0.05, 0, 0], jnp.float64))
               @ t_gt).q
    pulled = align_level(pts[0], maps[0], models[0], init, z2, z2, 1.0,
                         AlignmentOptions(rotation_prior_weight=1e9),
                         rotation_prior_q=q_prior)
    from dsopp_tpu.solvers.pose_alignment import _rotation_prior_residual

    dev_prior = float(jnp.linalg.norm(
        _rotation_prior_residual(pulled.t_t_r, q_prior)))
    dev_gt = float(jnp.linalg.norm(
        _rotation_prior_residual(pulled.t_t_r, t_gt.q)))
    assert dev_prior < 5e-3, dev_prior          # pinned to the prior...
    assert dev_gt > 0.04, dev_gt                # ...which is 0.05 off GT
