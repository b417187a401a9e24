"""Reprojection tests (parity model: reference test/test/energy/projector/test_reprojects.cpp
and test_analytical_diff.cpp — analytic Jacobians vs autodiff)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.camera import Pinhole, SimpleRadial
from dsopp_tpu.core.lie import SE3
from dsopp_tpu.core.reproject import reproject, reproject_jacobian

SIZE = (1280.0, 720.0)


def _setup(key, n=128, model="pinhole"):
    if model == "pinhole":
        cam = Pinhole.create(SIZE, (448.0, 450.0), (640.0, 360.0), jnp.float64)
    else:
        cam = SimpleRadial.create(SIZE, 448.0, (640.0, 360.0), -0.05, 0.008, jnp.float64)
    k1, k2, k3 = jax.random.split(key, 3)
    uv = jax.random.uniform(
        k1, (n, 2), minval=jnp.array([100.0, 100.0]),
        maxval=jnp.array([1180.0, 620.0]), dtype=jnp.float64,
    )
    idepth = jax.random.uniform(k2, (n,), minval=0.05, maxval=1.0, dtype=jnp.float64)
    xi = jax.random.normal(k3, (6,), dtype=jnp.float64) * jnp.array(
        [0.1, 0.1, 0.1, 0.02, 0.02, 0.02]
    )
    t_t_r = SE3.exp(xi)
    return cam, uv, idepth, t_t_r


def test_identity_reprojection_is_identity():
    cam, uv, idepth, _ = _setup(jax.random.PRNGKey(0))
    rp = reproject(cam, cam, uv, idepth, SE3.identity((), jnp.float64))
    np.testing.assert_allclose(rp.uv, uv, atol=1e-9)
    np.testing.assert_allclose(rp.idepth, idepth, atol=1e-12)
    assert bool(jnp.all(rp.valid))


def test_reprojection_geometric_consistency():
    """Reprojected pixel equals projecting the explicit 3D point."""
    cam, uv, idepth, t_t_r = _setup(jax.random.PRNGKey(1))
    rp = reproject(cam, cam, uv, idepth, t_t_r)
    p_ref = cam.unproject(uv) / idepth[:, None]
    p_tgt = t_t_r.apply(p_ref)
    uv_direct, _ = cam.project(p_tgt)
    m = np.asarray(rp.valid)
    np.testing.assert_allclose(rp.uv[m], uv_direct[m], atol=1e-9)
    # target idepth really is 1 / z_target
    np.testing.assert_allclose(rp.idepth[m], 1.0 / p_tgt[m, 2], atol=1e-12)


def test_roundtrip_ref_tgt_ref():
    cam, uv, idepth, t_t_r = _setup(jax.random.PRNGKey(2))
    fwd = reproject(cam, cam, uv, idepth, t_t_r)
    back = reproject(cam, cam, fwd.uv, fwd.idepth, t_t_r.inverse())
    m = np.asarray(fwd.valid & back.valid)
    assert m.sum() > 50
    np.testing.assert_allclose(back.uv[m], uv[m], atol=1e-7)
    np.testing.assert_allclose(back.idepth[m], idepth[m], atol=1e-10)


def _autodiff_jacobians(cam, uv, idepth, t_t_r):
    """d(uv_t)/d(idepth, eps_ref, eps_tgt) by autodiff through the frame update."""

    def uv_of(d, eps_r, eps_t):
        t = SE3.exp(eps_t).inverse() @ t_t_r @ SE3.exp(eps_r)
        return reproject(cam, cam, uv, d, t).uv

    z = jnp.zeros(6, dtype=jnp.float64)
    j_d = jax.jacobian(uv_of, argnums=0)(idepth, z, z)
    j_d = jnp.einsum("nin->ni", j_d)  # diagonal over the point axis
    j_r = jax.jacobian(uv_of, argnums=1)(idepth, z, z)
    j_t = jax.jacobian(uv_of, argnums=2)(idepth, z, z)
    return j_d, j_r, j_t


def test_jacobians_vs_autodiff_pinhole():
    cam, uv, idepth, t_t_r = _setup(jax.random.PRNGKey(3), n=24)
    rj = reproject_jacobian(cam, cam, uv, idepth, t_t_r)
    j_d, j_r, j_t = _autodiff_jacobians(cam, uv, idepth, t_t_r)
    m = np.asarray(rj.valid)
    np.testing.assert_allclose(rj.d_uv_d_idepth[m], j_d[m], atol=1e-8)
    np.testing.assert_allclose(rj.d_uv_d_eps_ref[m], j_r[m], atol=1e-8)
    np.testing.assert_allclose(rj.d_uv_d_eps_tgt[m], j_t[m], atol=1e-8)


def test_jacobians_vs_autodiff_radial():
    cam, uv, idepth, t_t_r = _setup(jax.random.PRNGKey(4), n=24, model="radial")
    rj = reproject_jacobian(cam, cam, uv, idepth, t_t_r)

    def uv_of(d, eps_r, eps_t):
        t = SE3.exp(eps_t).inverse() @ t_t_r @ SE3.exp(eps_r)
        return reproject(cam, cam, uv, d, t).uv

    z = jnp.zeros(6, dtype=jnp.float64)
    j_r = jax.jacobian(uv_of, argnums=1)(idepth, z, z)
    m = np.asarray(rj.valid)
    np.testing.assert_allclose(rj.d_uv_d_eps_ref[m], j_r[m], atol=1e-7)


def test_infinite_depth_is_finite():
    """idepth = 0 (point at infinity) must stay valid and finite."""
    cam, uv, _, t_t_r = _setup(jax.random.PRNGKey(5), n=16)
    idepth = jnp.zeros(uv.shape[0], dtype=jnp.float64)
    rp = reproject(cam, cam, uv, idepth, t_t_r)
    assert np.asarray(rp.valid).sum() > 0
    assert not np.any(np.isnan(np.asarray(rp.uv)))


def test_pattern_batch_axis():
    """The pattern axis is just another batch axis."""
    from dsopp_tpu.core.pattern import shift_pattern

    cam, uv, idepth, t_t_r = _setup(jax.random.PRNGKey(6), n=16)
    pat = shift_pattern(uv)  # [16, 8, 2]
    rj = reproject_jacobian(cam, cam, pat, idepth[:, None], t_t_r)
    assert rj.uv.shape == (16, 8, 2)
    assert rj.d_uv_d_eps_ref.shape == (16, 8, 2, 6)
