"""SE3/SO3 unit tests (parity model: reference test/test/energy/motion/se3_motion.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsopp_tpu.core.lie import SE3, SO3, quat_to_matrix, matrix_to_quat, quat_normalize


def random_se3(key, batch=(), scale=1.0):
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, batch + (6,), dtype=jnp.float64) * scale
    return SE3.exp(xi)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    xi = jax.random.normal(key, (64, 6), dtype=jnp.float64)
    # keep |omega| < pi so log returns the same branch
    xi = xi.at[:, 3:].multiply(0.5)
    T = SE3.exp(xi)
    np.testing.assert_allclose(T.log(), xi, atol=1e-10)


def test_exp_log_small_angle():
    xi = jnp.array(
        [[1e-9, -2e-9, 3e-10, 1e-10, -1e-9, 2e-9], [0.0] * 6], dtype=jnp.float64
    )
    T = SE3.exp(xi)
    np.testing.assert_allclose(T.log(), xi, atol=1e-15)
    assert not np.any(np.isnan(np.asarray(T.q)))


def test_exp_matches_matrix_exponential():
    from scipy.linalg import expm

    rng = np.random.default_rng(1)
    for _ in range(10):
        xi = rng.normal(size=6)
        up, om = xi[:3], xi[3:]
        hat = np.zeros((4, 4))
        hat[:3, :3] = np.array(
            [[0, -om[2], om[1]], [om[2], 0, -om[0]], [-om[1], om[0], 0]]
        )
        hat[:3, 3] = up
        expected = expm(hat)
        got = np.asarray(SE3.exp(jnp.asarray(xi, dtype=jnp.float64)).matrix())
        np.testing.assert_allclose(got, expected, atol=1e-10)


def test_compose_apply_matches_matrix():
    key = jax.random.PRNGKey(2)
    ka, kb, kx = jax.random.split(key, 3)
    A = random_se3(ka, (8,))
    B = random_se3(kb, (8,))
    x = jax.random.normal(kx, (8, 3), dtype=jnp.float64)
    via_group = (A @ B).apply(x)
    via_matrix = jnp.einsum("bij,bj->bi", A.matrix() @ B.matrix(),
                            jnp.concatenate([x, jnp.ones_like(x[..., :1])], -1))[..., :3]
    np.testing.assert_allclose(via_group, via_matrix, atol=1e-10)


def test_inverse():
    T = random_se3(jax.random.PRNGKey(3), (8,))
    I = T @ T.inverse()
    np.testing.assert_allclose(I.t, 0.0, atol=1e-12)
    np.testing.assert_allclose(np.abs(np.asarray(I.q[..., 0])), 1.0, atol=1e-12)


def test_adjoint_identity():
    """Adj(T) ξ == log(T exp(ξ) T⁻¹)."""
    key = jax.random.PRNGKey(4)
    T = random_se3(key, ())
    xi = jax.random.normal(jax.random.PRNGKey(5), (6,), dtype=jnp.float64) * 0.3
    lhs = T.adjoint() @ xi
    rhs = (T @ SE3.exp(xi) @ T.inverse()).log()
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_matrix_quat_roundtrip():
    key = jax.random.PRNGKey(6)
    q = quat_normalize(jax.random.normal(key, (128, 4), dtype=jnp.float64))
    q = jnp.where(q[..., :1] < 0, -q, q)
    m = quat_to_matrix(q)
    q2 = matrix_to_quat(m)
    q2 = jnp.where(q2[..., :1] < 0, -q2, q2)
    np.testing.assert_allclose(q2, q, atol=1e-10)


def test_right_increment_derivative():
    """d/dε log(T⁻¹ · (T·exp(ε))) at ε=0 is identity (right-tangent chart)."""
    T = random_se3(jax.random.PRNGKey(7), ())
    f = lambda eps: (T.inverse() @ T.right_increment(eps)).log()
    J = jax.jacobian(f)(jnp.zeros(6, dtype=jnp.float64))
    np.testing.assert_allclose(J, np.eye(6), atol=1e-8)


def test_differentiable_at_identity():
    """exp/log must have NaN-free gradients at zero tangent."""
    g = jax.grad(lambda xi: jnp.sum(SE3.exp(xi).apply(jnp.ones(3, jnp.float64))))(
        jnp.zeros(6, dtype=jnp.float64)
    )
    assert not np.any(np.isnan(np.asarray(g)))
    g2 = jax.grad(lambda xi: jnp.sum(SE3.exp(xi).log()))(jnp.zeros(6, jnp.float64))
    assert not np.any(np.isnan(np.asarray(g2)))


def test_batch_shapes():
    T = SE3.identity((4, 5), jnp.float64)
    assert T.batch_shape == (4, 5)
    x = jnp.ones((4, 5, 3), jnp.float64)
    assert T.apply(x).shape == (4, 5, 3)
