"""S2 parameterization parity (reference test_local_parameterization_s2.cpp)."""

import numpy as np

import jax
import jax.numpy as jnp

from dsopp_tpu.solvers.s2 import s2_plus, s2_plus_jacobian


def test_plus_stays_on_sphere_and_jacobian_matches():
    rng = np.random.default_rng(0)
    for _ in range(50):
        v = rng.standard_normal(3)
        v = jnp.asarray(v / np.linalg.norm(v), jnp.float64)
        delta = jnp.asarray(rng.uniform(0, 2 * np.pi, 2), jnp.float64)

        plus = s2_plus(v, delta)
        assert abs(float(jnp.linalg.norm(plus)) - 1.0) < 1e-14

        j = s2_plus_jacobian(v)
        small = jnp.asarray(rng.standard_normal(2) * 1e-5, jnp.float64)
        lin = np.asarray(v) + np.asarray(j) @ np.asarray(small)
        got = np.asarray(s2_plus(v, small))
        assert np.linalg.norm(lin - got) < 1e-9


def test_jacobian_is_autodiff_consistent():
    v = jnp.asarray([0.36, -0.48, 0.8], jnp.float64)
    j_auto = jax.jacfwd(lambda d: s2_plus(v, d))(jnp.zeros(2, jnp.float64))
    np.testing.assert_allclose(np.asarray(s2_plus_jacobian(v)),
                               np.asarray(j_auto), atol=1e-12)


def test_batched():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((8, 3))
    v = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True), jnp.float64)
    d = jnp.asarray(rng.standard_normal((8, 2)) * 0.1, jnp.float64)
    out = s2_plus(v, d)
    assert out.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-14)
    assert s2_plus_jacobian(v).shape == (8, 3, 2)
