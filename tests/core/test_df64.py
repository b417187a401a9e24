"""Double-float arithmetic: exactness and ledger-drift properties.

The marginalization ledger is the one place the reference insists on double
precision (eigen_photometric_bundle_adjustment_problem.hpp
`system_marginalized_`); dsopp_tpu carries it as float32 (hi, lo) pairs
(core/df64.py).  These tests check the error-free transformations against
numpy float64, and that a simulated long-horizon ledger (hundreds of
fold + Schur-eliminate cycles) drifts orders of magnitude less than a plain
float32 ledger.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsopp_tpu.core import df64


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000).astype(np.float32) * 1e6
    b = rng.standard_normal(1000).astype(np.float32)
    s, e = jax.jit(df64.two_sum)(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) + b.astype(np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(1000).astype(np.float32) * 1e3
    b = rng.standard_normal(1000).astype(np.float32)
    p, e = jax.jit(df64.two_prod)(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_df_sum_cancellation():
    # alternating large/small series that a plain f32 sum butchers
    rng = np.random.default_rng(2)
    big = rng.standard_normal(256).astype(np.float32) * 1e7
    terms = np.stack([big, -big + rng.standard_normal(256).astype(np.float32)],
                     1).reshape(-1)
    hi, lo = df64.df_sum(jnp.asarray(terms), jnp.zeros_like(jnp.asarray(terms)),
                         axis=0)
    exact = np.sum(terms.astype(np.float64))
    got = float(hi) + float(lo)
    plain = float(np.sum(terms, dtype=np.float32))
    assert abs(got - exact) <= 1e-6 * max(abs(exact), 1.0)
    assert abs(got - exact) < abs(plain - exact) or plain == exact


def test_df_matmul_matches_f64():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((40, 40)).astype(np.float32)
    b = rng.standard_normal((40, 40)).astype(np.float32)
    z = jnp.zeros((40, 40), jnp.float32)
    hi, lo = jax.jit(df64.df_matmul)(jnp.asarray(a), z, jnp.asarray(b), z)
    exact = a.astype(np.float64) @ b.astype(np.float64)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    err = np.max(np.abs(got - exact)) / np.max(np.abs(exact))
    assert err < 1e-12


def _simulate_ledger(n_folds, pair: bool, seed=7, dim=24):
    """Repeated fold + rebase + Schur-eliminate, df32 pairs vs plain f32."""
    rng = np.random.default_rng(seed)
    h64 = np.zeros((dim, dim))
    b64 = np.zeros(dim)
    h_hi = jnp.zeros((dim, dim), jnp.float32)
    h_lo = jnp.zeros((dim, dim), jnp.float32)
    b_hi = jnp.zeros((dim,), jnp.float32)
    b_lo = jnp.zeros((dim,), jnp.float32)

    @jax.jit
    def fold(h_hi, h_lo, b_hi, b_lo, dh, db, s):
        if pair:
            h_hi, h_lo = df64.df_add_flat(h_hi, h_lo, dh)
            hs_hi, hs_lo = df64.df_matvec(dh, jnp.zeros_like(dh), s)
            db_hi, db_lo = df64.df_add(db, jnp.zeros_like(db), -hs_hi, -hs_lo)
            b_hi, b_lo = df64.df_add(b_hi, b_lo, db_hi, db_lo)
        else:
            h_hi = h_hi + dh
            b_hi = b_hi + (db - dh @ s)
        return h_hi, h_lo, b_hi, b_lo

    for i in range(n_folds):
        j = rng.standard_normal((dim // 2, dim)).astype(np.float32)
        dh = (j.T @ j).astype(np.float32)
        db = (j.T @ rng.standard_normal(dim // 2)).astype(np.float32)
        s = (rng.standard_normal(dim) * 1e-2).astype(np.float32)
        h64 += dh.astype(np.float64)
        b64 += db.astype(np.float64) - dh.astype(np.float64) @ s.astype(np.float64)
        h_hi, h_lo, b_hi, b_lo = fold(h_hi, h_lo, b_hi, b_lo,
                                      jnp.asarray(dh), jnp.asarray(db),
                                      jnp.asarray(s))
    got_b = np.asarray(b_hi, np.float64) + np.asarray(b_lo, np.float64)
    scale = np.max(np.abs(b64)) + 1.0
    return np.max(np.abs(got_b - b64)) / scale


@pytest.mark.slow
def test_ledger_drift_pairs_beat_plain_f32():
    """300 rebased folds: the pair ledger tracks the f64 oracle ~1e3x closer."""
    err_pair = _simulate_ledger(300, pair=True)
    err_plain = _simulate_ledger(300, pair=False)
    assert err_pair < 1e-6, err_pair
    assert err_pair * 50 < err_plain, (err_pair, err_plain)
