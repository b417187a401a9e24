"""Parity: device-side marginalization policy vs the host reference port.

The device flags must reproduce the host ``SparseMarginalizationStrategy``
bit-for-bit on randomized windows (the host port itself is validated against
the reference semantics in test_marginalization.py).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dsopp_tpu.solvers.pba import RES_OK, RES_OOB, empty_window
from dsopp_tpu.tracker.marginalization import (
    SparseMarginalizationStrategy,
    flags_device,
    kept_first_perm,
)

K, N = 8, 32


def _random_window(rng, num_frames):
    w = empty_window(K, N, (3, 16, 16), dtype=jnp.float32)
    fv = np.zeros(K, bool)
    fv[:num_frames] = True
    lm_valid = rng.random((K, N)) < 0.8
    lm_valid[~fv] = False
    lm_outlier = (rng.random((K, N)) < 0.25) & lm_valid
    res = np.where(rng.random((K, K, N)) < 0.6, RES_OK, RES_OOB).astype(np.int32)
    t = rng.normal(size=(K, 3)).astype(np.float32)
    ids = np.full(K, -1, np.int32)
    ids[:num_frames] = np.sort(rng.choice(100, num_frames, replace=False))
    return dataclasses.replace(
        w,
        frame_valid=jnp.asarray(fv),
        frame_id=jnp.asarray(ids),
        t_lin_t=jnp.asarray(t),
        lm_valid=jnp.asarray(lm_valid),
        lm_outlier=jnp.asarray(lm_outlier),
        lm_inliers=jnp.asarray(rng.integers(0, 8, (K, N)).astype(np.int32)),
        lm_opt_count=jnp.asarray(rng.integers(0, 20, (K, N)).astype(np.int32)),
        res_status=jnp.asarray(res),
    )


def test_flags_device_matches_host():
    rng = np.random.default_rng(7)
    strat = SparseMarginalizationStrategy(minimum_size=3, maximum_size=5,
                                          maximum_marginalized_fraction=0.95)
    for trial in range(40):
        f = int(rng.integers(2, K + 1))
        w = _random_window(rng, f)
        imm = rng.integers(0, 50, K).astype(np.int32)
        imm[f:] = 0
        host_f, host_lm, host_out = strat.flags(w, immature_counts=imm)
        dev_f, dev_lm, dev_out = flags_device(
            w, jnp.asarray(imm), strat.minimum_size, strat.maximum_size,
            strat.maximum_marginalized_fraction)
        np.testing.assert_array_equal(np.asarray(dev_f), host_f,
                                      err_msg=f"frame flags, trial {trial}")
        np.testing.assert_array_equal(np.asarray(dev_lm), host_lm,
                                      err_msg=f"lm flags, trial {trial}")
        np.testing.assert_array_equal(np.asarray(dev_out), host_out,
                                      err_msg=f"outliers, trial {trial}")


def test_kept_first_perm_matches_host_rule():
    rng = np.random.default_rng(3)
    for _ in range(20):
        f = int(rng.integers(1, K + 1))
        fv = np.zeros(K, bool)
        fv[:f] = True
        flags = (rng.random(K) < 0.4) & fv
        kept = np.where(~flags & fv)[0]
        dead = [i for i in range(K) if i not in kept]
        expect = np.concatenate([kept, dead]).astype(np.int32)
        got = np.asarray(kept_first_perm(jnp.asarray(fv), jnp.asarray(flags)))
        np.testing.assert_array_equal(got, expect)
