"""Faithful reproduction of the BA-evaluate gather to find the real cost.

PERF.md r3 claimed the packed row gather is ~55% of each LM iteration, but
a bare [M,12] row gather measures 0.03 ms — the slowness must live in the
composition: the vmap over target maps (batched gather), the index/weight
arithmetic, or the surrounding einsum.  This probe decomposes it.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dsopp_tpu.ops import sample_packed  # noqa: E402

H, W = 480, 640
HW = H * W
K, N, P = 10, 250, 8


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.standard_normal((K, HW, 12)), jnp.float32)
    uv = jnp.asarray(rng.uniform(1, 400, (K, K, N, P, 2)), jnp.float32)

    # 1. production pattern: vmap over target axis j
    def sample_target(pk, uv_t):
        return sample_packed(pk, uv_t, H, W)

    prod = jax.jit(lambda pk, u: jax.vmap(
        sample_target, in_axes=(0, 1), out_axes=1)(pk, u))
    print(f"1. vmapped sample_packed [K,K,N,P]: {timeit(prod, packed, uv):7.2f} ms")

    # 2. flat single-table gather of the same row count (lower bound)
    base = jnp.asarray(rng.integers(0, HW - W - 2, K * K * N * P), jnp.int32)
    flat1 = jax.jit(lambda pk, b: jnp.take(pk[0], b, axis=0))
    print(f"2. flat take same rows, 1 table:    {timeit(flat1, packed, base):7.2f} ms")

    # 3. batched take via fused index into a reshaped [K*HW, 12] table
    def fused(pk, u):
        x = u[..., 0]
        y = u[..., 1]
        ix = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        iy = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        b = iy * W + ix                                  # [K,K,N,P], target=j
        j = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
        rows = jnp.take(pk.reshape(K * HW, 12), b + j * HW, axis=0)
        return rows

    fz = jax.jit(fused)
    print(f"3. flat take via j*HW index fold:   {timeit(fz, packed, uv):7.2f} ms")

    # 4. index/weight arithmetic alone (no gather)
    def arith(u):
        x = u[..., 0]
        y = u[..., 1]
        ix = jnp.floor(x)
        iy = jnp.floor(y)
        fx = x - ix
        fy = y - iy
        w00 = (1 - fx) * (1 - fy)
        w01 = fx * (1 - fy)
        w10 = (1 - fx) * fy
        w11 = fx * fy
        return jnp.stack([w00, w01, w10, w11], -1).sum()

    ar = jax.jit(arith)
    print(f"4. index/weight arithmetic alone:   {timeit(ar, uv):7.2f} ms")

    # 5. full path but with fold-trick gather + einsum blend
    def fused_full(pk, u):
        rows = fused(pk, u).reshape(u.shape[:-1] + (4, 3))
        x = u[..., 0]
        y = u[..., 1]
        fx = x - jnp.floor(x)
        fy = y - jnp.floor(y)
        wts = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                         (1 - fx) * fy, fx * fy], -1)
        return jnp.einsum("...kc,...k->...c", rows, wts)

    ff = jax.jit(fused_full)
    print(f"5. fold-gather + bilinear einsum:   {timeit(ff, packed, uv):7.2f} ms")


if __name__ == "__main__":
    main()
