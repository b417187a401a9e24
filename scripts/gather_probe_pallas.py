"""Pallas gather-kernel design probes (VERDICT r3 item 1).

Compares strategies for the BA residual gather at the standart.yaml
operating point: ~200k scattered row fetches from K=10 corner-packed
[H*W, 12] tables per LM iteration (PERF.md: XLA packed gather ~6 ms/iter,
~55% of each BA iteration; effective bandwidth ~1 GB/s — latency-bound).

Candidate designs measured here on the real chip:
  A. XLA packed row gather, f32 (current production path — baseline)
  B. XLA packed row gather, bf16 table
  C. Pallas: whole table resident in VMEM (bf16), per-sample fori loop
  D. Pallas: VMEM table + unrolled 8-wide inner loop
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 480, 640
HW = H * W
M = 204800          # samples per evaluate (~K*K*N*P at standart scale)
ROWW = 12


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


# ---------------------------------------------------------------------------
# C/D: VMEM-resident table kernel
# ---------------------------------------------------------------------------

def _vmem_gather_kernel(idx_ref, table_ref, out_ref, *, block, unroll):
    def body(i, _):
        for u in range(unroll):
            j = i * unroll + u
            row = idx_ref[j]
            out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(row, 1), :]
        return 0
    jax.lax.fori_loop(0, block // unroll, body, 0)


def make_vmem_gather(block, unroll, dtype):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // block,),
        in_specs=[pl.BlockSpec((HW, ROWW), lambda i, idx: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, ROWW), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            functools.partial(_vmem_gather_kernel, block=block, unroll=unroll),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, ROWW), dtype),
        )(idx, table)

    return run


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((HW, ROWW)), jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, HW - W - 2, M), jnp.int32)

    ga = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    print(f"A. XLA take f32  [{M}x{ROWW}]: {timeit(ga, table, idx):7.2f} ms")
    print(f"B. XLA take bf16 [{M}x{ROWW}]: {timeit(ga, table_bf, idx):7.2f} ms")

    for block, unroll in [(2048, 1), (2048, 8), (8192, 8)]:
        try:
            f = make_vmem_gather(block, unroll, jnp.bfloat16)
            ms = timeit(f, idx, table_bf, reps=10)
            ok = np.allclose(np.asarray(f(idx, table_bf), np.float32),
                             np.asarray(jnp.take(table_bf, idx, axis=0),
                                        np.float32))
            print(f"C/D. pallas VMEM block={block} unroll={unroll}: "
                  f"{ms:7.2f} ms  (correct={ok})")
        except Exception as e:  # noqa: BLE001
            print(f"C/D. pallas VMEM block={block} unroll={unroll}: "
                  f"FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
