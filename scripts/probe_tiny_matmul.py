"""Probe: tiny-dim einsum chains vs explicit elementwise expansion.

Hypothesis (r4): the BA/align hot paths are dominated NOT by gathers
(measured 0.06 ms) but by per-point Jacobian einsums with tiny contraction
dims ([...,2,3]x[...,3,6] over a 200k batch), which XLA lowers poorly.
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

from dsopp_tpu.core.camera import Pinhole  # noqa: E402
from dsopp_tpu.core.lie import SE3  # noqa: E402
from dsopp_tpu.core.reproject import reproject, reproject_jacobian  # noqa: E402

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
    H, W = 480, 640
    cam = Pinhole.create((float(W), float(H)), (520.0, 520.0),
                         (W / 2 - 0.5, H / 2 - 0.5), jnp.float32)
    uv = jnp.asarray(rng.uniform(8, 400, (K, 1, N, P, 2)), jnp.float32)
    idepth = jnp.asarray(rng.uniform(0.2, 2.0, (K, 1, N, 1)), jnp.float32)
    q = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                         (K, K, 1, 1, 4))
    t = jnp.asarray(rng.normal(0, 0.1, (K, K, 1, 1, 3)), jnp.float32)

    rj = jax.jit(lambda u, d, tq, tt: reproject_jacobian(
        cam, cam, u, d, SE3(tq, tt)))
    print(f"reproject_jacobian [K,K,N,P]: {timeit(rj, uv, idepth, q, t):7.2f} ms")

    rp = jax.jit(lambda u, d, tq, tt: reproject(cam, cam, u, d, SE3(tq, tt)))
    print(f"reproject (no jac) [K,K,N,P]: {timeit(rp, uv, idepth, q, t):7.2f} ms")

    # tiny-matmul einsum in isolation: [...,2,3] @ [...,3,6]
    a = jnp.asarray(rng.standard_normal((K, K, N, P, 2, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((K, K, N, P, 3, 6)), jnp.float32)

    f1 = jax.jit(lambda x, y: jnp.einsum("...ij,...jk->...ik", x, y))
    print(f"einsum [...,2,3]x[...,3,6]:   {timeit(f1, a, b):7.2f} ms")

    f2 = jax.jit(lambda x, y: jnp.sum(x[..., :, :, None] * y[..., None, :, :],
                                      axis=-2))
    print(f"mul+sum same contraction:     {timeit(f2, a, b):7.2f} ms")

    # explicit unrolled over the 3-dim
    def unrolled(x, y):
        return (x[..., :, 0, None] * y[..., None, 0, :]
                + x[..., :, 1, None] * y[..., None, 1, :]
                + x[..., :, 2, None] * y[..., None, 2, :])

    f3 = jax.jit(unrolled)
    print(f"unrolled 3-term expansion:    {timeit(f3, a, b):7.2f} ms")


if __name__ == "__main__":
    main()
