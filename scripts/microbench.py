"""Component microbenchmarks on the real chip (VERDICT r1 item 1/8).

Times each stage of the per-frame pipeline in isolation at the reference
operating point (640x480, K=9 slots, N=320 landmarks/slot, 2000 frontend
points), plus gather-strategy probes that steer the Pallas sampling kernel
design (scattered XLA take vs one-hot MXU matmul).

Mirrors the role of the reference microbenchmark suite
(/root/reference/test/performance/benchmarks/energy/...benchmark.cpp).
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


def timeit(fn, *args, reps=50, warmup=2):
    # hard barrier: block_until_ready does NOT block on the tunneled axon
    # device (see scripts/truebench.py) — fetch one scalar instead
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps * 1e3  # ms


def main():
    from dsopp_tpu.core.camera import Pinhole
    from dsopp_tpu.core.lie import SE3
    from dsopp_tpu.features.pyramid import build_pyramid_maps
    from dsopp_tpu.solvers.pba import PBAOptions, _solve_loop_device
    from dsopp_tpu.solvers.pose_alignment import (
        AlignmentOptions, LevelPoints, align_level)

    H, W = 480, 640
    NPTS = 2000
    NHYP = 5
    rng = np.random.default_rng(0)

    img = jnp.asarray(rng.standard_normal((H, W)) * 40 + 128, jnp.float32)

    f = jax.jit(lambda im: build_pyramid_maps(im, 5))
    print(f"pyramid(5 lvls, 640x480):      {timeit(f, img):7.2f} ms")

    maps0 = f(img)[0]

    # ---- align_level x 5 hypotheses -----------------------------------
    cam = Pinhole.create((float(W), float(H)), (520.0, 520.0),
                         (W / 2 - 0.5, H / 2 - 0.5), jnp.float32)
    uv = jnp.asarray(
        rng.uniform((8, 8), (W - 9, H - 9), size=(NPTS, 2)), jnp.float32)
    pts = LevelPoints(
        uv=uv,
        idepth=jnp.asarray(rng.uniform(0.2, 2.0, NPTS), jnp.float32),
        intensity=jnp.asarray(rng.uniform(60, 200, NPTS), jnp.float32),
        valid=jnp.ones(NPTS, bool))
    opts = AlignmentOptions()
    tq = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (NHYP, 1))
    tt = jnp.asarray(rng.normal(0, 0.01, (NHYP, 3)), jnp.float32)
    ab = jnp.zeros((NHYP, 2), jnp.float32)

    av = jax.jit(jax.vmap(lambda q, t, a: align_level(
        pts, maps0, cam, SE3(q, t), a, jnp.zeros(2, jnp.float32), 1.0, opts)))
    print(f"align_level L0 (2000pts,5hyp): {timeit(av, tq, tt, ab):7.2f} ms")

    # one single GN iteration cost (residual+system, no loop)
    from dsopp_tpu.solvers.pose_alignment import _residual_system

    one = jax.jit(jax.vmap(lambda q, t, a: _residual_system(
        pts, maps0, cam, SE3(q, t), a, jnp.zeros(2, jnp.float32), 1.0, opts,
        True)))
    print(f"one GN system (2000x5):        {timeit(one, tq, tt, ab):7.2f} ms")

    # ---- depth estimation ----------------------------------------------
    from dsopp_tpu.tracker.depth_estimation import (
        estimate_depths, make_immature_points)

    K, NIMM = 9, 800
    uvi = jnp.asarray(
        rng.uniform((8, 8), (W - 9, H - 9), size=(K, NIMM, 2)), jnp.float32)
    patches = jnp.asarray(rng.uniform(60, 200, (K, NIMM, 8)), jnp.float32)
    grads = jnp.asarray(rng.normal(0, 10, (K, NIMM, 2)), jnp.float32)
    bank = jax.vmap(lambda u, p, g: make_immature_points(u, p, g))(
        uvi, patches, grads)
    t_rel = SE3(jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K, 1)),
                jnp.asarray(rng.normal(0, 0.05, (K, 3)), jnp.float32))
    affines = jnp.zeros((K, 2), jnp.float32)
    ed = jax.jit(jax.vmap(
        lambda b, tr_q, tr_t, af: estimate_depths(
            b, maps0, cam, SE3(tr_q, tr_t), af, jnp.zeros(2, jnp.float32),
            1.0, 20.0, 32),
    ))
    print(f"estimate_depths (9x800x32):    {timeit(ed, bank, t_rel.q, t_rel.t, affines):7.2f} ms")

    # ---- flow stats ------------------------------------------------------
    from dsopp_tpu.tracker.depth_map import mean_square_optical_flow

    idep = jnp.asarray(rng.uniform(0.2, 2.0, (H, W)), jnp.float32)
    wei = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
    fl = jax.jit(lambda i, w_, q, t: mean_square_optical_flow(
        i, w_, cam, SE3(q, t)))
    print(f"flow stat (full 640x480):      {timeit(fl, idep, wei, tq[0], tt[0]):7.2f} ms")

    # ---- PBA window solve -----------------------------------------------
    NLM = 320
    from dsopp_tpu.solvers.pba import empty_window
    import dataclasses

    win = empty_window(K, NLM, (3, H, W), jnp.float32)
    poses_t = jnp.asarray(rng.normal(0, 0.3, (K, 3)), jnp.float32)
    win = dataclasses.replace(
        win,
        t_lin_t=poses_t,
        frame_valid=jnp.ones(K, bool).at[-2:].set(False),
        frame_fixed=jnp.zeros(K, bool).at[0].set(True),
        frame_id=jnp.arange(K, dtype=jnp.int32),
        lm_uv=jnp.asarray(rng.uniform((8, 8), (W - 9, H - 9), (K, NLM, 2)), jnp.float32),
        lm_patch=jnp.asarray(rng.uniform(60, 200, (K, NLM, 8)), jnp.float32),
        lm_idepth=jnp.asarray(rng.uniform(0.2, 2.0, (K, NLM)), jnp.float32),
        lm_valid=jnp.ones((K, NLM), bool),
        maps=jnp.broadcast_to(
            jnp.stack([img, img * 0.1, img * 0.1]), (K, 3, H, W)).astype(jnp.float32) + 0.0,
    )
    popts = PBAOptions()
    sv = jax.jit(lambda w_: _solve_loop_device(w_, cam, popts))
    print(f"PBA solve loop (K=9,N=320):    {timeit(sv, win, reps=5):7.2f} ms")

    from dsopp_tpu.solvers.pba import _fej_cache, _linearize, _energy, active_lm_mask

    mask = active_lm_mask(win)
    fj = jax.jit(lambda w_: _fej_cache(w_, cam))
    print(f"  FEJ cache:                   {timeit(fj, win, reps=5):7.2f} ms")
    fej = fj(win)
    ln = jax.jit(lambda w_, f_: _linearize(
        w_, cam, f_, w_.eps, w_.lm_idepth, mask, popts))
    print(f"  linearize (1 iter):          {timeit(ln, win, fej, reps=5):7.2f} ms")
    en = jax.jit(lambda w_: _energy(w_, cam, w_.eps, w_.lm_idepth, mask, popts))
    print(f"  energy pass:                 {timeit(en, win, reps=5):7.2f} ms")

    # ---- gather strategy probes -----------------------------------------
    npix = H * W
    flat = jnp.asarray(rng.standard_normal((3, npix)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, npix - W - 2, (21600, 4)), jnp.int32)

    g1 = jax.jit(lambda fl_, ix: jnp.take(fl_, ix, axis=1))
    print(f"take 21.6kx4x3 of 480x640:     {timeit(g1, flat, idx):7.2f} ms")

    idx2 = jnp.asarray(rng.integers(0, npix - W - 2, (120000, 4)), jnp.int32)
    print(f"take 120kx4x3:                 {timeit(g1, flat, idx2):7.2f} ms")

    # one-hot row blend: A[N,H] @ img3[H, W*3]
    NP1 = 21600
    iy = jnp.asarray(rng.integers(0, H - 2, NP1), jnp.int32)
    fy = jnp.asarray(rng.uniform(0, 1, NP1), jnp.float32)
    img3 = jnp.asarray(rng.standard_normal((H, W * 3)), jnp.float32)

    def onehot_blend(iy_, fy_, im):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NP1, H), 1)
        a = jnp.where(rows == iy_[:, None], 1.0 - fy_[:, None], 0.0)
        a = a + jnp.where(rows == iy_[:, None] + 1, fy_[:, None], 0.0)
        return jnp.dot(a, im, preferred_element_type=jnp.float32)

    ob = jax.jit(onehot_blend)
    print(f"one-hot rowblend 21.6kx480x(640*3): {timeit(ob, iy, fy, img3, reps=5):7.2f} ms")


if __name__ == "__main__":
    main()
