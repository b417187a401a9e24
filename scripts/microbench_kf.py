"""Keyframe-path microbench: where the ~185 ms keyframe tick goes.

Times, on the real chip at the reference operating point, the component
programs of the keyframe branch of ``device_tick``:
  * fused_keyframe_push (extract + activate + push + windowed BA),
  * the windowed BA solve loop alone,
  * marginalization flags + df64 ledger fold + slot permute,
  * frontend depth-map rebuild.

Complements scripts/microbench.py (regular-path components).
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


def timeit(fn, *args, reps=30, warmup=2, **kw):
    # hard barrier: block_until_ready does NOT block on the tunneled axon
    # device (see scripts/truebench.py) — fetch one scalar instead
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps * 1e3  # ms


def main():
    import dataclasses

    from dsopp_tpu.core.lie import SE3
    from dsopp_tpu.features.pyramid import build_pyramid_maps
    from dsopp_tpu.solvers.pba import _marginalize_device, _solve_loop_device
    from dsopp_tpu.testing import render_sequence
    from dsopp_tpu.tracker.depth_map import build_frontend_state
    from dsopp_tpu.tracker.device_loop import PipelinedTracker
    from dsopp_tpu.tracker.fused_keyframe import fused_keyframe_push
    from dsopp_tpu.tracker.marginalization import flags_device, kept_first_perm
    from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

    H, W, FOCAL = 480, 640, 520.0
    INIT = 6
    seq = render_sequence(num_frames=24, height=H, width=W, focal=FOCAL,
                          advance=0.08, backend="jax")
    from dsopp_tpu.core.camera import Pinhole

    cam = Pinhole.create((float(W), float(H)), (FOCAL, FOCAL),
                         (W / 2 - 0.5, H / 2 - 0.5), jnp.float32)
    cfg = TrackerConfig(
        num_frame_slots=9, landmarks_per_frame=320, immature_per_frame=800,
        desired_points=2000, frontend_points=2000, keyframe_factor=3.0,
        window_min=5, window_max=7, use_rotation_perturbations=False,
    )
    tracker = MonocularTracker(cam, cfg, dtype=jnp.float32)
    for i in range(INIT):
        pose = SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float32),
                   jnp.asarray(seq.pose_t_wc(i).t, jnp.float32))
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i],
                     known_pose=pose, force_keyframe=(i == INIT - 1))
    pipe = PipelinedTracker(tracker, flush_every=1000)
    # run a few frames so the window is full
    for j, i in enumerate(range(INIT, INIT + 10)):
        pipe.tick(i, float(seq.timestamps[i]), seq.images[i],
                  force_keyframe=(j % 3 == 2))
    jax.block_until_ready(pipe.state.window.eps)

    st = pipe.state
    dcfg = pipe.cfg
    models = pipe.models
    mask = pipe.mask
    win = st.window
    image = jnp.asarray(seq.images[INIT + 10], jnp.float32)

    maps = jax.jit(lambda im: build_pyramid_maps(im, dcfg.num_levels))(image)
    maps0 = maps[0]
    pose_q, pose_t = st.last_q, st.last_t
    affine = st.last_affine

    push = jax.jit(lambda w_, imm, m0: fused_keyframe_push(
        w_, models[0], imm, m0, pose_q, pose_t, affine,
        jnp.asarray(99, jnp.int32), st.min_distance, dcfg.pba_opts,
        dcfg.refine, dcfg.huber_sigma, dcfg.immature_per_frame, mask=mask))
    print(f"fused_keyframe_push (extract+activate+push+BA): "
          f"{timeit(push, win, st.immature, maps0, reps=5):7.2f} ms")

    solve = jax.jit(lambda w_: _solve_loop_device(w_, models[0], dcfg.pba_opts))
    print(f"  BA solve loop alone:          {timeit(solve, win, reps=5):7.2f} ms")

    kf_out = push(win, st.immature, maps0)
    win2 = kf_out.window
    imm_counts = jnp.sum(kf_out.immature.valid, axis=1)

    def marg(w_):
        frame_flags, lm_flags, new_outliers = flags_device(
            w_, imm_counts, dcfg.window_min, dcfg.window_max,
            dcfg.max_marg_fraction)
        w_ = dataclasses.replace(
            w_, lm_outlier=w_.lm_outlier | new_outliers,
            frame_marg=frame_flags, lm_marg_flag=lm_flags)
        perm = kept_first_perm(w_.frame_valid, frame_flags)
        return _marginalize_device(w_, models[0], perm, dcfg.pba_opts,
                                   True, True)
    print(f"marg flags + df64 fold + permute: "
          f"{timeit(jax.jit(marg), win2, reps=5):7.2f} ms")

    fr = jax.jit(lambda w_, mp: build_frontend_state(
        w_, models[0], mp, dcfg.height, dcfg.width, dcfg.num_levels,
        dcfg.frontend_points))
    print(f"frontend depth-map rebuild:     "
          f"{timeit(fr, win2, maps, reps=5):7.2f} ms")

    pyr = jax.jit(lambda im: build_pyramid_maps(im, dcfg.num_levels))
    print(f"pyramid maps (5 lvls):          {timeit(pyr, image):7.2f} ms")


if __name__ == "__main__":
    main()
