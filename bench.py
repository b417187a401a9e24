"""Benchmark: full direct-odometry pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

Operating point = the reference's standart.yaml
(/root/reference/test/test_data/tummono/standart.yaml): 640x480 frames,
2000 desired points, sparse-marginalization window 5..8
(marginalization_strategy.minimum_size/maximum_size), keyframe strategy
``mean_square_optical_flow`` with **factor 1.25** (standart.yaml:10-11),
7 BA iterations per keyframe, 5 pyramid levels, 8-pixel pattern.  FPS
semantics follow the reference's runtime meter
(/root/reference/src/dsopp/src/dsopp.cpp:45-73): tracked frames /
wall-clock over a stretch that includes keyframe ticks (activation +
windowed BA + marginalization), not just cheap regular frames.

Round-2 note: the r2 bench ran keyframe_factor=3.0 — 2.4x the reference's
keyframe cadence (measured 23% keyframe rate vs ~10% at factor 1.25) —
which over-paid the 188 ms keyframe tick per frame and under-reported
throughput vs the reference operating point.  r3 matches the YAML.

Pipeline under test: the fully device-resident loop
(dsopp_tpu/tracker/device_loop.py) — one XLA program per frame, async
dispatch, diagnostics drained in batches.  A per-stage breakdown
(synchronized per-frame latency split regular vs keyframe) is printed to
stderr; only the JSON line goes to stdout.

``vs_baseline``: the reference publishes no numbers (BASELINE.md) and the
C++ tree cannot be built here (Sophus/Ceres/Pangolin absent).  The proxy
is 30 frames/s — DSO-class direct odometry tracks in real time (30 Hz
camera rate) at 640x480 on desktop CPUs (Engel et al., arXiv:1607.02565
§evaluation), and this bench now runs at that same resolution/point
budget, so the proxy and the measurement are finally at the same
operating point.  Driver target: vs_baseline >= 5.
"""

import json
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

REFERENCE_FPS = 30.0  # see module docstring

HEIGHT, WIDTH, FOCAL = 480, 640, 520.0
NUM_FRAMES = 120      # long enough for the 8-KF window to fill + overflow
INIT_FRAMES = 6


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from dsopp_tpu.core.camera import Pinhole
    from dsopp_tpu.core.lie import SE3
    from dsopp_tpu.testing import render_sequence
    from dsopp_tpu.tracker.device_loop import PipelinedTracker
    from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

    t0 = time.time()
    seq = render_sequence(num_frames=NUM_FRAMES, height=HEIGHT, width=WIDTH,
                          focal=FOCAL, advance=0.08, backend="jax")
    log(f"render: {time.time()-t0:.1f}s")

    cam = Pinhole.create((float(WIDTH), float(HEIGHT)), (FOCAL, FOCAL),
                         (WIDTH / 2 - 0.5, HEIGHT / 2 - 0.5), jnp.float32)
    cfg = TrackerConfig(
        num_frame_slots=10,           # window_max + 2 (device-loop invariant)
        landmarks_per_frame=250,      # 250*8 slots = 2000 active points
        immature_per_frame=800,
        desired_points=2000,
        frontend_points=2000,
        keyframe_factor=1.25,         # standart.yaml keyframe_strategy.factor
        window_min=5,                 # marginalization_strategy.minimum_size
        window_max=8,                 # marginalization_strategy.maximum_size
        use_rotation_perturbations=False,
    )
    tracker = MonocularTracker(cam, cfg, dtype=jnp.float32)

    for i in range(INIT_FRAMES):
        pose = SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float32),
                   jnp.asarray(seq.pose_t_wc(i).t, jnp.float32))
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i],
                     known_pose=pose, force_keyframe=(i == INIT_FRAMES - 1))

    images = [jnp.asarray(seq.images[i], jnp.float32)
              for i in range(INIT_FRAMES, NUM_FRAMES)]
    for img in images:
        jax.block_until_ready(img)

    # ---- warm-up: compile both device-tick branches ---------------------
    pipe = PipelinedTracker(tracker, flush_every=1000)
    t0 = time.time()
    pipe.tick(INIT_FRAMES, float(seq.timestamps[INIT_FRAMES]), images[0])
    jax.block_until_ready(pipe.state.window.eps)
    log(f"compile regular branch: {time.time()-t0:.1f}s")
    t0 = time.time()
    pipe.tick(INIT_FRAMES + 1, float(seq.timestamps[INIT_FRAMES + 1]),
              images[1], force_keyframe=True)
    jax.block_until_ready(pipe.state.window.eps)
    log(f"compile keyframe branch: {time.time()-t0:.1f}s")

    # ---- per-stage breakdown (synchronized; stderr only) -----------------
    lat, kf_flags = [], []
    for j, i in enumerate(range(INIT_FRAMES + 2, min(INIT_FRAMES + 26, NUM_FRAMES))):
        t0 = time.time()
        pipe.tick(i, float(seq.timestamps[i]), images[j + 2])
        jax.block_until_ready(pipe.state.window.eps)
        lat.append(time.time() - t0)
        kf_flags.append(bool(jax.device_get(pipe.pending[-1][2].is_keyframe)))
    reg = [d for d, k in zip(lat, kf_flags) if not k]
    kfs = [d for d, k in zip(lat, kf_flags) if k]
    if reg:
        log(f"stage regular-frame tick: n={len(reg)} "
            f"p50={np.percentile(reg, 50)*1e3:.1f}ms")
    if kfs:
        log(f"stage keyframe tick (push+BA+marg+depth-maps): n={len(kfs)} "
            f"p50={np.percentile(kfs, 50)*1e3:.1f}ms")

    # ---- steady-state pipelined throughput (the metric) ------------------
    pipe2 = PipelinedTracker(tracker, flush_every=1000)
    pipe2.tick(INIT_FRAMES, float(seq.timestamps[INIT_FRAMES]), images[0])
    jax.block_until_ready(pipe2.state.window.eps)
    t0 = time.time()
    n = 0
    for j, i in enumerate(range(INIT_FRAMES + 1, NUM_FRAMES)):
        pipe2.tick(i, float(seq.timestamps[i]), images[j + 1])
        n += 1
    jax.block_until_ready(pipe2.state.window.eps)
    elapsed = time.time() - t0
    n_kf = int(np.sum(jax.device_get(
        [d.is_keyframe for (_, _, d) in pipe2.pending])))
    log(f"steady state: {n} frames ({n_kf} keyframes) in {elapsed:.2f}s")

    fps = n / elapsed
    print(json.dumps({
        "metric": "vga_2000pt_w8_pipeline_throughput",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
