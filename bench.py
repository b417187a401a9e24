"""Benchmark: full direct-odometry pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

Protocol: render the synthetic GT corridor (the track30seconds stand-in),
bootstrap the tracker with 6 precalculated poses, warm every jitted program
by tracking a few frames (first-compile cost on remote-attached chips is
minutes; a persistent compilation cache amortizes across runs), then time a
steady-state tracking stretch covering regular frames AND keyframes
(activation + windowed BA + marginalization).

``vs_baseline``: the reference (RoadlyInc/DSOPP) publishes no numbers
(BASELINE.md); DSO-class CPU implementations track in real time at ~30
frames/s on desktop CPUs at this resolution, so 30 f/s is used as the
reference point until the C++ baseline can be measured directly.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

REFERENCE_FPS = 30.0  # see module docstring

NUM_FRAMES = 64
INIT_FRAMES = 6
WARM_FRAMES = 12      # frames after init used purely for compile warm-up


def main():
    from dsopp_tpu.core.camera import Pinhole
    from dsopp_tpu.core.lie import SE3
    from dsopp_tpu.testing import render_sequence
    from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

    seq = render_sequence(num_frames=NUM_FRAMES, height=240, width=320)
    cam = Pinhole.create((320.0, 240.0), (260.0, 260.0), (159.5, 119.5),
                         jnp.float32)
    cfg = TrackerConfig(
        num_frame_slots=8,
        landmarks_per_frame=256,
        immature_per_frame=512,
        desired_points=1500,
        frontend_points=2000,
        keyframe_factor=3.0,
        window_min=4,
        window_max=6,
        use_rotation_perturbations=False,
    )
    tracker = MonocularTracker(cam, cfg, dtype=jnp.float32)

    for i in range(INIT_FRAMES):
        pose = SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float32),
                   jnp.asarray(seq.pose_t_wc(i).t, jnp.float32))
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i],
                     known_pose=pose, force_keyframe=(i == INIT_FRAMES - 1))

    warm_end = INIT_FRAMES + WARM_FRAMES
    for i in range(INIT_FRAMES, warm_end):
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i])

    # pre-convert images so host rendering isn't timed
    images = [jnp.asarray(seq.images[i], jnp.float32)
              for i in range(warm_end, NUM_FRAMES)]
    for img in images:
        jax.block_until_ready(img)

    t0 = time.time()
    n = 0
    for i, img in zip(range(warm_end, NUM_FRAMES), images):
        tracker.tick(i, float(seq.timestamps[i]), img)
        n += 1
    jax.block_until_ready(tracker.window.eps)
    elapsed = time.time() - t0

    fps = n / elapsed
    print(json.dumps({
        "metric": "synthetic_240p_pipeline_throughput",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
