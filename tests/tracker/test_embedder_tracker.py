"""C>1 frame-embedder through the FULL tracker pipeline.

Parity model: the reference's FRAME_EMBEDDER MonocularTracker instantiation
(monocular_tracker.cpp:539-549) — embedded C-channel pixel maps feed the
photometric-BA window (local_frame.hpp:174-221 8C residual blocks) while
the frontend alignment and the epipolar tracer stay C=1
(monocular_tracker.hpp:58-60, monocular_tracker.cpp:470).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.features.embedder import make_embedder
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

NUM_FRAMES = 22
INIT = 6
H, W = 120, 160

CFG = TrackerConfig(
    num_frame_slots=7, landmarks_per_frame=128, immature_per_frame=256,
    desired_points=600, frontend_points=800, keyframe_factor=3.0,
    window_min=2, window_max=3, use_rotation_perturbations=False,
    embedder="filter_bank")


def _run(cfg):
    seq = render_sequence(num_frames=NUM_FRAMES, height=H, width=W)
    tr = MonocularTracker(seq.camera, cfg, dtype=jnp.float64)
    tr.initialize([
        (i, float(seq.timestamps[i]), seq.images[i],
         SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
             jnp.asarray(seq.pose_t_wc(i).t, jnp.float64)))
        for i in range(INIT)])
    errs = []
    for i in range(INIT, NUM_FRAMES):
        out = tr.tick(i, float(seq.timestamps[i]), seq.images[i])
        gt = seq.pose_t_wc(i)
        errs.append(float(jnp.linalg.norm(out["pose"].t - jnp.asarray(gt.t))))
    return seq, tr, np.asarray(errs)


def test_c3_window_tracks_at_the_gate():
    """C=3 must track at near-C=1 accuracy on the same sequence.  Gated as
    a RATIO against the C=1 baseline: channel content shifts the absolute
    number with resolution/texture, but a correct C>1 path stays within a
    modest factor of the intensity-only run (three identical channels are
    measured at C=1 parity — the machinery is exact)."""
    seq, tr, errs = _run(CFG)
    assert tr.window.num_channels == 3
    assert tr.window.lm_patch.shape[-1] == 3 * 8
    n_active = int(jnp.sum(tr.window.lm_valid & ~tr.window.lm_outlier))
    assert n_active > 100, f"only {n_active} active C=3 landmarks"
    rmse = float(np.sqrt((errs ** 2).mean()))
    assert len(tr.track.marginalized) >= 1  # C=3 marginalization fold ran

    import dataclasses

    _, _, errs1 = _run(dataclasses.replace(CFG, embedder="identity"))
    rmse1 = float(np.sqrt((errs1 ** 2).mean()))
    assert rmse < max(1.5 * rmse1, rmse1 + 1e-2), (
        f"C=3 RMSE {rmse:.4f} m vs C=1 {rmse1:.4f} m")


def test_activation_samples_embedded_reference_patches():
    """The C-channel patches stored at activation must equal direct bilinear
    samples of the embedder output at the landmark positions."""
    seq, tr, _ = _run(CFG)
    from dsopp_tpu.core.interpolate import build_pixel_map, sample
    from dsopp_tpu.core.pattern import shift_pattern
    from dsopp_tpu.tracker.activation import embedded_patches

    win = tr.window
    k = win.num_slots
    pats = embedded_patches(win, win.lm_uv)
    emb = make_embedder("filter_bank")
    for pos in range(win.frame_count()):
        live = np.asarray(win.lm_valid[pos])
        if not live.any():
            continue
        channels = emb(win.maps[pos][0])
        uv = win.lm_uv[pos][live]
        for c in range(3):
            pm = build_pixel_map(channels[c])
            vals, _ = sample(pm, shift_pattern(uv))
            got = np.asarray(pats[pos][live][:, c * 8:(c + 1) * 8])
            np.testing.assert_allclose(got, np.asarray(vals[..., 0]),
                                       rtol=0, atol=1e-9)
        break


def test_yaml_frame_embedder_runs_device_loop(tmp_path):
    """A YAML config with a frame_embedder section must run the DEVICE loop
    end-to-end at C=3 (VERDICT r4 item 5)."""
    import cv2

    from dsopp_tpu.config import build_application, load_config
    from dsopp_tpu.output.tum import export_tum

    seq = render_sequence(num_frames=18, height=96, width=128)
    d = tmp_path
    (d / "images").mkdir()
    for i in range(18):
        cv2.imwrite(str(d / "images" / f"{i}.png"),
                    np.clip(np.asarray(seq.images[i]), 0, 255).astype(np.uint8))
    with open(d / "times.txt", "w") as f:
        for i in range(18):
            f.write(f"{i} {float(seq.timestamps[i]):.6f}\n")
    fx = float(seq.camera.fx)
    with open(d / "calib.txt", "w") as f:
        f.write(f"pinhole\n128 96\n{fx} {fx} 63.5 47.5\n")
    export_tum(str(d / "init.tum"),
               [(float(seq.timestamps[i]),
                 np.asarray(seq.pose_t_wc(i).matrix(), np.float64))
                for i in range(6)])
    with open(d / "mono.yaml", "w") as f:
        f.write("""
sensors:
  - id: camera_1
    type: camera
    provider: {type: image_folder, folder: "images", timestamps: "times.txt"}
    model: {calibration: "calib.txt"}
    frame_embedder: {type: filter_bank}
time: {type: no_synchronization}
tracker:
  type: monocular
  sensor_id: camera_1
  number_of_desired_points: 400
  keyframe_strategy: {strategy: mean_square_optical_flow, factor: 3.0}
  marginalization_strategy: {strategy: sparse, minimum_size: 3, maximum_size: 4}
initializer: {type: precalculated, poses_file: "init.tum", num_frames: 6}
""")
    config = load_config(str(d / "mono.yaml"))
    app = build_application(config, str(d))
    assert app.tracker.window.num_channels == 3
    n = app.run(max_frames=18)
    app.finish()
    assert n == 18
    assert app.tracker.num_keyframes >= 3
    assert bool(jnp.all(jnp.isfinite(app.tracker.window.eps)))
