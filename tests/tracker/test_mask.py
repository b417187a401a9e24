"""CameraMask in the tracking path (round-3 parity item).

Parity model: the reference consults the mask during candidate extraction
(reference: src/sensors/camera_calibration/mask/camera_mask.hpp:21-117;
eigen_tracking_features_extractor.cpp checks ``mask.valid(point)``), so no
immature point, and hence no landmark, is ever born inside a masked region.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.features.extractor import select_candidates
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

H, W = 120, 160


def _mask_left_half():
    mask = np.ones((H, W), bool)
    mask[:, : W // 2] = False  # left half invalid
    return jnp.asarray(mask)


def test_select_candidates_respects_mask():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    pm = jnp.stack([img,
                    jnp.asarray(rng.normal(0, 20, (H, W)), jnp.float32),
                    jnp.asarray(rng.normal(0, 20, (H, W)), jnp.float32)])
    cands = select_candidates(pm, 200, mask=_mask_left_half())
    uv = np.asarray(cands.uv)[np.asarray(cands.valid)]
    assert uv.shape[0] > 0
    assert np.all(uv[:, 0] >= W // 2), "candidate selected inside masked region"


def test_tracker_never_places_points_in_masked_region():
    seq = render_sequence(num_frames=20, height=H, width=W, focal=130.0,
                          advance=0.06)
    cfg = TrackerConfig(
        num_frame_slots=7, landmarks_per_frame=100, immature_per_frame=250,
        desired_points=400, frontend_points=600, keyframe_factor=3.0,
        window_min=3, window_max=5, use_rotation_perturbations=False)
    mask = _mask_left_half()
    tracker = MonocularTracker(seq.camera, cfg, dtype=jnp.float64, mask=mask)
    init = [
        (i, float(seq.timestamps[i]), seq.images[i],
         SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
             jnp.asarray(seq.pose_t_wc(i).t, jnp.float64)))
        for i in range(8)
    ]
    tracker.initialize(init)
    for i in range(8, 20):
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i])

    # immature banks: every valid point sits in the allowed half
    imm_uv = np.asarray(tracker.immature.uv)
    imm_valid = np.asarray(tracker.immature.valid)
    assert imm_valid.any()
    assert np.all(imm_uv[imm_valid][:, 0] >= W // 2)

    # active landmarks too (born from immature candidates)
    lm_uv = np.asarray(tracker.window.lm_uv)
    lm_valid = np.asarray(tracker.window.lm_valid)
    assert lm_valid.any()
    assert np.all(lm_uv[lm_valid][:, 0] >= W // 2)
