"""Semantic observations + semantic mask filtering (round-3 parity item).

Parity model: the reference attaches semantic observations to landmarks of
marginalized keyframes (reference: monocular_tracker.cpp:263-305
``addSemanticObservations``; landmark.proto:12 ``semantic_type_id``) and
filters configured classes out of the candidate mask
(camera_mask.hpp ``filterSemanticObjects``).  Here one class id is sampled
per landmark from its host keyframe's class-id image at marginalization
time (single observation instead of the reference's per-frame vote).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

H, W = 120, 160
NUM_FRAMES = 24
INIT_FRAMES = 8

CFG = TrackerConfig(
    num_frame_slots=7, landmarks_per_frame=100, immature_per_frame=250,
    desired_points=400, frontend_points=600, keyframe_factor=3.0,
    window_min=3, window_max=4, use_rotation_perturbations=False)


def _semantic_image():
    """Class 7 on the left half, class 3 on the right."""
    sem = np.full((H, W), 3, np.uint8)
    sem[:, : W // 2] = 7
    return sem


@pytest.fixture(scope="module")
def tracked():
    seq = render_sequence(num_frames=NUM_FRAMES, height=H, width=W,
                          focal=130.0, advance=0.06)
    tracker = MonocularTracker(seq.camera, CFG, dtype=jnp.float64)
    sem = _semantic_image()
    init = [
        (i, float(seq.timestamps[i]), seq.images[i],
         SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
             jnp.asarray(seq.pose_t_wc(i).t, jnp.float64)))
        for i in range(INIT_FRAMES)
    ]
    # initialize() has no semantics hook; feed them via tick-level replay
    for idx, (fid, ts, img, pose) in enumerate(init):
        tracker.tick(fid, ts, img, known_pose=pose,
                     force_keyframe=(idx == len(init) - 1), semantics=sem)
    for i in range(INIT_FRAMES, NUM_FRAMES):
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i],
                     semantics=sem)
    return tracker


def test_semantics_attached_on_marginalization(tracked):
    margs = tracked.track.marginalized
    assert len(margs) >= 1, "no marginalized keyframes in run"
    kf = margs[0]
    assert kf.lm_semantic is not None
    valid = np.asarray(kf.lm_valid)
    sem = np.asarray(kf.lm_semantic)[valid]
    uv = np.asarray(kf.lm_uv)[valid]
    # class follows the image half the landmark sits in
    expect = np.where(uv[:, 0] < W // 2, 7, 3)
    np.testing.assert_array_equal(sem, expect)


def test_semantics_roundtrip_in_track_bin(tracked, tmp_path):
    from dsopp_tpu.output.protobuf_track import load_track_bin, save_track_bin

    path = str(tmp_path / "track.bin")
    save_track_bin(path, tracked.track, tracked.window,
                   camera=tracked.camera)
    loaded = load_track_bin(path)
    margs = tracked.track.marginalized
    kf0 = loaded["keyframes"][0]
    pts = kf0["landmarks"][0]["points"]
    want = np.asarray(margs[0].lm_semantic)[
        np.asarray(margs[0].lm_valid) & ~np.asarray(margs[0].lm_outlier)]
    got = np.asarray([p["semantic"] for p in pts])
    np.testing.assert_array_equal(got, want)
    assert set(got) <= {3, 7} and len(got) > 0


def test_semantic_filter_masks_candidates():
    seq = render_sequence(num_frames=12, height=H, width=W, focal=130.0,
                          advance=0.06)
    tracker = MonocularTracker(seq.camera, CFG, dtype=jnp.float64)
    tracker.semantic_filter = (7,)   # mask the left-half class out
    sem = _semantic_image()
    for i in range(10):
        pose = SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
                   jnp.asarray(seq.pose_t_wc(i).t, jnp.float64))
        tracker.tick(i, float(seq.timestamps[i]), seq.images[i],
                     known_pose=pose, force_keyframe=(i == 9), semantics=sem)
    imm_uv = np.asarray(tracker.immature.uv)
    imm_valid = np.asarray(tracker.immature.valid)
    assert imm_valid.any()
    assert np.all(imm_uv[imm_valid][:, 0] >= W // 2), (
        "candidate extracted inside the semantically filtered class")
