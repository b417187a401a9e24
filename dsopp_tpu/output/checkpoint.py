"""Checkpoint / resume of the live tracker state.

The reference only checkpoints the exported track (ProtobufExporter every
``save_stride`` keyframes) and cannot resume the live optimizer
(SURVEY §5).  Here the FULL tracker state — the PBA window (including the
float64 marginalization ledger), immature banks, frontend state and track
history — round-trips through a single ``.npz``, so a run can continue
exactly where it stopped.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np


_WINDOW_FIELDS = [
    "t_lin_q", "t_lin_t", "affine0", "eps", "exposure", "frame_valid",
    "frame_fixed", "frame_marg", "frame_id", "lm_uv", "lm_patch",
    "lm_idepth", "lm_valid", "lm_marg_flag", "lm_outlier", "lm_inliers",
    "lm_opt_count", "lm_baseline", "res_status", "h_marg", "b_marg",
    "energy_marg", "h_marg_lo", "b_marg_lo", "energy_marg_lo", "maps",
    "patch_map",
]
# The [K, C·H·W, 128] patch table is ~100×-redundant derived data (≈1.5 GB
# at VGA/K=10) — checkpoints store only the compact [K, C, H, W] source
# planes and rebuild the table on load.  The center pixel of each row's
# 10×10 window sits at lane PATCH_LO·PATCH_WIN + PATCH_LO, so the planes
# are recovered from the table itself without threading the embedder
# through the save path.
_IMM_FIELDS = [
    "uv", "patch", "gradient", "idepth_min", "idepth_max", "status",
    "traced", "uniqueness", "search_interval", "valid",
]


def save_checkpoint(path, tracker):
    """Serialize a MonocularTracker to ``path`` (.npz)."""
    import jax.numpy as jnp

    from dsopp_tpu.ops.patch import PATCH_LO, PATCH_WIN

    arrays = {}
    for f in _WINDOW_FIELDS:
        arrays[f"window_{f}"] = np.asarray(getattr(tracker.window, f))
    win = tracker.window
    k = win.num_slots
    c = win.num_channels
    h, w = win.maps.shape[-2:]
    center_lane = PATCH_LO * PATCH_WIN + PATCH_LO
    arrays["window_patch_channels"] = np.asarray(
        win.patch[:, :, center_lane]).reshape(k, c, h, w)
    if tracker.immature is not None:
        for f in _IMM_FIELDS:
            arrays[f"imm_{f}"] = np.asarray(getattr(tracker.immature, f))
    if tracker.depth_maps is not None:
        idep, wei = tracker.depth_maps
        for lvl, (i, w) in enumerate(zip(idep, wei)):
            arrays[f"dmap_i_{lvl}"] = np.asarray(i)
            arrays[f"dmap_w_{lvl}"] = np.asarray(w)

    track = tracker.track
    meta = {
        "num_keyframes": tracker.num_keyframes,
        "rmse_last": tracker.rmse_last,
        "last_affine": np.asarray(tracker.last_affine).tolist(),
        "t_w_last": None if tracker.t_w_last is None else
            [np.asarray(tracker.t_w_last.q).tolist(),
             np.asarray(tracker.t_w_last.t).tolist()],
        "t_prev_rel": [np.asarray(tracker.t_prev_rel.q).tolist(),
                       np.asarray(tracker.t_prev_rel.t).tolist()],
        "min_distance": tracker.activator.min_distance_to_neighbor,
        "keyframe_timestamps": {str(k): v for k, v in
                                track.keyframe_timestamps.items()},
        "num_levels": 0 if tracker.depth_maps is None else len(tracker.depth_maps[0]),
        "keyframe_rmse": tracker.keyframe_strategy._rmse,
    }
    # track history: marginalized keyframes + attached frames
    marg = []
    for kf in track.marginalized:
        marg.append({
            "frame_id": kf.frame_id, "timestamp": kf.timestamp,
            "exposure": kf.exposure,
            "attached": [
                {"frame_id": a.frame_id, "timestamp": a.timestamp,
                 "keyframe_id": a.keyframe_id, "exposure": a.exposure}
                for a in kf.attached],
        })
    meta["marginalized"] = marg
    arrays["marg_t_wc"] = np.stack(
        [kf.t_wc for kf in track.marginalized]) if track.marginalized \
        else np.zeros((0, 4, 4))
    arrays["marg_affine"] = np.stack(
        [kf.affine for kf in track.marginalized]) if track.marginalized \
        else np.zeros((0, 2))
    for i, kf in enumerate(track.marginalized):
        arrays[f"marg_lm_{i}_uv"] = kf.lm_uv
        arrays[f"marg_lm_{i}_idepth"] = kf.lm_idepth
        arrays[f"marg_lm_{i}_valid"] = kf.lm_valid
        arrays[f"marg_lm_{i}_outlier"] = kf.lm_outlier
        arrays[f"marg_lm_{i}_baseline"] = kf.lm_baseline
        for j, a in enumerate(kf.attached):
            arrays[f"marg_att_{i}_{j}"] = a.t_keyframe_frame
    att_live = []
    for kf_id, frames in track.attached.items():
        for j, a in enumerate(frames):
            arrays[f"live_att_{kf_id}_{j}"] = a.t_keyframe_frame
            att_live.append({"keyframe_id": kf_id, "frame_id": a.frame_id,
                             "timestamp": a.timestamp, "j": j,
                             "exposure": a.exposure})
    meta["live_attached"] = att_live

    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_checkpoint(path, camera, config=None, dtype=None):
    """Reconstruct a MonocularTracker from a checkpoint."""
    import jax.numpy as jnp

    from dsopp_tpu.core.lie import SE3
    from dsopp_tpu.solvers.pba import Window
    from dsopp_tpu.track.state import AttachedFrame, MarginalizedKeyframe
    from dsopp_tpu.tracker.depth_estimation import ImmaturePoints
    from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    dtype = jnp.float32 if dtype is None else dtype

    from dsopp_tpu.ops.patch import pack_patch_table_c

    fields = {f: jnp.asarray(data[f"window_{f}"]) for f in _WINDOW_FIELDS}
    if "window_patch" in data:        # r4-era checkpoint with the full table
        fields["patch"] = jnp.asarray(data["window_patch"])
    else:
        planes = jnp.asarray(data["window_patch_channels"])   # [K, C, H, W]
        fields["patch"] = jnp.stack(
            [pack_patch_table_c(ch) for ch in planes])
    window = Window(**fields)
    k, n_imm = window.num_slots, None

    tracker = MonocularTracker(
        camera,
        config or TrackerConfig(
            num_frame_slots=window.num_slots,
            landmarks_per_frame=window.num_landmark_slots),
        dtype=dtype,
        image_shape=tuple(window.maps.shape[-2:]))
    tracker.window = window
    if "imm_uv" in data:
        tracker.immature = ImmaturePoints(**{
            f: jnp.asarray(data[f"imm_{f}"]) for f in _IMM_FIELDS})
    nl = meta["num_levels"]
    if nl:
        tracker.depth_maps = (
            tuple(jnp.asarray(data[f"dmap_i_{l}"]) for l in range(nl)),
            tuple(jnp.asarray(data[f"dmap_w_{l}"]) for l in range(nl)))
        # rebuild frontend level points from the newest keyframe's map
        from dsopp_tpu.tracker.depth_map import depth_map_level_points
        from dsopp_tpu.features.pyramid import build_pyramid_maps

        newest = window.frame_count() - 1
        maps = build_pyramid_maps(window.maps[newest][0], nl)
        tracker.level_points = [
            depth_map_level_points(
                tracker.depth_maps[0][l], tracker.depth_maps[1][l],
                maps[l], tracker.config.frontend_points)
            for l in range(nl)]
        from dsopp_tpu.tracker.depth_map import FLOW_CAP

        tracker.flow_points = depth_map_level_points(
            tracker.depth_maps[0][0], tracker.depth_maps[1][0],
            maps[0], FLOW_CAP)

    tracker.num_keyframes = meta["num_keyframes"]
    tracker.rmse_last = meta["rmse_last"]
    tracker.last_affine = jnp.asarray(meta["last_affine"], dtype)
    if meta["t_w_last"] is not None:
        tracker.t_w_last = SE3(jnp.asarray(meta["t_w_last"][0], dtype),
                               jnp.asarray(meta["t_w_last"][1], dtype))
    tracker.t_prev_rel = SE3(jnp.asarray(meta["t_prev_rel"][0], dtype),
                             jnp.asarray(meta["t_prev_rel"][1], dtype))
    tracker.activator.min_distance_to_neighbor = meta["min_distance"]
    tracker.keyframe_strategy._rmse = meta["keyframe_rmse"]
    tracker.track.keyframe_timestamps = {
        int(k): v for k, v in meta["keyframe_timestamps"].items()}

    for i, kfm in enumerate(meta["marginalized"]):
        attached = [
            AttachedFrame(a["frame_id"], a["timestamp"], a["keyframe_id"],
                          data[f"marg_att_{i}_{j}"], exposure=a["exposure"])
            for j, a in enumerate(kfm["attached"])]
        tracker.track.marginalized.append(MarginalizedKeyframe(
            frame_id=kfm["frame_id"], timestamp=kfm["timestamp"],
            t_wc=data["marg_t_wc"][i], affine=data["marg_affine"][i],
            exposure=kfm["exposure"],
            lm_uv=data[f"marg_lm_{i}_uv"],
            lm_idepth=data[f"marg_lm_{i}_idepth"],
            lm_valid=data[f"marg_lm_{i}_valid"],
            lm_outlier=data[f"marg_lm_{i}_outlier"],
            lm_baseline=data[f"marg_lm_{i}_baseline"],
            attached=attached))
    for a in meta["live_attached"]:
        tracker.track.attached.setdefault(a["keyframe_id"], []).append(
            AttachedFrame(a["frame_id"], a["timestamp"], a["keyframe_id"],
                          data[f"live_att_{a['keyframe_id']}_{a['j']}"],
                          exposure=a["exposure"]))
    return tracker
