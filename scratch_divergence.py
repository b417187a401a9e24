"""Find the first tick where host tracker and device loop diverge (valid slots only)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.tracker.device_loop import PipelinedTracker
from dsopp_tpu.tracker.monocular import MonocularTracker, TrackerConfig

NUM_FRAMES = 26
INIT_FRAMES = 6
H, W = 120, 160

CFG = TrackerConfig(
    num_frame_slots=7, landmarks_per_frame=128, immature_per_frame=256,
    desired_points=600, frontend_points=800, keyframe_factor=3.0,
    window_min=3, window_max=5, use_rotation_perturbations=False)


def _make_tracker(seq):
    tracker = MonocularTracker(seq.camera, CFG, dtype=jnp.float64)
    init = [(i, float(seq.timestamps[i]), seq.images[i],
             SE3(jnp.asarray(seq.pose_t_wc(i).q, jnp.float64),
                 jnp.asarray(seq.pose_t_wc(i).t, jnp.float64)))
            for i in range(INIT_FRAMES)]
    tracker.initialize(init)
    return tracker


def md(a, b, mask=None):
    a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
    d = np.abs(a - b)
    if mask is not None:
        d = d * mask
    return float(d.max()) if d.size else 0.0


seq = render_sequence(num_frames=NUM_FRAMES, height=H, width=W)
host = _make_tracker(seq)
dev_base = _make_tracker(seq)
pipe = PipelinedTracker(dev_base, flush_every=1)

for i in range(INIT_FRAMES, NUM_FRAMES):
    out = host.tick(i, float(seq.timestamps[i]), seq.images[i])
    pipe.tick(i, float(seq.timestamps[i]), seq.images[i])
    st = pipe.state
    hw, dw = host.window, st.window
    fv_h = np.asarray(hw.frame_valid); fv_d = np.asarray(dw.frame_valid)
    if not (fv_h == fv_d).all():
        print(f"frame {i}: frame_valid differs {fv_h} vs {fv_d}"); break
    fid_h = np.where(fv_h, np.asarray(hw.frame_id), -1)
    fid_d = np.where(fv_d, np.asarray(dw.frame_id), -1)
    if not (fid_h == fid_d).all():
        print(f"frame {i}: frame_id differs {fid_h} vs {fid_d}"); break
    m1 = fv_h.astype(float)
    m2 = m1[:, None]  # [K,1]
    kb = np.repeat(fv_h, 8).astype(float)
    lmv = (np.asarray(hw.lm_valid) & np.asarray(dw.lm_valid)).astype(float)
    diffs = {
        "pose_t": md(host.t_w_last.t, st.last_t),
        "affine": md(host.last_affine, st.last_affine),
        "rmse_last": abs(host.rmse_last[0] - float(st.rmse_last0)),
        "h_marg": md(hw.h_marg, dw.h_marg, kb[:, None] * kb[None, :]),
        "b_marg": md(hw.b_marg, dw.b_marg, kb),
        "eps": md(hw.eps, dw.eps, m2),
        "t_lin_t": md(hw.t_lin_t, dw.t_lin_t, m2),
        "lm_idepth": md(hw.lm_idepth, dw.lm_idepth, lmv),
        "lm_valid": md(np.asarray(hw.lm_valid) & fv_h[:, None],
                       np.asarray(dw.lm_valid) & fv_d[:, None]),
        "imm_idep": md(np.where(np.asarray(host.immature.valid), np.asarray(host.immature.idepth_min), 0),
                       np.where(np.asarray(st.immature.valid), np.asarray(st.immature.idepth_min), 0)),
        "dmap0": md(host.depth_maps[0][0], st.depth_idepth[0]),
        "min_dist": abs(host.activator.min_distance_to_neighbor - float(st.min_distance)),
        "kf_rmse": abs(host.keyframe_strategy._rmse - float(st.kf_rmse)),
    }
    bad = {k: v for k, v in diffs.items() if v > 1e-12}
    print(f"frame {i} kf={bool(out['keyframe'])}: " + (str(bad) if bad else "OK"), flush=True)
    if bad:
        break
