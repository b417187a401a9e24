"""Immature-landmark activation (reference LandmarksActivator).

Mirrors src/tracker/landmarks_activator/src/landmarks_activator.cpp:

* existing active landmarks are reprojected into the newest keyframe
  (:51-84); a P-controller on ``min_distance_to_neighbor`` regulates point
  density toward ``number_of_desired_points`` (:29-38);
* an immature point activates when it is ready (readyForActivation:
  traced, interval < 8 px, uniqueness > 3, positive idepth), reprojects
  validly into the newest frame, and has no active neighbor within the
  distance (:86-120);
* activated points become active landmarks anchored in their host keyframe.

TPU-first deviation: the reference's sequential greedy scan (each accepted
candidate blocks later ones) is replaced by a parallel test against the
ACTIVE point set only — candidate-vs-candidate spacing is already enforced
by the block-structured extractor, and the density controller absorbs any
residual difference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.lie import SE3
from dsopp_tpu.core.reproject import reproject
from dsopp_tpu.solvers.pba import RES_OK, Window, active_lm_mask
from dsopp_tpu.tracker.depth_estimation import (
    STATUS_GOOD,
    STATUS_ILL_CONDITIONED,
    STATUS_OOB,
    STATUS_OUTLIER,
    STATUS_SKIPPED,
    ImmaturePoints,
)

MAX_SEARCH_INTERVAL = 8.0   # readyForActivation (immature_tracking_landmark.cpp:46-52)
MIN_UNIQUENESS = 3.0
P_GAIN = 0.001              # recalculateMinDistanceToNeighbor
MIN_DISTANCE = 0.0
MAX_DISTANCE = 10.0


def ready_for_activation(points: ImmaturePoints):
    s = points.status
    status_ok = (
        (s == STATUS_GOOD) | (s == STATUS_SKIPPED)
        | (s == STATUS_ILL_CONDITIONED) | (s == STATUS_OOB)
    )
    return (
        points.valid & points.traced & status_ok
        & (points.search_interval < MAX_SEARCH_INTERVAL)
        & (points.uniqueness > MIN_UNIQUENESS)
        & (points.idepth > 0)
    )


@jax.jit
def _activation_kernel(window: Window, model, imm: ImmaturePoints,
                       min_distance):
    """→ (activate [K,N_imm] bool, delete [K,N_imm] bool, n_active).

    ``imm`` carries a leading window-slot axis (bank per active keyframe).
    """
    k = window.num_slots
    newest = jnp.sum(window.frame_valid) - 1
    poses = window.poses()
    t_newest_inv = jax.tree_util.tree_map(lambda x: x[newest], poses)
    t_n = SE3(t_newest_inv.q, t_newest_inv.t).inverse()
    t_rel = SE3(t_n.q[None].repeat(k, 0), t_n.t[None].repeat(k, 0)).compose(poses)

    # active landmarks → newest frame
    act_mask = active_lm_mask(window) & ~window.lm_outlier
    rp_act = reproject(
        model, model, window.lm_uv, window.lm_idepth,
        SE3(t_rel.q[:, None], t_rel.t[:, None]))
    act_ok = act_mask & rp_act.valid
    n_active = jnp.sum(act_ok)
    act_uv = jnp.where(act_ok[..., None], rp_act.uv, jnp.inf).reshape(-1, 2)

    # immature candidates → newest frame
    ready = ready_for_activation(imm)
    host_is_newest = (jnp.arange(k) == newest)[:, None]
    ready = ready & ~host_is_newest  # the newest keyframe's points are too fresh
    rp_imm = reproject(
        model, model, imm.uv, imm.idepth, SE3(t_rel.q[:, None], t_rel.t[:, None]))

    # min distance to any active projection
    d2 = jnp.sum(
        (rp_imm.uv.reshape(-1, 1, 2) - act_uv[None, :, :]) ** 2, axis=-1)
    min_d = jnp.sqrt(jnp.min(d2, axis=1)).reshape(imm.uv.shape[:2])
    has_active = n_active > 0
    spaced = jnp.where(has_active, min_d > min_distance, True)

    activate = ready & rp_imm.valid & spaced
    # deletions (activationStatus): outliers, untraced-after-trace, OOB
    dead_status = (
        (imm.status == STATUS_OUTLIER)
        | ((imm.status == STATUS_OOB) & ~ready)
    )
    delete = imm.valid & (dead_status | (ready & ~rp_imm.valid))
    return activate, delete, n_active


@dataclass
class LandmarksActivator:
    desired_points: int = 2000
    min_distance_to_neighbor: float = 3.0

    def activate(self, window: Window, model, imm: ImmaturePoints):
        """Run activation; returns (window', imm', stats).

        Host moves accepted immature points into their anchor frame's
        active bank and updates the density controller.
        """
        activate, delete, n_active = _activation_kernel(
            window, model, imm, self.min_distance_to_neighbor)
        activate = np.asarray(activate)
        delete = np.asarray(delete)
        n_active = int(n_active)

        # P-controller toward the desired density
        self.min_distance_to_neighbor = float(np.clip(
            self.min_distance_to_neighbor
            + (n_active - self.desired_points) * P_GAIN,
            MIN_DISTANCE, MAX_DISTANCE))

        # np.array (copy): asarray views of device arrays are read-only
        lm_uv = np.array(window.lm_uv)
        lm_patch = np.array(window.lm_patch)
        lm_idepth = np.array(window.lm_idepth)
        lm_valid = np.array(window.lm_valid)
        status = np.array(window.res_status)
        imm_valid = np.array(imm.valid)

        n_activated = 0
        for slot in range(window.frame_count()):
            idx = np.where(activate[slot])[0]
            if idx.size:
                free = np.where(~lm_valid[slot])[0]
                take = min(free.size, idx.size)
                dst, src = free[:take], idx[:take]
                lm_uv[slot, dst] = np.asarray(imm.uv[slot])[src]
                lm_patch[slot, dst] = np.asarray(imm.patch[slot])[src]
                lm_idepth[slot, dst] = np.asarray(imm.idepth[slot])[src]
                lm_valid[slot, dst] = True
                status[slot, :, dst] = RES_OK
                imm_valid[slot, src] = False
                n_activated += take
            imm_valid[slot, delete[slot]] = False

        import dataclasses as dc

        window = dc.replace(
            window,
            lm_uv=jnp.asarray(lm_uv),
            lm_patch=jnp.asarray(lm_patch),
            lm_idepth=jnp.asarray(lm_idepth),
            lm_valid=jnp.asarray(lm_valid),
            res_status=jnp.asarray(status),
        )
        imm = imm._replace(valid=jnp.asarray(imm_valid))
        return window, imm, {
            "activated": n_activated,
            "active": n_active,
            "min_distance": self.min_distance_to_neighbor,
        }
