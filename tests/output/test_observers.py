"""Observer-style output interfaces (reference output_interfaces set)."""

import numpy as np

import jax.numpy as jnp

from dsopp_tpu.output.observers import (
    CallbackObserver,
    FpsMeter,
    ObserverSet,
    TrackObserver,
    TrajectoryWriter,
)
from dsopp_tpu.track.state import MarginalizedKeyframe, OdometryTrack


class Recorder(TrackObserver):
    def __init__(self):
        self.events = []

    def on_frame(self, frame, result):
        self.events.append(("frame", frame))

    def on_keyframe(self, frame_id, timestamp):
        self.events.append(("kf", frame_id))

    def on_marginalize(self, kf):
        self.events.append(("marg", kf.frame_id))

    def finish(self, tracker):
        self.events.append(("finish", tracker))


def _marg_kf(fid):
    z2 = np.zeros((1, 2))
    return MarginalizedKeyframe(
        frame_id=fid, timestamp=float(fid), t_wc=np.eye(4),
        affine=np.zeros(2), exposure=1.0, lm_uv=z2,
        lm_idepth=np.zeros(1), lm_valid=np.ones(1, bool),
        lm_outlier=np.zeros(1, bool), lm_baseline=np.zeros(1))


def test_track_events_fan_out_to_observers():
    rec = Recorder()
    track = OdometryTrack()
    track.observers.append(ObserverSet([rec]))
    track.on_keyframe(3, 0.1)
    track.on_marginalize(_marg_kf(3))
    assert rec.events == [("kf", 3), ("marg", 3)]


def test_observer_set_fan_out_and_callback_adapter():
    seen = []
    s = ObserverSet().add(CallbackObserver(lambda f, r: seen.append((f, r))))
    rec = Recorder()
    s.add(rec)
    s.on_frame("f0", {"ok": True})
    s.finish("tracker")
    assert seen == [("f0", {"ok": True})]
    assert rec.events == [("frame", "f0"), ("finish", "tracker")]


def test_fps_meter_counts():
    m = FpsMeter()
    for i in range(5):
        m.on_frame(i, None)
    m.on_keyframe(2, 0.2)
    assert m.frames == 5 and m.keyframes == 1
    assert m.fps > 0


def test_trajectory_writer_finish(tmp_path):
    class T:  # minimal tracker stand-in
        class _Track:
            @staticmethod
            def trajectory(window):
                return [(0.0, np.eye(4)), (0.5, np.eye(4))]

        track = _Track()
        window = None

    path = tmp_path / "traj.tum"
    TrajectoryWriter(str(path)).finish(T())
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("0.000000 ")


# The Application.run e2e wiring (frame/keyframe/finish hooks through the
# real pipeline) is covered in tests/config/test_app_device_loop.py::
# test_run_notifies_observers, which owns the synthetic dataset fixture.
