"""Synchronizer tests (reference synchronizer fabric parity)."""

from dsopp_tpu.sensors.synchronizer import (
    MasterSensorSynchronizer,
    NoSynchronization,
    create_synchronizer,
)


class _FakeCam:
    def __init__(self, n, offset=0.0):
        self.frames = [(i, offset + 0.1 * i) for i in range(n)]
        self.pos = 0

    def next_frame(self):
        if self.pos >= len(self.frames):
            return None

        class F:
            pass

        f = F()
        f.frame_id, f.timestamp = self.frames[self.pos]
        self.pos += 1
        return f


def test_no_synchronization_passthrough():
    sync = NoSynchronization({"cam": _FakeCam(3)})
    out = [sync.sync() for _ in range(4)]
    assert [o.timestamp for o in out[:3]] == [0.0, 0.1, 0.2]
    assert out[3] is None


def test_master_attaches_other_sensors():
    sync = MasterSensorSynchronizer(
        {"a": _FakeCam(2), "b": _FakeCam(2, offset=0.01)}, master="a")
    f = sync.sync()
    assert set(f.frames) == {"a", "b"}
    assert f.timestamp == 0.0
    assert f.camera_frame("b").timestamp == 0.01


def test_fabric():
    s = create_synchronizer({"type": "no_synchronization"}, {"c": _FakeCam(1)})
    assert isinstance(s, NoSynchronization)
    s = create_synchronizer({"type": "master_sensor"}, {"c": _FakeCam(1)})
    assert isinstance(s, MasterSensorSynchronizer)
