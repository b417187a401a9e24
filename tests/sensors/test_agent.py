"""Agent / Sensors registry + synchronizer fabric (reference agent.hpp,
synchronizer fabric.cpp:12-44)."""

import numpy as np
import pytest

from dsopp_tpu.sensors.agent import Agent, Sensors
from dsopp_tpu.sensors.providers import CameraDataFrame
from dsopp_tpu.sensors.synchronizer import create_synchronizer


class FakeCamera:
    def __init__(self, sensor_id, n=3):
        self.sensor_id = sensor_id
        self.i = 0
        self.n = n

    def next_frame(self):
        if self.i >= self.n:
            return None
        f = CameraDataFrame(self.i, float(self.i) * 0.1,
                            np.zeros((16, 16), np.float32), 1.0)
        self.i += 1
        return f


def test_registry_and_master():
    reg = Sensors()
    reg.add_camera(FakeCamera("cam_a"))
    reg.add_camera(FakeCamera("cam_b"))
    agent = Agent(sensors=reg)
    assert len(agent.sensors) == 2
    assert agent.sensors.get("cam_b").sensor_id == "cam_b"
    assert agent.sensors.master.sensor_id == "cam_a"
    with pytest.raises(ValueError):
        reg.add_camera(FakeCamera("cam_a"))


def test_master_synchronizer_bundles_other_sensors():
    reg = Sensors()
    reg.add_camera(FakeCamera("cam_a", n=2))
    reg.add_camera(FakeCamera("cam_b", n=5))
    sync = create_synchronizer({"type": "master", "sensor_id": "cam_a"}, reg)
    f0 = sync.sync()
    assert set(f0.frames) == {"cam_a", "cam_b"}
    assert f0.camera_frame("cam_a").frame_id == 0
    f1 = sync.sync()
    assert f1.camera_frame("cam_b").frame_id == 1
    assert sync.sync() is None  # master exhausted


def test_unknown_master_rejected():
    reg = Sensors()
    reg.add_camera(FakeCamera("cam_a"))
    with pytest.raises(ValueError):
        create_synchronizer({"type": "master", "sensor_id": "nope"}, reg)
