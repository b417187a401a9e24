"""Sanity-checker parity (src/sanity_checker/ + sanity_check_results.proto).

The reference ships only the interface (its ackermann checker is
proprietary); these tests exercise our working kinematic implementation
plus the fabric and the track.bin persistence of the result map.
"""

import math

import numpy as np
import pytest

from dsopp_tpu.sanity_checker import (
    AckermannOptions,
    AckermannSanityChecker,
    SanityCheckStatus,
    create_sanity_checker,
)


def _pose(yaw=0.0, pitch=0.0, roll=0.0, t=(0, 0, 0)):
    """T_w_c for a camera with +z forward, −y up, yaw about world up."""
    cy, sy = math.cos(yaw), math.sin(yaw)
    cp, sp = math.cos(pitch), math.sin(pitch)
    cr, sr = math.cos(roll), math.sin(roll)
    # camera frame: x right, y down, z forward; world up = −y at identity
    r_yaw = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    r_pitch = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    r_roll = np.asarray([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    m = np.eye(4)
    m[:3, :3] = r_yaw @ r_pitch @ r_roll
    m[:3, 3] = t
    return m


def _forward_drive(n, step=1.0, dt=1.0, yaw_rate=0.0):
    """Car driving forward (+z), optionally turning."""
    kfs = []
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(n):
        kfs.append((i, i * dt, _pose(yaw=yaw, t=tuple(pos))))
        heading = np.asarray([math.sin(yaw), 0.0, math.cos(yaw)])
        pos = pos + step * heading
        yaw += yaw_rate * dt
    return kfs


def test_sane_trajectory_passes():
    chk = AckermannSanityChecker()
    assert chk.check(_forward_drive(10, yaw_rate=math.radians(10)))
    assert chk.results == {}


def test_incremental_check_consumes_only_new_frames():
    chk = AckermannSanityChecker()
    kfs = _forward_drive(10)
    assert chk.check(kfs[:4])
    assert chk.check(kfs)          # re-check with more frames
    assert chk._last_checked == 10


def test_gravity_angle_violation():
    chk = AckermannSanityChecker()
    kfs = _forward_drive(3)
    # keyframe rolls 60° (car on two wheels)
    kfs.append((3, 3.0, _pose(roll=math.radians(60), t=(0, 0, 3))))
    assert not chk.check(kfs)
    assert chk.results[3] == SanityCheckStatus.EXCEEDED_GRAVITY_ANGLE


def test_gravity_angular_velocity_violation():
    opt = AckermannOptions(max_gravity_angle=math.radians(45),
                           max_gravity_angular_velocity=math.radians(20))
    chk = AckermannSanityChecker(opt)
    kfs = _forward_drive(3)
    # 40° roll in one second: below the angle gate, above the rate gate
    kfs.append((3, 3.0, _pose(roll=math.radians(40), t=(0, 0, 3))))
    assert not chk.check(kfs)
    assert chk.results[3] == SanityCheckStatus.EXCEEDED_GRAVITY_ANGULAR_VELOCITY


def test_rotation_angle_violation():
    chk = AckermannSanityChecker()
    kfs = _forward_drive(3)
    # 90° yaw flip between consecutive keyframes
    kfs.append((3, 3.0, _pose(yaw=math.radians(90), t=(0, 0, 3))))
    assert not chk.check(kfs)
    assert chk.results[3] == SanityCheckStatus.EXCEEDED_ROTATION_ANGLE


def test_rotation_angular_velocity_violation():
    opt = AckermannOptions(max_rotation_angle=math.radians(40),
                           max_rotation_angular_velocity=math.radians(30))
    chk = AckermannSanityChecker(opt)
    kfs = _forward_drive(3)
    # 35° yaw in 0.5s = 70°/s: under the angle gate, over the rate gate
    kfs.append((3, 2.5, _pose(yaw=math.radians(35), t=(0, 0, 3))))
    assert not chk.check(kfs)
    assert (chk.results[3]
            == SanityCheckStatus.EXCEEDED_ROTATION_ANGULAR_VELOCITY)


def test_translation_error_violation():
    chk = AckermannSanityChecker()
    kfs = _forward_drive(3)
    # teleports sideways (x) with no heading change: impossible for a car
    kfs.append((3, 3.0, _pose(t=(5.0, 0, 2.0))))
    assert not chk.check(kfs)
    assert chk.results[3] == SanityCheckStatus.EXCEEDED_TRANSLATION_ERROR


def test_reverse_driving_is_legal():
    chk = AckermannSanityChecker()
    kfs = [(i, float(i), _pose(t=(0, 0, -i))) for i in range(5)]
    assert chk.check(kfs)


def test_tilted_mount_does_not_trip_gravity():
    """Gravity reference comes from the first keyframe: a camera mounted
    pitched-down must not violate while the pitch stays constant."""
    chk = AckermannSanityChecker()
    pitch = math.radians(20)
    kfs = [(i, float(i), _pose(pitch=pitch, t=(0, 0, i))) for i in range(5)]
    assert chk.check(kfs)


def test_fabric():
    assert create_sanity_checker(None) is None
    assert create_sanity_checker({"mode": "off"}) is None
    assert create_sanity_checker({"mode": "on", "type": "gnss"}) is None
    chk = create_sanity_checker({
        "mode": "on", "type": "ackermann", "max_rotation_angle_deg": 10.0})
    assert isinstance(chk, AckermannSanityChecker)
    assert chk.options.max_rotation_angle == pytest.approx(math.radians(10))


def test_fabric_extrinsic_axes(tmp_path):
    # vehicle x-forward/z-up mapped through a 90° mount: camera z forward
    t = np.eye(4)
    t[:3, :3] = np.asarray([[0, -1, 0], [0, 0, -1], [1, 0, 0]])
    path = tmp_path / "t_camera_rear_roll_center.txt"
    np.savetxt(path, t)
    chk = create_sanity_checker(
        {"mode": "on", "type": "ackermann",
         "t_camera_rear_roll_center": path.name}, str(tmp_path))
    np.testing.assert_allclose(chk.options.forward_axis, [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(chk.options.up_axis, [0, -1, 0], atol=1e-12)


def test_track_bin_roundtrip(tmp_path):
    from dsopp_tpu.output.protobuf_track import load_track_bin, save_track_bin
    from dsopp_tpu.track.state import OdometryTrack

    results = {0: SanityCheckStatus.EXCEEDED_ROTATION_ANGLE,
               3: SanityCheckStatus.EXCEEDED_TRANSLATION_ERROR,
               5: SanityCheckStatus.EXCEEDED_GRAVITY_ANGLE}
    path = tmp_path / "track.bin"
    save_track_bin(path, OdometryTrack(), sanity_results=results)
    loaded = load_track_bin(path)
    assert loaded["sanity_check_results"] == {
        int(k): int(v) for k, v in results.items()}


def test_track_bin_roundtrip_empty(tmp_path):
    from dsopp_tpu.output.protobuf_track import load_track_bin, save_track_bin
    from dsopp_tpu.track.state import OdometryTrack

    path = tmp_path / "track.bin"
    save_track_bin(path, OdometryTrack())
    assert load_track_bin(path)["sanity_check_results"] == {}
