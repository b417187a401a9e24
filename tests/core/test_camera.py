"""Camera-model tests (parity model: reference test/test/energy/camera_model/)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.core.camera import Pinhole, SimpleRadial

SIZE = (1280.0, 720.0)


def make_pinhole():
    return Pinhole.create(SIZE, (448.155, 448.155), (640.0, 360.0), jnp.float64)


def make_radial():
    return SimpleRadial.create(SIZE, 448.155, (640.0, 360.0), -0.05, 0.008, jnp.float64)


def _points_in_view(key, n=512):
    k1, k2 = jax.random.split(key)
    uv = jax.random.uniform(
        k1, (n, 2), minval=jnp.array([10.0, 10.0]), maxval=jnp.array([1269.0, 709.0]),
        dtype=jnp.float64,
    )
    depth = jax.random.uniform(k2, (n,), minval=0.5, maxval=50.0, dtype=jnp.float64)
    return uv, depth


def test_pinhole_project_unproject_roundtrip():
    cam = make_pinhole()
    uv, depth = _points_in_view(jax.random.PRNGKey(0))
    rays = cam.unproject(uv)
    p3d = rays * depth[:, None]
    uv2, valid = cam.project(p3d)
    np.testing.assert_allclose(uv2, uv, atol=1e-9)
    assert bool(jnp.all(valid))


def test_radial_project_unproject_roundtrip():
    cam = make_radial()
    uv, depth = _points_in_view(jax.random.PRNGKey(1))
    rays = cam.unproject(uv)
    p3d = rays * depth[:, None]
    uv2, _valid = cam.project(p3d)
    np.testing.assert_allclose(uv2, uv, atol=1e-7)


def test_pinhole_jacobian_vs_autodiff():
    cam = make_pinhole()
    uv, depth = _points_in_view(jax.random.PRNGKey(2), n=32)
    p3d = cam.unproject(uv) * depth[:, None]
    _, j, _ = cam.project_jacobian(p3d)
    j_ad = jax.vmap(jax.jacobian(lambda p: cam.project(p)[0]))(p3d)
    np.testing.assert_allclose(j, j_ad, atol=1e-9)


def test_radial_jacobian_vs_autodiff():
    cam = make_radial()
    uv, depth = _points_in_view(jax.random.PRNGKey(3), n=32)
    p3d = cam.unproject(uv) * depth[:, None]
    _, j, _ = cam.project_jacobian(p3d)
    j_ad = jax.vmap(jax.jacobian(lambda p: cam.project(p)[0]))(p3d)
    np.testing.assert_allclose(j, j_ad, atol=1e-8)


def test_border_and_depth_validity():
    cam = make_pinhole()
    # behind camera
    _, valid = cam.project(jnp.array([0.0, 0.0, -1.0], dtype=jnp.float64))
    assert not bool(valid)
    # inside border margin (reference kBorderSize = 4)
    ray = cam.unproject(jnp.array([2.0, 360.0], dtype=jnp.float64))
    _, valid = cam.project(ray * 5.0)
    assert not bool(valid)
    ray = cam.unproject(jnp.array([6.0, 360.0], dtype=jnp.float64))
    _, valid = cam.project(ray * 5.0)
    assert bool(valid)


def test_scaled_model_halves_projection():
    cam = make_pinhole()
    cam1 = cam.scaled(2.0)
    p3d = jnp.array([1.0, -0.5, 4.0], dtype=jnp.float64)
    uv0, _ = cam.project(p3d)
    uv1, _ = cam1.project(p3d)
    np.testing.assert_allclose(uv1, uv0 / 2.0, atol=1e-12)


def test_batched_intrinsics():
    """Models broadcast over leading batch dims (multi-camera vmap axis)."""
    fx = jnp.array([400.0, 500.0])
    cam = Pinhole(fx, fx, jnp.full((2,), 320.0), jnp.full((2,), 240.0),
                  jnp.broadcast_to(jnp.array([640.0, 480.0]), (2, 2)))
    p = jnp.array([[0.1, 0.2, 2.0], [0.1, 0.2, 2.0]])
    uv, _ = cam.project(p)
    assert uv.shape == (2, 2)
    assert not np.allclose(uv[0], uv[1])


def test_tum_fov_roundtrip_and_jacobian():
    from dsopp_tpu.core.camera import TumFov

    cam = TumFov.create(SIZE, (600.0, 600.0), (640.0, 360.0), 0.9, jnp.float64)
    uv, depth = _points_in_view(jax.random.PRNGKey(9))
    rays = cam.unproject(uv)
    np.testing.assert_allclose(rays[:, 2], 1.0, atol=1e-12)  # z = 1 convention
    uv2, valid = cam.project(rays * depth[:, None])
    np.testing.assert_allclose(uv2, uv, atol=1e-7)

    p3d = (cam.unproject(uv) * depth[:, None])[:16]
    _, j, _ = cam.project_jacobian(p3d)
    j_ad = jax.vmap(jax.jacobian(lambda p: cam.project(p)[0]))(p3d)
    np.testing.assert_allclose(j, j_ad, atol=1e-8)


def test_tum_fov_optical_axis_safe():
    from dsopp_tpu.core.camera import TumFov

    cam = TumFov.create(SIZE, (600.0, 600.0), (640.0, 360.0), 0.9, jnp.float64)
    uv, _ = cam.project(jnp.array([0.0, 0.0, 3.0]))
    np.testing.assert_allclose(uv, [640.0, 360.0], atol=1e-9)
    ray = cam.unproject(jnp.array([640.0, 360.0]))
    np.testing.assert_allclose(ray, [0.0, 0.0, 1.0], atol=1e-9)


def test_division_roundtrip_and_jacobian():
    from dsopp_tpu.core.camera import Division

    cam = Division.create(SIZE, 448.0, (640.0, 360.0), -0.08, jnp.float64)
    uv, depth = _points_in_view(jax.random.PRNGKey(10))
    rays = cam.unproject(uv)
    np.testing.assert_allclose(rays[:, 2], 1.0, atol=1e-12)
    uv2, valid = cam.project(rays * depth[:, None])
    m = np.asarray(valid)
    np.testing.assert_allclose(uv2[m], uv[m], atol=1e-6)
    assert m.mean() > 0.9

    p3d = (rays * depth[:, None])[:12]
    _, j, _ = cam.project_jacobian(p3d)
    j_ad = jax.vmap(jax.jacobian(lambda p: cam.project(p)[0]))(p3d)
    np.testing.assert_allclose(j, j_ad, atol=1e-7)


def test_atan_polynomial_roundtrip():
    from dsopp_tpu.core.camera import Atan

    cam = Atan.create(SIZE, (450.0, 452.0), (640.0, 360.0),
                      (-0.01, 0.004, -0.001), jnp.float64)
    uv, depth = _points_in_view(jax.random.PRNGKey(11))
    rays = cam.unproject(uv)
    uv2, valid = cam.project(rays * depth[:, None])
    m = np.asarray(valid)
    assert m.mean() > 0.9
    np.testing.assert_allclose(uv2[m], uv[m], atol=1e-6)

    p3d = (rays * depth[:, None])[:12]
    _, j, _ = cam.project_jacobian(p3d)
    j_ad = jax.vmap(jax.jacobian(lambda p: cam.project(p)[0]))(p3d)
    np.testing.assert_allclose(j, j_ad, atol=1e-7)


# ---- IOS lookup-table model (reference ios_camera_model.hpp) -------------

def make_ios():
    from dsopp_tpu.core.camera import IOSCamera

    # smooth barrel-like magnifier LUT (ARKit tables are ~42 entries)
    r = np.linspace(0.0, 1.0, 42)
    lut = 0.06 * r * r - 0.015 * r
    return IOSCamera.create(SIZE, (448.155, 450.2), (640.0, 360.0),
                            lut, jnp.float64)


def test_ios_project_unproject_roundtrip():
    cam = make_ios()
    uv, depth = _points_in_view(jax.random.PRNGKey(11))
    rays = cam.unproject(uv)
    p3d = rays * depth[:, None]
    uv2, valid = cam.project(p3d)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-6)
    assert bool(jnp.all(valid))


def test_ios_jacobian_vs_autodiff():
    cam = make_ios()
    uv, depth = _points_in_view(jax.random.PRNGKey(12), n=64)
    p3d = cam.unproject(uv) * depth[:, None]
    _, j, _ = cam.project_jacobian(p3d)
    j_ad = jax.vmap(jax.jacobian(lambda p: cam.project(p)[0]))(p3d)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ad), atol=1e-7)


def test_ios_identity_lut_matches_pinhole():
    from dsopp_tpu.core.camera import IOSCamera

    cam = IOSCamera.create(SIZE, (448.155, 448.155), (640.0, 360.0),
                           np.zeros(42), jnp.float64)
    pin = make_pinhole()
    uv, depth = _points_in_view(jax.random.PRNGKey(13), n=64)
    p3d = pin.unproject(uv) * depth[:, None]
    uv_ios, _ = cam.project(p3d)
    uv_pin, _ = pin.project(p3d)
    np.testing.assert_allclose(np.asarray(uv_ios), np.asarray(uv_pin), atol=1e-9)


def test_ios_scaled_model_halves_projection():
    cam = make_ios()
    half = cam.scaled(2.0)
    uv, depth = _points_in_view(jax.random.PRNGKey(14), n=64)
    p3d = cam.unproject(uv) * depth[:, None]
    uv_full, _ = cam.project(p3d)
    uv_half, _ = half.project(p3d, border=0)
    np.testing.assert_allclose(np.asarray(uv_half), np.asarray(uv_full) / 2.0,
                               atol=1e-6)
