"""Explicit shard_map+psum BA step: equivalence vs the single-device path.

The annotation-based path (parallel.sharded) is validated elsewhere; here
the explicit-collective formulation must reproduce the exact same LM step
on the virtual 8-device CPU mesh (float64 → reduction order is the only
permitted difference)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from dsopp_tpu.parallel.mesh import LM_AXIS, make_mesh
from dsopp_tpu.parallel.shard_map_ba import (
    pba_iteration_shard_map,
    place_window,
)
from dsopp_tpu.solvers.pba import (
    PBAOptions,
    _energy,
    _fej_cache,
    _pba_iteration,
    active_lm_mask,
)

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _tiny_problem


def _reference_step(window, cam, reg, opts):
    lm_mask = active_lm_mask(window)
    fej = _fej_cache(window, cam)
    eps, idepth, step_sq = _pba_iteration(
        window, cam, fej, window.eps, window.lm_idepth, lm_mask, reg, opts)
    e, n, _ = _energy(window, cam, eps, idepth, lm_mask, opts)
    return eps, idepth, step_sq, e, n


def test_shard_map_matches_single_device():
    window, cam = _tiny_problem(dtype=jnp.float64, landmarks=64, size=48)
    opts = PBAOptions()
    reg = jnp.asarray(1e-5, jnp.float64)

    ref = _reference_step(window, cam, reg, opts)

    mesh = make_mesh(1, 8)
    placed = place_window(window, mesh)
    out = pba_iteration_shard_map(placed, cam, reg, opts, mesh)

    labels = ("eps", "idepth", "step_sq", "energy", "n_valid")
    for name, a, b in zip(labels, ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-11,
            err_msg=f"{name} mismatch")


def test_shard_map_on_2x4_mesh_lm_axis():
    """lm axis of size 4 with a seq axis present in the mesh."""
    window, cam = _tiny_problem(dtype=jnp.float64, landmarks=64, size=48)
    opts = PBAOptions()
    reg = jnp.asarray(1e-5, jnp.float64)
    ref = _reference_step(window, cam, reg, opts)

    mesh = make_mesh(2, 4)
    placed = place_window(window, mesh)
    out = pba_iteration_shard_map(placed, cam, reg, opts, mesh)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_hybrid_mesh_single_process_fallback():
    from dsopp_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh(2, 4)
    assert mesh.axis_names == ("seq", "lm")
    assert mesh.devices.shape == (2, 4)
