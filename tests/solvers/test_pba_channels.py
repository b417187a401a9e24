"""C>1 embedder channels through the full PBA window.

Reference parity target: ``template <int C>`` PixelMap through the BA
(pixel_map.hpp:17, local_frame.hpp:174-221 — residual blocks are 8·C wide,
whole-patch Huber uses σ·√C).  The window carries C-channel patch tables
([K, C·H·W, 128], ops/patch.py::pack_patch_table_c) and [N, C·P]
channel-major reference patches; the Jacobian chain broadcasts the 8
per-point reprojection Jacobians over the C channel blocks.
"""

import jax.numpy as jnp
import numpy as np

from dsopp_tpu.features.embedder import FilterBankEmbedder
from dsopp_tpu.solvers.pba import marginalize, solve_window
from dsopp_tpu.testing import render_sequence
from dsopp_tpu.testing.fixtures import build_test_window
from tests.solvers.test_pba import FRAMES, _rel_pose_error


def _seq():
    return render_sequence(num_frames=10, height=240, width=320)


def test_c3_window_shapes():
    seq = _seq()
    emb = FilterBankEmbedder()
    window = build_test_window(seq, FRAMES, embedder=emb)
    assert emb.channels == 3
    assert window.num_channels == 3
    h, w = window.maps.shape[-2:]
    assert window.patch.shape[1] == 3 * h * w
    assert window.lm_patch.shape[-1] == 3 * 8


def test_c3_solve_from_gt_stays_at_gt():
    seq = _seq()
    window = build_test_window(seq, FRAMES, embedder=FilterBankEmbedder())
    window, stats = solve_window(window, seq.camera)
    trans, rot = _rel_pose_error(window, seq)
    assert trans < 6e-3 and rot < 0.15, (trans, rot)
    assert stats["num_valid"] > 1000


def test_c3_solve_from_noisy_init_reaches_reference_gate():
    seq = _seq()
    window = build_test_window(
        seq, FRAMES, pose_noise=6e-3, idepth_noise=0.05, seed=3,
        embedder=FilterBankEmbedder())
    trans0, rot0 = _rel_pose_error(window, seq)
    window, _ = solve_window(window, seq.camera)
    trans, rot = _rel_pose_error(window, seq)
    assert trans < 1e-2, f"translation {trans} (init {trans0})"
    assert rot < 1.0, f"rotation {rot} deg (init {rot0})"
    assert trans < trans0


def test_c3_marginalization_consistent():
    import dataclasses

    seq = _seq()
    window = build_test_window(seq, FRAMES, embedder=FilterBankEmbedder())
    window, _ = solve_window(window, seq.camera)
    flags = np.zeros(window.num_slots, bool)
    flags[1] = True
    lm_flags = window.lm_valid & jnp.asarray(flags)[:, None]
    window = dataclasses.replace(
        window, frame_marg=jnp.asarray(flags), lm_marg_flag=lm_flags)
    window = marginalize(window, seq.camera)
    assert float(jnp.max(jnp.abs(window.h_marg))) > 0.0
    window, _ = solve_window(window, seq.camera)
    trans, rot = _rel_pose_error(window, seq)
    assert trans < 1e-2 and rot < 1.0, (trans, rot)
