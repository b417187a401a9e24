"""Device-mesh construction for distributed bundle adjustment.

The reference is a single-process CPU pipeline (SURVEY §2.8: oneTBB only).
The TPU-native scaling axes replacing its thread pool are:

* ``seq``  — data parallelism over independent camera sequences (batched
  multi-sequence tracking; each sequence's window is independent);
* ``lm``   — model parallelism over landmark slots: residual/Jacobian
  evaluation and Hessian/Schur accumulation shard over landmarks, reduced
  with ``psum`` over ICI (the analog of the reference's mutex-merged TBB
  accumulators, hessian_block_evaluation.hpp:102-246).

The (K·8)² pose system is tiny and solved replicated on every device.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

SEQ_AXIS = "seq"
LM_AXIS = "lm"


def make_mesh(num_seq: int = 1, num_lm: int = 0, devices=None) -> Mesh:
    """Mesh over (seq, lm).  ``num_lm`` = 0 → use all remaining devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if num_lm == 0:
        num_lm = n // num_seq
    assert num_seq * num_lm <= n, (num_seq, num_lm, n)
    grid = np.asarray(devices[: num_seq * num_lm]).reshape(num_seq, num_lm)
    return Mesh(grid, (SEQ_AXIS, LM_AXIS))
