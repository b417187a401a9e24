"""Residual patterns.

The DSO 8-point neighbourhood pattern (reference:
src/common/pattern/include/common/pattern/pattern.hpp:15-35; Engel et al.,
'Direct Sparse Odometry', arXiv:1607.02565).  Stored as a [P, 2] offset array
in (x, y) order; residual tensors carry P as a trailing-but-one axis.
"""

import jax.numpy as jnp

PATTERN_SIZE = 8
PATTERN_CENTER = 4  # index of the (0, 0) offset

_OFFSETS = (
    (0, 2),
    (-1, 1),
    (1, 1),
    (-2, 0),
    (0, 0),
    (2, 0),
    (-1, -1),
    (0, -2),
)


def pattern_offsets(dtype=jnp.float32):
    """[P, 2] pattern offsets in (x, y) pixel units."""
    return jnp.asarray(_OFFSETS, dtype=dtype)


def shift_pattern(uv, dtype=None):
    """Center the pattern at points ``uv`` [..., 2] → [..., P, 2]."""
    off = pattern_offsets(uv.dtype if dtype is None else dtype)
    return uv[..., None, :] + off
