"""Neighborhood-packed bilinear sampling — one gather per pattern GROUP.

The honest microbench (PERF.md) shows the scattered row gather costs
~24 ns/row regardless of layout, and the epipolar SSD sweep issues one row
per (landmark, sample, pattern-point) — 230k+ rows per tick.  The 8 pattern
points of one (landmark, sample) cluster within a few pixels, so packing
each pixel's 8×8 neighborhood into one row lets the whole pattern be
fetched with a SINGLE central gather: 8× fewer rows, then the bilinear
interpolation runs as dense one-hot contractions on already-local data.

Reference analog: PixelMap::Evaluate over a PatternPatch
(src/features/include/features/camera/pixel_map.hpp:227-300 +
pattern_patch.hpp) — the reference's contiguous Eigen layout exploits the
same pattern locality through the cache; here it is explicit in the layout.

Semantics note: a pattern point whose bilinear corners fall outside its
group's 8×8 window (extreme warp, only possible at degenerate depth-scale
samples) is reported invalid, where the flat path would still sample it.
Such samples are garbage matches in both designs; accuracy tests gate this.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# neighborhood window: base = floor(center) - (WIN//2 - 1) covers corner
# columns floor(center)+[-3, +4] — the ±2 px DSO pattern with subpixel
# positions and warp-induced stretch up to ~1.7x; 8 keeps rows lane-aligned
WIN = 8


def pack_neighborhood(channel_map):
    """[H, W] map → [H*W, WIN*WIN] neighborhood rows.

    Row p holds the WIN×WIN block whose top-left pixel has flat index p
    (dy-major).  Rows within WIN-1 of the right/bottom edge hold zero
    padding there; they are never addressed (bases are clamped).

    Implemented as ONE patch-extraction convolution: the earlier
    roll-and-stack construction materialized WIN² shifted copies, which
    under ``vmap`` XLA laid out as [B, H*W, 1] buffers — 128× lane padding,
    ~600 MB per copy at VGA (measured OOM on a 16 GB chip at B=4).  The
    conv lowers to a single fused patch gather with no padded temporaries.

    r4: rows are zero-padded 64 → 128 lanes — a gathered row that is
    EXACTLY one (8, 128) f32 tile fetches at tile-copy speed (~4× the
    partial-tile rate, PERF.md §1.2), and the epipolar sweep fetches 256k
    rows per tick.
    """
    h, w = channel_map.shape
    patches = jax.lax.conv_general_dilated_patches(
        channel_map[None, None], (WIN, WIN), (1, 1),
        [(0, WIN - 1), (0, WIN - 1)])                   # [1, WIN*WIN, H, W]
    t = patches.reshape(WIN * WIN, h * w).T             # [HW, 64]
    return jnp.pad(t, ((0, 0), (0, 128 - WIN * WIN)))


def sample_nbhd(nb, uv, center, height, width):
    """Bilinear samples of a pattern group from neighborhood rows.

    ``nb``: [H*W, 36] packed map; ``uv``: [..., P, 2] pattern positions;
    ``center``: [..., 2] the group's central position (chooses the window).
    Returns (values [..., P], inside [..., P]).  Corner index/weight math
    matches interpolate.bilinear_weights; points escaping the window are
    invalid (see module docstring).
    """
    dtype = uv.dtype   # compute dtype; nb rows may be stored bf16
    x = uv[..., 0]
    y = uv[..., 1]
    inside = (x >= 0) & (y >= 0) & (x <= width - 1) & (y <= height - 1)
    ix = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, width - 2)
    iy = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, height - 2)
    fx = x - ix.astype(dtype)
    fy = y - iy.astype(dtype)

    bx = jnp.clip(jnp.floor(center[..., 0]).astype(jnp.int32) - (WIN // 2 - 1),
                  0, width - WIN)
    by = jnp.clip(jnp.floor(center[..., 1]).astype(jnp.int32) - (WIN // 2 - 1),
                  0, height - WIN)
    rows = jnp.take(nb, by * width + bx, axis=0)        # [..., 128]
    rows = rows[..., : WIN * WIN]                        # drop tile padding

    dx = ix - bx[..., None]                              # [..., P]
    dy = iy - by[..., None]
    in_win = (dx >= 0) & (dx <= WIN - 2) & (dy >= 0) & (dy <= WIN - 2)

    grid = jax.lax.broadcasted_iota(jnp.int32, dx.shape + (WIN,), dx.ndim)
    wx = (jnp.where(grid == dx[..., None], (1.0 - fx)[..., None], 0.0)
          + jnp.where(grid == dx[..., None] + 1, fx[..., None], 0.0))
    wy = (jnp.where(grid == dy[..., None], (1.0 - fy)[..., None], 0.0)
          + jnp.where(grid == dy[..., None] + 1, fy[..., None], 0.0))
    # factorized y-then-x contraction: the [..., P, WIN²] outer-product
    # weight build moved ~0.5 GB/tick at the sweep's 256k-group scale
    win2 = rows.astype(dtype).reshape(
        rows.shape[:-1] + (WIN, WIN))                     # [..., WINy, WINx]
    tmp = jnp.sum(win2[..., None, :, :] * wy[..., :, :, None].astype(dtype),
                  axis=-2)                                # [..., P, WINx]
    vals = jnp.sum(tmp * wx.astype(dtype), axis=-1)       # [..., P]
    return vals, inside & in_win
