"""Pallas TPU kernel: bilinear image warp as MXU one-hot matmuls.

Arbitrary per-pixel gathers don't vectorize on the TPU (XLA lowers them to
near-scalar loads — measured ~0.6 ms per 96x96 warp of a 480x640 source,
which made the warp 94% of tracker time in round 1).  The TPU-native
formulation turns the row picks of bilinear sampling into matmuls against
one-hot selector matrices so the systolic array does the gathering:

  per 128-lane slice of output pixels:
    oh_y0[h, p] = (floor(y[p]) == h)                [H, 128] one-hot (exact)
    r0 = image^T @ oh_y0                            [W, 128] on the MXU
    r  = r0 * (1-wy) + r1 * wy                      f32 row lerp (VPU)
    out[p] = sum_w r[w, p] * wx-weights(w, p)       column pick + lerp (VPU)

For integer-valued sources (uint8 frames — the tracker's case) the row-pick
matmuls run on the MXU's int8 path at 2x the bf16 rate: the image is
rebiased to ``img - 128`` (exactly representable in int8), selectors are
exact 0/1 int8, accumulation is int32, and the bias is restored afterwards
(each selector column sums to exactly 1).  Float sources use bf16 selectors
(0/1 exact) with f32 accumulation.  Either way the result matches the f32
gather answer to f32 rounding; lerp weights always stay f32 on the VPU.

Two kernels share this formulation:

- :func:`pallas_bilinear_sample` ("full-height"): every block contracts all
  H source rows and reduces over all W columns — O(P*H*W) regardless of
  where the samples land.  Simple, shape-independent cost.
- :func:`pallas_bilinear_sample_windowed`: exploits the spatial coherence
  of warp grids — each 1024-pixel block's samples live in a small source
  box, so the matmuls contract only a tile-aligned WIN_X x WIN_Y dynamic
  slice (with an exact full-image fallback for blocks that don't fit).
  ~5x fewer MXU MACs and ~3x less VPU epilogue on tracker crops.  An
  earlier round-1 attempt at windowing (per-slice lax.cond + 64-row
  windows, one branch per window) was 8x slower than full-height; the
  working form needs the window shared per block, pl.multiple_of-aligned
  dynamic slices, and full-tile [8, 128] operand layouts (a [P, 1] operand
  layout tiles to (8, 128) and silently inflates 128x in memory).

The source image stays resident in VMEM across the whole grid (a 480x640
int8/bf16 view is 300-600 KB), so the only HBM traffic is one image load +
the 96x96 output store.

Out-of-bounds rule matches ops.resample.bilinear_sample: any sample whose
floor cell isn't fully inside the image returns 0 (reference
data_transform.py:104-109; cv2.remap replacement per tracker.py:54-80).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK_P = SUBLANES * LANES  # output pixels per grid step

# Windowed-kernel source window, in the TRANSPOSED image's dims: WIN_X
# source columns (the sublane dim, base 32-aligned to the int8 tile) x WIN_Y
# source rows (the lane dim / matmul contraction, base 128-aligned).
WIN_X = 224
WIN_Y = 256


def _warp_kernel(image_t_ref, x_ref, y_ref, out_ref, *, h: int, w: int,
                 sel_dtype, acc_dtype, bias: float):
    """Full-height warp, whole 1024-pixel block as one wide op set (2 MXU
    dots on [W, H] x [H, 1024]; see _warp_kernel_win for why wide beats the
    8 x 128-lane-slice structure)."""
    img_t = image_t_ref[:]  # [W, H] int8 / bf16 (f32 in interpret mode)
    p = SUBLANES * LANES

    x = x_ref[0].reshape(1, p)
    y = y_ref[0].reshape(1, p)
    valid = (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
    x = jnp.clip(x, 0.0, w - 2)
    y = jnp.clip(y, 0.0, h - 2)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, p), 0)
    oh_y0 = (rows == y0i).astype(sel_dtype)  # exact 0/1
    oh_y1 = (rows == y0i + 1).astype(sel_dtype)

    dn = (((1,), (0,)), ((), ()))
    r0 = jax.lax.dot_general(
        img_t, oh_y0, dn, preferred_element_type=acc_dtype
    )  # [W, p]
    r1 = jax.lax.dot_general(
        img_t, oh_y1, dn, preferred_element_type=acc_dtype
    )
    # undo the int8 rebias (each selector column sums to exactly 1)
    r = (r0.astype(jnp.float32) * (1.0 - wy)
         + r1.astype(jnp.float32) * wy)

    cols = jax.lax.broadcasted_iota(jnp.int32, (w, p), 0)
    # combined column pick + x-lerp in one masked f32 reduction
    wxm = (cols == x0i) * (1.0 - wx) + (cols == x0i + 1) * wx
    out = jnp.sum(r * wxm, axis=0, keepdims=True) + bias
    out_ref[:] = jnp.where(valid, out, 0.0).reshape(1, SUBLANES, LANES)


@partial(jax.jit, static_argnames=("interpret", "use_int8"))
def pallas_bilinear_sample(
    image: jnp.ndarray,  # [H, W] any real dtype
    coords: jnp.ndarray,  # [..., 2] (x, y)
    interpret: bool = False,
    use_int8: bool = True,
) -> jnp.ndarray:  # [...]
    """Drop-in replacement for ops.resample.bilinear_sample."""
    h, w = image.shape
    batch_shape = coords.shape[:-1]
    p = 1
    for s in batch_shape:
        p *= s
    n_blocks = -(-p // BLOCK_P)
    p_pad = n_blocks * BLOCK_P

    flat = coords.reshape(p, 2).astype(jnp.float32)
    # pad with out-of-bounds coords (-1) so extra lanes produce 0
    pad = jnp.full((p_pad - p, 2), -1.0, dtype=jnp.float32)
    flat = jnp.concatenate([flat, pad], axis=0)
    xs = flat[:, 0].reshape(n_blocks, SUBLANES, LANES)
    ys = flat[:, 1].reshape(n_blocks, SUBLANES, LANES)

    if interpret:
        # CPU interpret mode: plain f32 dots.
        sel_dtype, acc_dtype, bias = jnp.float32, jnp.float32, 0.0
        image_t = image.astype(jnp.float32).T
    elif image.dtype == jnp.uint8 and use_int8:
        # int8 MXU path (2x bf16 rate), exact via the -128 rebias.
        sel_dtype, acc_dtype, bias = jnp.int8, jnp.int32, 128.0
        image_t = (image.astype(jnp.int32) - 128).astype(jnp.int8).T
    else:
        sel_dtype, acc_dtype, bias = jnp.bfloat16, jnp.float32, 0.0
        image_t = image.astype(jnp.bfloat16).T  # exact for 0..255 integers

    out = pl.pallas_call(
        partial(_warp_kernel, h=h, w=w, sel_dtype=sel_dtype,
                acc_dtype=acc_dtype, bias=bias),
        name="warp_fullheight",
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((w, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, SUBLANES, LANES), jnp.float32
        ),
        interpret=interpret,
    )(image_t, xs, ys)

    return out.reshape(p_pad)[:p].reshape(batch_shape)


def _warp_kernel_win(img_t_ref, x_ref, y_ref, meta_ref, out_ref, *,
                     h: int, w: int, h_pad: int, w_pad: int,
                     sel_dtype, acc_dtype, bias: float,
                     sublanes: int = SUBLANES,
                     win_x: int = WIN_X, win_y: int = WIN_Y):
    """Windowed warp: the row-pick matmuls contract a WIN_X x WIN_Y dynamic
    slice of the transposed source shared by the whole 1024-pixel block
    (bases precomputed outside, tile-aligned) — ~5x fewer MXU MACs and ~3x
    less VPU epilogue than full-height.  Blocks whose samples span more than
    the window fall back to the exact full-image path via pl.when; identical
    output either way.

    All 1024 pixels of the block are processed as ONE wide op set: the
    selector build / dots / lerp epilogue run on [n_y, 1024] / [n_x, 1024]
    tiles (2 wide MXU dots per block) instead of 8 x 128-lane slices (16
    narrow dots + 8 serialized epilogues — the round-3 structure, measured
    ~1.9x slower at the bench shape)."""

    def block(src, n_x, n_y, y_off, x_off):
        p = sublanes * LANES
        x = x_ref[0].reshape(1, p)
        y = y_ref[0].reshape(1, p)
        valid = (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
        x = jnp.clip(x, 0.0, w - 2)
        y = jnp.clip(y, 0.0, h - 2)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        x0i = x0.astype(jnp.int32) - x_off
        y0i = y0.astype(jnp.int32) - y_off

        rows = jax.lax.broadcasted_iota(jnp.int32, (n_y, p), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_x, p), 0)
        dn = (((1,), (0,)), ((), ()))
        oh_y0 = (rows == y0i).astype(sel_dtype)  # exact 0/1
        oh_y1 = (rows == y0i + 1).astype(sel_dtype)
        r0 = jax.lax.dot_general(
            src, oh_y0, dn, preferred_element_type=acc_dtype
        )  # [n_x, p]
        r1 = jax.lax.dot_general(
            src, oh_y1, dn, preferred_element_type=acc_dtype
        )
        # y-lerp + combined column pick / x-lerp in f32.  The int8 rebias is
        # restored on the reduced scalar: the column weights sum to exactly
        # 1, so the bias contributes exactly +bias.
        r = r0.astype(jnp.float32) * (1.0 - wy) + r1.astype(jnp.float32) * wy
        wxm = (cols == x0i) * (1.0 - wx) + (cols == x0i + 1) * wx
        res = jnp.sum(r * wxm, axis=0, keepdims=True) + bias
        return jnp.where(valid, res, 0.0).reshape(1, sublanes, LANES)

    lane_slices = block

    # bases are constructed tile-aligned; tell Mosaic so the dynamic slice
    # lowers to aligned vector loads
    x_base = pl.multiple_of(meta_ref[0, 0, 0], 32)
    y_base = pl.multiple_of(meta_ref[0, 0, 1], LANES)
    fits = meta_ref[0, 0, 2]

    @pl.when(fits != 0)
    def _():
        win = img_t_ref[pl.ds(x_base, win_x), pl.ds(y_base, win_y)]
        out_ref[:] = lane_slices(win, win_x, win_y, y_base, x_base)

    @pl.when(fits == 0)
    def _():
        out_ref[:] = lane_slices(img_t_ref[:], w_pad, h_pad, 0, 0)


def _warp_kernel_pool(src_ref, img_t_ref, x_ref, y_ref, meta_ref, out_ref, *,
                      h: int, w: int, h_pad: int, w_pad: int,
                      sel_dtype, acc_dtype, bias: float,
                      sublanes: int = SUBLANES,
                      win_x: int = WIN_X, win_y: int = WIN_Y):
    """Image-POOL variant of :func:`_warp_kernel_win`: the source image for
    this block arrives as a (1, w_pad, h_pad) slice of the preprocessed pool,
    selected by the scalar-prefetched per-block source index through the
    BlockSpec index_map (``src_ref`` itself is unused in the body — it only
    drives the pipeline's image DMA).  Identical sampling math."""

    def block(src, n_x, n_y, y_off, x_off):
        p = sublanes * LANES
        x = x_ref[0].reshape(1, p)
        y = y_ref[0].reshape(1, p)
        valid = (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
        x = jnp.clip(x, 0.0, w - 2)
        y = jnp.clip(y, 0.0, h - 2)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        x0i = x0.astype(jnp.int32) - x_off
        y0i = y0.astype(jnp.int32) - y_off

        rows = jax.lax.broadcasted_iota(jnp.int32, (n_y, p), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_x, p), 0)
        dn = (((1,), (0,)), ((), ()))
        oh_y0 = (rows == y0i).astype(sel_dtype)  # exact 0/1
        oh_y1 = (rows == y0i + 1).astype(sel_dtype)
        r0 = jax.lax.dot_general(
            src, oh_y0, dn, preferred_element_type=acc_dtype
        )  # [n_x, p]
        r1 = jax.lax.dot_general(
            src, oh_y1, dn, preferred_element_type=acc_dtype
        )
        r = r0.astype(jnp.float32) * (1.0 - wy) + r1.astype(jnp.float32) * wy
        wxm = (cols == x0i) * (1.0 - wx) + (cols == x0i + 1) * wx
        res = jnp.sum(r * wxm, axis=0, keepdims=True) + bias
        return jnp.where(valid, res, 0.0).reshape(1, sublanes, LANES)

    x_base = pl.multiple_of(meta_ref[0, 0, 0], 32)
    y_base = pl.multiple_of(meta_ref[0, 0, 1], LANES)
    fits = meta_ref[0, 0, 2]

    @pl.when(fits != 0)
    def _():
        win = img_t_ref[0, pl.ds(x_base, win_x), pl.ds(y_base, win_y)]
        out_ref[:] = block(win, win_x, win_y, y_base, x_base)

    @pl.when(fits == 0)
    def _():
        out_ref[:] = block(img_t_ref[0], w_pad, h_pad, 0, 0)


@partial(jax.jit, static_argnames=(
    "interpret", "use_int8", "sublanes", "win_x", "win_y", "column_major"))
def pallas_bilinear_sample_pool(
    images: jnp.ndarray,  # [M, H, W] image pool (uint8 or float)
    coords: jnp.ndarray,  # [Wn, h, w, 2] per-warp (x, y) source coords
    src_idx: jnp.ndarray,  # [Wn] int32 pool index per warp
    interpret: bool = False,
    use_int8: bool = True,
    sublanes: int = SUBLANES,
    win_x: int = 64,
    win_y: int = WIN_Y,
    column_major: bool = True,
) -> jnp.ndarray:  # [Wn, h, w]
    """Batched windowed warp over an image POOL (docs/ROOFLINE.md round-5
    item).  The per-warp vmap of :func:`pallas_bilinear_sample_windowed`
    makes XLA materialize a gathered/rebiased/transposed full source view
    PER WARP (~0.6-1.5 MB HBM each, ~4096x per tracker step) even though a
    frame only has 4 distinct camera images.  Here the whole pool is
    preprocessed ONCE (one pass: rebias + transpose + pad), and each grid
    block's image slice is selected inside the pipeline by a scalar-
    prefetched per-block source index consumed by the BlockSpec index_map —
    consecutive blocks with the same index reuse the VMEM copy, and XLA
    never sees a per-warp image at all.

    ``column_major`` applies the pallas_win_cm trick per warp (traverse dst
    pixels column-major so a block covers dst COLUMNS; on roughly
    scale-preserving warp grids the source box is then tall and narrow,
    shrinking the window to ``win_x`` = 64).  Same out-of-bounds contract
    and full-image fallback as every other sampler."""
    m, h, w = images.shape
    wn = coords.shape[0]
    ch, cw = coords.shape[1], coords.shape[2]
    if column_major:
        coords = jnp.swapaxes(coords, 1, 2)  # [Wn, cw, ch, 2]

    h_pad = -(-h // LANES) * LANES
    w_pad = -(-w // 32) * 32
    if h_pad < win_y or w_pad < win_x:
        win_x, win_y = w_pad, h_pad  # degenerate: window = whole image

    p = ch * cw  # pixels per warp
    block_p = sublanes * LANES
    bpw = -(-p // block_p)  # blocks per warp
    p_pad = bpw * block_p

    flat = coords.reshape(wn, p, 2).astype(jnp.float32)
    pad = jnp.full((wn, p_pad - p, 2), -1.0, dtype=jnp.float32)
    flat = jnp.concatenate([flat, pad], axis=1)  # [Wn, p_pad, 2]
    g = wn * bpw
    xs = flat[..., 0].reshape(g, sublanes, LANES)
    ys = flat[..., 1].reshape(g, sublanes, LANES)

    # Per-block tile-aligned window base + fits flag (same construction as
    # the single-image windowed kernel).
    x0 = jnp.floor(jnp.clip(xs, 0.0, w - 2)).astype(jnp.int32).reshape(g, block_p)
    y0 = jnp.floor(jnp.clip(ys, 0.0, h - 2)).astype(jnp.int32).reshape(g, block_p)
    x_base = jnp.minimum((jnp.min(x0, axis=1) // 32) * 32, w_pad - win_x)
    y_base = jnp.minimum(
        (jnp.min(y0, axis=1) // LANES) * LANES, h_pad - win_y
    )
    fits_x = (jnp.max(x0, axis=1) + 1 - x_base) <= win_x - 1
    fits_y = (jnp.max(y0, axis=1) + 1 - y_base) <= win_y - 1
    meta = jnp.stack(
        [x_base, y_base, (fits_y & fits_x).astype(jnp.int32)], axis=-1
    )[:, None, :]  # [G, 1, 3] int32 (SMEM blocks must match trailing dims)

    # Per-BLOCK source index for the scalar-prefetch index_map.
    src_per_block = jnp.repeat(src_idx.astype(jnp.int32), bpw)  # [G]

    if interpret:
        sel_dtype, acc_dtype, bias = jnp.float32, jnp.float32, 0.0
        pool_t = images.astype(jnp.float32)
    elif images.dtype == jnp.uint8 and use_int8:
        sel_dtype, acc_dtype, bias = jnp.int8, jnp.int32, 128.0
        pool_t = (images.astype(jnp.int32) - 128).astype(jnp.int8)
    else:
        sel_dtype, acc_dtype, bias = jnp.bfloat16, jnp.float32, 0.0
        pool_t = images.astype(jnp.bfloat16)
    # ONE preprocessing pass over the pool: transpose + pad to tile sizes.
    pool_t = jnp.swapaxes(pool_t, -1, -2)  # [M, W, H]
    pool_t = jnp.pad(pool_t, ((0, 0), (0, w_pad - w), (0, h_pad - h)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, w_pad, h_pad),
                lambda i, src: (src[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sublanes, LANES), lambda i, src: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sublanes, LANES), lambda i, src: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 3), lambda i, src: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sublanes, LANES), lambda i, src: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        partial(_warp_kernel_pool, h=h, w=w, h_pad=h_pad, w_pad=w_pad,
                sel_dtype=sel_dtype, acc_dtype=acc_dtype, bias=bias,
                sublanes=sublanes, win_x=win_x, win_y=win_y),
        name="warp_pool",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, sublanes, LANES), jnp.float32),
        interpret=interpret,
    )(src_per_block, pool_t, xs, ys, meta)

    out = out.reshape(wn, p_pad)[:, :p]
    if column_major:
        return jnp.swapaxes(out.reshape(wn, cw, ch), 1, 2)
    return out.reshape(wn, ch, cw)


@partial(jax.jit, static_argnames=(
    "interpret", "use_int8", "sublanes", "win_x", "win_y"))
def pallas_bilinear_sample_windowed(
    image: jnp.ndarray,  # [H, W] any real dtype
    coords: jnp.ndarray,  # [..., 2] (x, y)
    interpret: bool = False,
    use_int8: bool = True,
    sublanes: int = SUBLANES,
    win_x: int = WIN_X,
    win_y: int = WIN_Y,
) -> jnp.ndarray:  # [...]
    """Windowed variant of :func:`pallas_bilinear_sample` (same contract).

    The full-height kernel contracts every 1024-pixel output block against
    all H source rows and reduces over all W columns — O(P*H*W) work
    regardless of where the samples land.  Tracker crops are spatially
    coherent: 1024 consecutive pixels (10.7 output rows of a 96x96 crop)
    touch a small axis-aligned source box (measured on the synthetic tracker
    workload: y-extent <= 33 rows, x-extent <= 167 cols per block).  This
    variant precomputes, per block, a tile-aligned WIN_X x WIN_Y window of
    the transposed source covering that box and runs the row-pick matmuls +
    column-pick reductions on the window only; blocks whose box exceeds the
    window (heavy rotation / extreme close-ups) take the exact full-image
    path via pl.when.  Identical output either way, and bit-identical to
    :func:`pallas_bilinear_sample`.
    """
    h, w = image.shape
    h_pad = -(-h // LANES) * LANES  # lane dim of the transposed image
    w_pad = -(-w // 32) * 32  # sublane dim (int8 tile)
    if h_pad < win_y or w_pad < win_x:
        # window would exceed the (padded) source: nothing to win
        return pallas_bilinear_sample(
            image, coords, interpret=interpret, use_int8=use_int8
        )

    batch_shape = coords.shape[:-1]
    p = 1
    for s in batch_shape:
        p *= s
    block_p = sublanes * LANES
    n_blocks = -(-p // block_p)
    p_pad = n_blocks * block_p

    flat = coords.reshape(p, 2).astype(jnp.float32)
    # pad with out-of-bounds coords (-1) so extra lanes produce 0
    pad = jnp.full((p_pad - p, 2), -1.0, dtype=jnp.float32)
    flat = jnp.concatenate([flat, pad], axis=0)
    xs = flat[:, 0].reshape(n_blocks, sublanes, LANES)
    ys = flat[:, 1].reshape(n_blocks, sublanes, LANES)

    # Per-block tile-aligned window base + does-it-fit flag, shipped to the
    # kernel as SMEM scalars.  Uses the same clip/floor as the kernel.
    # x is the sublane dim of the transposed image (32-aligned base), y the
    # lane dim (128-aligned base).
    x0 = jnp.floor(jnp.clip(xs, 0.0, w - 2)).astype(jnp.int32)
    y0 = jnp.floor(jnp.clip(ys, 0.0, h - 2)).astype(jnp.int32)
    x0 = x0.reshape(n_blocks, block_p)
    y0 = y0.reshape(n_blocks, block_p)
    x_base = jnp.minimum((jnp.min(x0, axis=1) // 32) * 32, w_pad - win_x)
    y_base = jnp.minimum(
        (jnp.min(y0, axis=1) // LANES) * LANES, h_pad - win_y
    )
    fits_x = (jnp.max(x0, axis=1) + 1 - x_base) <= win_x - 1
    fits_y = (jnp.max(y0, axis=1) + 1 - y_base) <= win_y - 1
    meta = jnp.stack(
        [x_base, y_base, (fits_y & fits_x).astype(jnp.int32)], axis=-1
    )[:, None, :]  # [n_blocks, 1, 3] int32

    if interpret:
        # CPU interpret mode: plain f32 dots.
        sel_dtype, acc_dtype, bias = jnp.float32, jnp.float32, 0.0
        image_t = image.astype(jnp.float32).T
    elif image.dtype == jnp.uint8 and use_int8:
        # int8 MXU path (2x bf16 rate), exact via the -128 rebias.
        sel_dtype, acc_dtype, bias = jnp.int8, jnp.int32, 128.0
        image_t = (image.astype(jnp.int32) - 128).astype(jnp.int8).T
    else:
        sel_dtype, acc_dtype, bias = jnp.bfloat16, jnp.float32, 0.0
        image_t = image.astype(jnp.bfloat16).T  # exact for 0..255 integers
    image_t = jnp.pad(image_t, ((0, w_pad - w), (0, h_pad - h)))

    out = pl.pallas_call(
        partial(_warp_kernel_win, h=h, w=w, h_pad=h_pad, w_pad=w_pad,
                sel_dtype=sel_dtype, acc_dtype=acc_dtype, bias=bias,
                sublanes=sublanes, win_x=win_x, win_y=win_y),
        name="warp_windowed",
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (w_pad, h_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, sublanes, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sublanes, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 3), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sublanes, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, sublanes, LANES), jnp.float32
        ),
        interpret=interpret,
    )(image_t, xs, ys, meta)

    return out.reshape(p_pad)[:p].reshape(batch_shape)
