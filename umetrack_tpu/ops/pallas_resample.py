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

A row-windowed variant (contracting over a 64-row source window) was
measured 8x SLOWER than these full-height matmuls despite 7.5x fewer FLOPs:
the per-slice ``lax.cond`` + sublane-dynamic-slice + transposed contraction
dominate.  Full-height row picks keep the MXU at ~60% utilization.

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


def _warp_kernel(image_t_ref, x_ref, y_ref, out_ref, *, h: int, w: int,
                 sel_dtype, acc_dtype, bias: float):
    img_t = image_t_ref[:]  # [W, H] int8 / bf16 (f32 in interpret mode)

    def lane_slice(i):
        x = x_ref[0, i, :].reshape(1, LANES)
        y = y_ref[0, i, :].reshape(1, LANES)

        valid = (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
        x = jnp.clip(x, 0.0, w - 2)
        y = jnp.clip(y, 0.0, h - 2)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (h, LANES), 0)
        oh_y0 = (rows == y0i).astype(sel_dtype)  # exact 0/1
        oh_y1 = (rows == y0i + 1).astype(sel_dtype)

        dn = (((1,), (0,)), ((), ()))
        r0 = jax.lax.dot_general(
            img_t, oh_y0, dn, preferred_element_type=acc_dtype
        )  # [W, 128]
        r1 = jax.lax.dot_general(
            img_t, oh_y1, dn, preferred_element_type=acc_dtype
        )
        # undo the int8 rebias (each selector column sums to exactly 1)
        r0 = r0.astype(jnp.float32) + bias
        r1 = r1.astype(jnp.float32) + bias
        r = r0 * (1.0 - wy) + r1 * wy  # wy broadcasts [1,128] over [W,128]

        cols = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0)
        # combined column pick + x-lerp in one masked f32 reduction
        wxm = (cols == x0i) * (1.0 - wx) + (cols == x0i + 1) * wx
        out = jnp.sum(r * wxm, axis=0, keepdims=True)  # [1, 128]
        return jnp.where(valid, out, 0.0)

    out_ref[:] = jnp.concatenate(
        [lane_slice(i) for i in range(SUBLANES)], axis=0
    )[None]


@partial(jax.jit, static_argnames=("interpret",))
def pallas_bilinear_sample(
    image: jnp.ndarray,  # [H, W] any real dtype
    coords: jnp.ndarray,  # [..., 2] (x, y)
    interpret: bool = False,
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

    import os

    use_int8 = os.environ.get("UMETRACK_PALLAS_INT8", "1") != "0"
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
