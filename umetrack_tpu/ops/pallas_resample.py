"""Pallas TPU kernel: bilinear image warp as MXU one-hot matmuls.

Arbitrary per-pixel gathers don't vectorize on the TPU VPU; the TPU-native
formulation turns the row/column picks of bilinear sampling into matmuls
against one-hot selector matrices so the systolic array does the gathering:

  per chunk of 128 output pixels
    oh_y0[h, p] = (floor(y[p]) == h)                [H, 128] bf16
    r0 = image^T @ oh_y0                            [W, 128] f32 on MXU
    r  = r0 * (1-wy) + r1 * wy                      row lerp
    out[p] = sum_w r[w, p] * (floor(x[p]) == w)     column pick + lerp

The source image stays resident in VMEM across the whole grid (a 480x640
bf16 view is ~600 KB), so the only HBM traffic is one image load + the
96x96 output store.  Exact for uint8-valued sources (bf16 holds 0..255
exactly; accumulation is f32).

Out-of-bounds rule matches ops.resample.bilinear_sample: any sample whose
floor cell isn't fully inside the image returns 0.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _warp_kernel(image_t_ref, x_ref, y_ref, out_ref, *, h: int, w: int,
                 sel_dtype=jnp.bfloat16):
    x = x_ref[:]  # [1, 128]
    y = y_ref[:]

    valid = (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
    x = jnp.clip(x, 0.0, w - 2)
    y = jnp.clip(y, 0.0, h - 2)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    rows = jax.lax.broadcasted_iota(jnp.float32, (h, LANES), 0)
    oh_y0 = (rows == y0).astype(sel_dtype)  # [H, 128]
    oh_y1 = (rows == y0 + 1.0).astype(sel_dtype)

    img_t = image_t_ref[:]  # [W, H] bf16 (f32 in interpret mode)
    r0 = jax.lax.dot_general(
        img_t, oh_y0,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [W, 128]
    r1 = jax.lax.dot_general(
        img_t, oh_y1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r = r0 * (1.0 - wy) + r1 * wy  # wy broadcasts [1,128] over [W,128]

    cols = jax.lax.broadcasted_iota(jnp.float32, (w, LANES), 0)
    m0 = (cols == x0).astype(jnp.float32)
    m1 = (cols == x0 + 1.0).astype(jnp.float32)
    c0 = jnp.sum(r * m0, axis=0, keepdims=True)  # [1, 128]
    c1 = jnp.sum(r * m1, axis=0, keepdims=True)

    out = c0 * (1.0 - wx) + c1 * wx
    out_ref[:] = jnp.where(valid, out, 0.0)


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
    n_chunks = -(-p // LANES)
    p_pad = n_chunks * LANES

    flat = coords.reshape(p, 2).astype(jnp.float32)
    # pad with out-of-bounds coords (-1) so extra lanes produce 0
    pad = jnp.full((p_pad - p, 2), -1.0, dtype=jnp.float32)
    flat = jnp.concatenate([flat, pad], axis=0)
    xs = flat[:, 0].reshape(n_chunks, LANES)
    ys = flat[:, 1].reshape(n_chunks, LANES)

    # CPU interpret mode lacks bf16 dot support; use f32 there.
    sel_dtype = jnp.float32 if interpret else jnp.bfloat16
    image_t = image.astype(sel_dtype).T  # [W, H]

    out = pl.pallas_call(
        partial(_warp_kernel, h=h, w=w, sel_dtype=sel_dtype),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((w, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks, LANES), jnp.float32),
        interpret=interpret,
    )(image_t, xs, ys)

    return out.reshape(p_pad)[:p].reshape(batch_shape)
