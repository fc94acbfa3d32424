"""Batched rigid Procrustes (Kabsch) alignment with 3x3 SVD.

Matches the reference decode semantics (model_utils.py:17-54): fit the
rotation+translation taking ``from_points`` onto ``to_points``, with the
det-sign fix ensuring a proper rotation.  f32-stable on TPU via
``jnp.linalg.svd`` on the tiny 3x3 cross-covariance.
"""
from __future__ import annotations

import jax.numpy as jnp


def procrustes_align(
    from_points: jnp.ndarray,  # [B, N, 3]
    to_points: jnp.ndarray,  # [B, N, 3]
) -> jnp.ndarray:  # [B, 4, 4]
    from_mean = from_points.mean(axis=1)
    to_mean = to_points.mean(axis=1)
    from_c = from_points - from_mean[:, None, :]
    to_c = to_points - to_mean[:, None, :]

    m = jnp.einsum("bni,bnj->bij", from_c, to_c)  # [B, 3, 3]
    u, _, vh = jnp.linalg.svd(m)
    v = jnp.swapaxes(vh, -1, -2)
    vut = v @ jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(vut)
    w = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    w = w.at[..., 2, 2].set(det)

    rot = v @ w @ jnp.swapaxes(u, -1, -2)
    trans = to_mean - jnp.einsum("bij,bj->bi", rot, from_mean)

    out = jnp.zeros((from_points.shape[0], 4, 4), dtype=m.dtype)
    out = out.at[:, :3, :3].set(rot)
    out = out.at[:, :3, 3].set(trans)
    out = out.at[:, 3, 3].set(1.0)
    return out
