"""Feature Transform Layer (FTL) for NHWC feature maps.

The reference treats the first/middle/last third of the channel dimension of
an NCHW map as X/Y/Z coordinates of (C/3 * H * W) points and applies a rigid
transform (model_utils.py:57-104).  Point k = (c', h, w) has coordinates
(f[n, c', h, w], f[n, C/3+c', h, w], f[n, 2C/3+c', h, w]) — in NHWC that is
simply three channel-group slices, so the FTL becomes nine fused
multiply-adds on the VPU with no relayout at all (vs. the reference's
reshape -> batched matmul -> reshape).
"""
from __future__ import annotations

import jax.numpy as jnp


def apply_ftl(
    xfs: jnp.ndarray,  # [..., 4, 4]
    features: jnp.ndarray,  # [..., H, W, C]
    ftl_ratio: float = 1.0,
) -> jnp.ndarray:
    """Rigid-transform the leading ``round(C*ratio)`` channels as 3D points.

    ``xfs`` batch dims must match the feature batch dims.  ``ftl_ratio`` is a
    static float; the transformed channel count must be divisible by 3.
    """
    assert 0.0 <= ftl_ratio <= 1.0
    if ftl_ratio == 0.0:
        return features

    c = features.shape[-1]
    nc_ftl = int(round(c * ftl_ratio))
    assert nc_ftl % 3 == 0, f"FTL channels {nc_ftl} not divisible by 3"
    c3 = nc_ftl // 3

    x = features[..., 0 * c3: 1 * c3]
    y = features[..., 1 * c3: 2 * c3]
    z = features[..., 2 * c3: 3 * c3]

    r = xfs[..., :3, :3]
    t = xfs[..., :3, 3]
    # Broadcast [..., 1, 1, 1] rotation entries over [..., H, W, c3].
    def e(i, j):
        return r[..., i, j][..., None, None, None]

    def tt(i):
        return t[..., i][..., None, None, None]

    xo = e(0, 0) * x + e(0, 1) * y + e(0, 2) * z + tt(0)
    yo = e(1, 0) * x + e(1, 1) * y + e(1, 2) * z + tt(1)
    zo = e(2, 0) * x + e(2, 1) * y + e(2, 2) * z + tt(2)

    out = jnp.concatenate([xo, yo, zo], axis=-1)
    if nc_ftl != c:
        out = jnp.concatenate([out, features[..., nc_ftl:]], axis=-1)
    return out


def singlev_scale_xf(
    intrinsics: jnp.ndarray,  # [..., 3, 3]
    canonical_focal_length: float = 200.0,
) -> jnp.ndarray:  # [..., 4, 4]
    """Intrinsics factorization K = K_canonical * S; S scales z by f/f_c.

    Mirrors model_utils.py:166-192: the backbone predicts point features in a
    canonical-focal camera; S maps them back to the view's true intrinsics.
    """
    focal = intrinsics[..., 0, 0]
    batch = focal.shape
    eye = jnp.broadcast_to(
        jnp.eye(4, dtype=intrinsics.dtype), (*batch, 4, 4)
    )
    return eye.at[..., 2, 2].set(focal / canonical_focal_length)
