"""Batched rigid Procrustes (Kabsch) alignment.

Matches the reference decode semantics (model_utils.py:17-54): fit the
rotation+translation taking ``from_points`` onto ``to_points`` as a proper
rotation.  Two implementations:

- :func:`procrustes_align_quat` (default): Horn's quaternion method — the
  optimal rotation is the dominant eigenvector of a symmetric 4x4, found by
  a fixed-sweep cyclic Jacobi eigensolver (batched VPU work, robust to any
  eigengap, agrees with SVD to ~1e-4 on adversarial inputs) — far faster
  than the TPU SVD path and intrinsically proper-rotation (no det fix).
- :func:`procrustes_align_svd`: the classic SVD Kabsch with det-sign fix,
  kept as the accuracy oracle (``jnp.linalg.svd`` on TPU lowers to an
  expensive iterative decomposition).
"""
from __future__ import annotations

import jax.numpy as jnp


def _quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack(
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            axis=-1,
        ),
        jnp.stack(
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            axis=-1,
        ),
        jnp.stack(
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            axis=-1,
        ),
    ]
    return jnp.stack(rows, axis=-2)


def _horn_n_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Horn's 4x4 N matrix from the 3x3 correlation S[i,j] = sum a_i b_j."""
    sxx, sxy, sxz = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    syx, syy, syz = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    szx, szy, szz = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    rows = [
        jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], axis=-1),
        jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], axis=-1),
        jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], axis=-1),
        jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _givens(p: int, q: int, c: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Batched 4x4 Givens rotation in the (p, q) plane."""
    batch = c.shape
    j = jnp.broadcast_to(jnp.eye(4, dtype=c.dtype), (*batch, 4, 4))
    j = j.at[..., p, p].set(c)
    j = j.at[..., q, q].set(c)
    j = j.at[..., p, q].set(s)
    j = j.at[..., q, p].set(-s)
    return j


_JACOBI_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _sym4_max_eigvec(a: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Dominant eigenvector of batched symmetric 4x4 via cyclic Jacobi.

    Fixed sweep count, no data-dependent control flow; quadratic convergence
    makes 6 sweeps ample at f32 and, unlike power iteration, robustness does
    not depend on the eigengap.
    """
    v = jnp.broadcast_to(jnp.eye(4, dtype=a.dtype), a.shape)
    for _ in range(sweeps):
        for p, q in _JACOBI_PAIRS:
            apq = a[..., p, q]
            app = a[..., p, p]
            aqq = a[..., q, q]
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            j = _givens(p, q, c, s)
            a = jnp.swapaxes(j, -1, -2) @ a @ j
            v = v @ j
    idx = jnp.argmax(
        jnp.diagonal(a, axis1=-2, axis2=-1), axis=-1
    )  # [...] index of largest eigenvalue
    vec = jnp.take_along_axis(
        v, idx[..., None, None].repeat(4, axis=-2), axis=-1
    )[..., 0]
    return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)


def _dominant_rotation(m: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Optimal proper rotation for correlation ``m`` (Horn's method)."""
    scale = jnp.sqrt(jnp.sum(m * m, axis=(-2, -1)) + 1e-30)
    n = _horn_n_matrix(m / scale[..., None, None])
    q = _sym4_max_eigvec(n, sweeps)
    return _quat_to_matrix(q)


def procrustes_align_quat(
    from_points: jnp.ndarray,  # [B, N, 3]
    to_points: jnp.ndarray,  # [B, N, 3]
    iters: int = 6,
) -> jnp.ndarray:  # [B, 4, 4]
    from_mean = from_points.mean(axis=1)
    to_mean = to_points.mean(axis=1)
    from_c = from_points - from_mean[:, None, :]
    to_c = to_points - to_mean[:, None, :]

    m = jnp.einsum("bni,bnj->bij", from_c, to_c)
    rot = _dominant_rotation(m, iters)
    trans = to_mean - jnp.einsum("bij,bj->bi", rot, from_mean)

    out = jnp.zeros((from_points.shape[0], 4, 4), dtype=m.dtype)
    out = out.at[:, :3, :3].set(rot)
    out = out.at[:, :3, 3].set(trans)
    out = out.at[:, 3, 3].set(1.0)
    return out


def procrustes_align_svd(
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


def procrustes_align(
    from_points: jnp.ndarray,
    to_points: jnp.ndarray,
    method: str = "quat",
) -> jnp.ndarray:
    """Dispatch: "quat" (fast, default) or "svd" (oracle)."""
    if method == "quat":
        return procrustes_align_quat(from_points, to_points)
    if method == "svd":
        return procrustes_align_svd(from_points, to_points)
    raise ValueError(f"unknown procrustes method: {method}")
