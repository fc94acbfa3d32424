"""Image warping / resampling ops (jnp gather implementation).

Two warp entry points mirror the reference's two warp paths:

- :func:`resample_images` — dst-pixel homography warp, the spec being the
  reference's vectorized numpy ``_resample_images_batched``
  (/root/reference/lib/batched_dataset/data_transform.py:78-144): a dst pixel
  samples the src image bilinearly at ``H @ (u, v, 1)``; dst pixels whose
  source falls outside ``[0, w-2] x [0, h-2]`` stay 0.
- :func:`fisheye_to_pinhole_coords` — per-pixel unproject(pinhole crop) ->
  world -> project(fisheye) coordinate field, the spec being the tracker's
  ``_warp_image`` (tracker.py:54-80) incl. the z<0 -> invalid mask.

Both feed :func:`bilinear_sample`, a pure gather+lerp that XLA fuses well; a
Pallas kernel with the same contract can swap in underneath.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import affine
from ..geometry.cameras import Fisheye62Camera, fisheye62_distort, arctan_project


def _sample_prep(image_shape, coords):
    """Shared validity mask, integer cells and lerp weights."""
    h, w = image_shape
    x = coords[..., 0]
    y = coords[..., 1]
    valid = (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
    x = jnp.clip(x, 0.0, w - 2)
    y = jnp.clip(y, 0.0, h - 2)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    return valid, x0, y0, x - x0, y - y0


def _bilinear_gather2d(image, coords):
    """Four 2-D advanced-index gathers (straightforward XLA gather)."""
    valid, x0, y0, wx, wy = _sample_prep(image.shape, coords)
    x1 = x0 + 1
    y1 = y0 + 1
    f00 = image[y0, x0]
    f01 = image[y1, x0]
    f10 = image[y0, x1]
    f11 = image[y1, x1]
    out = (
        f00 * (1 - wx) * (1 - wy)
        + f10 * wx * (1 - wy)
        + f01 * (1 - wx) * wy
        + f11 * wx * wy
    )
    return jnp.where(valid, out, 0.0)


def _bilinear_gather1d(image, coords):
    """Flattened linear-index take (XLA's preferred 1-D gather form)."""
    h, w = image.shape
    valid, x0, y0, wx, wy = _sample_prep(image.shape, coords)
    flat = image.reshape(-1)
    base = y0 * w + x0
    f00 = jnp.take(flat, base, mode="clip")
    f10 = jnp.take(flat, base + 1, mode="clip")
    f01 = jnp.take(flat, base + w, mode="clip")
    f11 = jnp.take(flat, base + w + 1, mode="clip")
    out = (
        f00 * (1 - wx) * (1 - wy)
        + f10 * wx * (1 - wy)
        + f01 * (1 - wx) * wy
        + f11 * wx * wy
    )
    return jnp.where(valid, out, 0.0)


def _bilinear_matmul(image, coords):
    """Gather-as-matmul: ride the MXU instead of the gather unit.

    Row pick via one-hot [P, H] @ image [H, W] (bf16 inputs, f32
    accumulation — exact for uint8-range pixels), row-lerp, then column pick
    via a masked reduction.  O(P * H * W) FLOPs but they are MXU FLOPs,
    which on TPU can beat serialized per-element gathers by a wide margin.
    """
    h, w = image.shape
    valid, x0, y0, wx, wy = _sample_prep(image.shape, coords)
    batch_shape = coords.shape[:-1]
    p = int(np.prod(batch_shape))
    x0f = x0.reshape(p)
    y0f = y0.reshape(p)
    wxf = wx.reshape(p)
    wyf = wy.reshape(p)

    rows = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
    oh_y0 = (rows == y0f[:, None]).astype(jnp.bfloat16)
    oh_y1 = (rows == (y0f[:, None] + 1)).astype(jnp.bfloat16)
    img_bf = image.astype(jnp.bfloat16)
    r0 = jnp.dot(oh_y0, img_bf, preferred_element_type=jnp.float32)
    r1 = jnp.dot(oh_y1, img_bf, preferred_element_type=jnp.float32)
    r = r0 * (1 - wyf)[:, None] + r1 * wyf[:, None]  # [P, W]

    cols = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)
    m0 = (cols == x0f[:, None]).astype(r.dtype)
    m1 = (cols == (x0f[:, None] + 1)).astype(r.dtype)
    c0 = jnp.sum(r * m0, axis=-1)
    c1 = jnp.sum(r * m1, axis=-1)
    out = (c0 * (1 - wxf) + c1 * wxf).reshape(batch_shape)
    return jnp.where(valid, out, 0.0)


def _bilinear_pallas(image, coords, use_int8=True, interpret=False):
    from .pallas_resample import pallas_bilinear_sample

    return pallas_bilinear_sample(
        image, coords, use_int8=use_int8, interpret=interpret
    )


def _bilinear_pallas_win(image, coords, use_int8=True, interpret=False):
    from .pallas_resample import pallas_bilinear_sample_windowed

    return pallas_bilinear_sample_windowed(
        image, coords, use_int8=use_int8, interpret=interpret
    )


def _bilinear_pallas_win2(image, coords, use_int8=True, interpret=False):
    """Windowed kernel with 2048-pixel blocks (16 sublanes): half the grid
    steps and per-block overheads of pallas_win at ~11% more padded lanes."""
    from .pallas_resample import pallas_bilinear_sample_windowed

    return pallas_bilinear_sample_windowed(
        image, coords, use_int8=use_int8, sublanes=16, interpret=interpret
    )


def _bilinear_pallas_win_cm(image, coords, use_int8=True, interpret=False):
    """Column-major windowed warp: traverse dst pixels column-major so a
    1024-pixel block covers ~10.7 dst COLUMNS.  On warp grids that are
    roughly scale-preserving, the block's source box is then tall and
    narrow — the window shrinks from [224, 256] to [64, 256] in the
    transposed image, cutting both the masked column-pick epilogue (the
    measured VPU bottleneck of the sampling phase) and the row-pick MACs
    ~3.5x.  Exact same out-of-bounds contract; blocks that exceed the
    window take the exact full-image fallback.

    Only worthwhile for [h, w(, 2)]-shaped coordinate GRIDS (the tracker's
    case); arbitrary coord lists should use pallas_win.
    """
    from .pallas_resample import pallas_bilinear_sample_windowed

    if coords.ndim < 3:
        return pallas_bilinear_sample_windowed(
            image, coords, use_int8=use_int8, interpret=interpret
        )
    coords_cm = jnp.swapaxes(coords, -3, -2)  # [w, h, 2] column-major
    out = pallas_bilinear_sample_windowed(
        image, coords_cm, use_int8=use_int8, win_x=64, win_y=256,
        interpret=interpret,
    )
    return jnp.swapaxes(out, -2, -1)


_SAMPLERS = {
    "gather2d": _bilinear_gather2d,
    "gather1d": _bilinear_gather1d,
    "matmul": _bilinear_matmul,
    "pallas": _bilinear_pallas,
    "pallas_win": _bilinear_pallas_win,
    "pallas_win2": _bilinear_pallas_win2,
    "pallas_win_cm": _bilinear_pallas_win_cm,
}


def default_sampler() -> str:
    """On TPU the column-major windowed Pallas MXU kernel wins the A/B
    (v5e, S=64 tracker prep: 96.0 ms vs 105.7 row-major windowed vs
    ~620 us/warp XLA gather; scripts/profile_tracker.py --samplers and
    docs/ROOFLINE.md); elsewhere (CPU tests, interpret-less platforms) the
    portable gather is the default.  Selection is config, not env
    (TrackerConfig.sampler): env vars read at trace time inside jit
    silently stop working after the first trace."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    return "pallas_win_cm" if on_tpu else "gather1d"


def bilinear_sample(
    image: jnp.ndarray,  # [H, W]
    coords: jnp.ndarray,  # [..., 2] (x, y) source pixel coords
    method: str | None = None,
    use_int8: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:  # [...]
    """Bilinear sampling with zero outside ``[0, W-2] x [0, H-2]``.

    Matches the reference resampler's out-of-bounds rule
    (data_transform.py:104-109): a sample is valid only when its floor cell
    has all four neighbors inside the image; invalid samples return 0.
    Five equivalent implementations are selectable (see _SAMPLERS); the
    default is the Pallas MXU kernel, which A/B-benchmarks fastest on TPU
    (scripts/profile_tracker.py --samplers).  ``use_int8`` only affects the
    Pallas kernels (uint8 sources on the int8 MXU path).
    """
    resolved = method or default_sampler()
    fn = _SAMPLERS[resolved]
    # Dispatch on the RESOLVED name so use_int8 reaches every pallas*
    # sampler including the TPU default when method is None (ADVICE r4:
    # dispatching on the raw `method` silently dropped use_int8 for the
    # default path, making TrackerConfig.pallas_int8 a no-op there).
    if resolved.startswith("pallas"):
        return fn(image, coords, use_int8=use_int8, interpret=interpret)
    return fn(image, coords)


def _dst_grid(height: int, width: int, dtype=jnp.float32):
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    return px, py  # each [H, W]


def resample_images(
    images: jnp.ndarray,  # [N, H, W]
    resample_xfs: jnp.ndarray,  # [N, 4, 4] dst-pixel -> src-pixel homography
    out_size: Tuple[int, int],  # (height, width)
) -> jnp.ndarray:  # [N, h, w]
    """Warp ``images`` through per-image pixel homographies.

    ``resample_xfs`` takes homogeneous dst pixels (u, v, 1) to src pixels,
    i.e. the K_src @ E_src^-1... chain computed by the crop math
    (data_transform.py:57-75).
    """
    h_out, w_out = out_size
    px, py = _dst_grid(h_out, w_out, images.dtype)
    ones = jnp.ones_like(px)
    grid = jnp.stack([px, py, ones], axis=-1)  # [h, w, 3]

    r = resample_xfs[:, 0:3, 0:3]
    t = resample_xfs[:, 0:3, 3]
    pts = jnp.einsum("nij,hwj->nhwi", r, grid) + t[:, None, None, :]
    coords = pts[..., 0:2] / pts[..., 2:3]
    return jax.vmap(bilinear_sample)(images, coords)


def fisheye_to_pinhole_coords(
    dst_intrinsics: jnp.ndarray,  # [3, 3] crop pinhole K
    dst_T_world_from_eye: jnp.ndarray,  # [4, 4]
    src_cam: Fisheye62Camera,  # unbatched
    out_size: Tuple[int, int],  # (height, width)
) -> jnp.ndarray:  # [h, w, 2]
    """Source-pixel coordinate field for warping a fisheye view into a crop
    camera; invalid (behind-camera) pixels get coordinate -1 like the
    reference (tracker.py:71-73)."""
    h_out, w_out = out_size
    px, py = _dst_grid(h_out, w_out, dst_T_world_from_eye.dtype)
    fx = dst_intrinsics[0, 0]
    fy = dst_intrinsics[1, 1]
    cx = dst_intrinsics[0, 2]
    cy = dst_intrinsics[1, 2]
    qx = (px - cx) / fx
    qy = (py - cy) / fy

    # Fold (normalize -> dst eye->world -> world->src eye) into one 3x3 + an
    # offset scaled by |d|: with d = (qx, qy, 1) the exact chain is
    #   src_eye = (Rs^T Rd d + |d| * Rs^T (td - ts)) / |d|
    # and the equidistant projection below is invariant under positive
    # scaling, so the division (3 VPU divs per pixel) is dropped entirely.
    t_src = src_cam.T_world_from_eye
    r_src_t = jnp.swapaxes(t_src[..., :3, :3], -1, -2)
    m = r_src_t @ dst_T_world_from_eye[:3, :3]
    b = affine.transform_vec3(
        r_src_t, dst_T_world_from_eye[:3, 3] - t_src[..., :3, 3]
    )
    d = jnp.stack([qx, qy, jnp.ones_like(qx)], axis=-1)  # [h, w, 3] eye rays
    norm_d = jnp.sqrt(qx * qx + qy * qy + 1.0)[..., None]
    src_eye = affine.transform_vec3(m, d) + norm_d * b
    p = arctan_project(src_eye)
    q = fisheye62_distort(src_cam.coeffs, p)
    win = q * src_cam.f + src_cam.c

    invalid = src_eye[..., 2] < 0
    return jnp.where(invalid[..., None], -1.0, win)


def warp_fisheye_to_pinhole(
    image: jnp.ndarray,  # [H, W]
    dst_intrinsics: jnp.ndarray,
    dst_T_world_from_eye: jnp.ndarray,
    src_cam: Fisheye62Camera,
    out_size: Tuple[int, int],
    method: str | None = None,
    use_int8: bool = True,
) -> jnp.ndarray:  # [h, w]
    coords = fisheye_to_pinhole_coords(
        dst_intrinsics, dst_T_world_from_eye, src_cam, out_size
    )
    return bilinear_sample(image, coords, method=method, use_int8=use_int8)
