#!/usr/bin/env python
"""Measure the pool-kernel block-geometry ladder at the tracker shape.

Grid-step fixed overhead dominates sampling above the ~3 us/warp arithmetic
floor (docs/ROOFLINE.md round 5), so fewer/bigger blocks should win until
the source window stops covering a block's dst-column span and blocks fall
back to the exact full-image path.  This sweeps (sublanes, win_x) on the
real per-scan-step shape (F frames x 4 warp slots against F*4 pooled
views) with tracker-like warp grids and prints us/warp for each point.
"""
import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=256,
                   help="warp count = frames*4 slots; 256 frames = the "
                   "S=64 x T=4-slot per-step shape x4 scan steps worth")
    p.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from umetrack_tpu.ops.pallas_resample import pallas_bilinear_sample_pool

    rng = np.random.default_rng(0)
    f = args.frames
    h, w = args.hw
    c = args.crop
    n = 4
    pool = rng.integers(0, 255, size=(f * n, h, w)).astype(np.uint8)

    # tracker-like warp grids: rotation + ~2.2x scale + fisheye-ish radial
    gy, gx = np.mgrid[0:c, 0:c].astype(np.float32)
    wn = f * n
    ang = rng.uniform(-0.5, 0.5, size=wn).astype(np.float32)
    scale = rng.uniform(1.8, 2.6, size=wn).astype(np.float32)
    ox = rng.uniform(60, w - 280, size=wn).astype(np.float32)
    oy = rng.uniform(40, h - 260, size=wn).astype(np.float32)
    ca, sa = np.cos(ang), np.sin(ang)
    sx = scale[:, None, None] * (ca[:, None, None] * gx - sa[:, None, None] * gy) + ox[:, None, None]
    sy = scale[:, None, None] * (sa[:, None, None] * gx + ca[:, None, None] * gy) + oy[:, None, None]
    coords = np.stack([sx, sy], axis=-1)
    src_idx = np.arange(wn, dtype=np.int32)

    pool_j = jnp.asarray(pool)
    coords_j = jnp.asarray(coords)
    src_j = jnp.asarray(src_idx)

    ref = None
    for sublanes, win_x in [(8, 64), (8, 128), (16, 128), (24, 128),
                            (24, 192), (36, 192), (36, 256), (72, 256)]:
        try:
            fn = lambda: pallas_bilinear_sample_pool(
                pool_j, coords_j, src_j, sublanes=sublanes, win_x=win_x
            )
            out = fn()
            np.asarray(out[0, 0, 0])  # fetch barrier
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            np.asarray(out[0, 0, 0])
            dt = (time.perf_counter() - t0) / args.iters
            if ref is None:
                ref = np.asarray(out)
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(out) - ref)))
            print(f"sublanes={sublanes:3d} win_x={win_x:3d}: "
                  f"{dt * 1e6 / wn:7.2f} us/warp   max|diff|={err:.3g}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — ladder survey, report + go on
            print(f"sublanes={sublanes:3d} win_x={win_x:3d}: FAILED {e}",
                  flush=True)


if __name__ == "__main__":
    main()
