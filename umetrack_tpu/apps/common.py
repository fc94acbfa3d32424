"""Shared CLI plumbing for the eval apps.

The reference hard-codes its configuration in ``__main__`` blocks
(run_eval_known_skeleton.py:104-119); here every entry point takes the same
runtime flags so the benched fast configuration (bf16 compute + the Pallas
windowed warp on TPU) IS the production configuration, and any app can join
a multi-host run via ``jax.distributed`` instead of manual rank math.
"""
from __future__ import annotations

import argparse
import os
from typing import Tuple

SAMPLERS = ["gather2d", "gather1d", "matmul", "pallas", "pallas_win", "pallas_win2", "pallas_win_cm"]


def add_runtime_flags(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--dtype", choices=["auto", "float32", "bfloat16"], default="auto",
        help="model compute dtype; 'auto' = bfloat16 on TPU, float32 "
        "elsewhere (bf16 full-sequence drift vs f32 is parity-tested "
        "within the 0.5 mm budget, tests/test_bf16.py)",
    )
    parser.add_argument(
        "--sampler", choices=SAMPLERS, default=None,
        help="bilinear warp implementation; default = best for the backend "
        "(pallas_win on TPU, gather1d elsewhere)",
    )
    parser.add_argument(
        "--coordinator", default=None,
        help="jax.distributed coordinator address (host:port); when set the "
        "app joins the multi-host runtime and shards sequences by "
        "jax.process_index(), overriding --rank/--world-size",
    )
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)


def resolve_dtype(dtype: str) -> str:
    if dtype != "auto":
        return dtype
    import jax

    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    return "bfloat16" if on_tpu else "float32"


def tracker_config_from_args(args, **overrides):
    """TrackerConfig with the CLI's sampler selection applied (config-first:
    the sampler flows through TrackerConfig into the jitted warp, never via
    env vars read at trace time)."""
    from ..tracker import TrackerConfig

    if getattr(args, "sampler", None):
        overrides.setdefault("sampler", args.sampler)
    return TrackerConfig(**overrides)


def setup_runtime(args) -> Tuple[int, int]:
    """Apply runtime flags; returns (rank, world_size) for sequence sharding.

    Must run before any JAX trace (``jax.distributed.initialize`` must
    precede backend init).
    """
    from ..parallel import distributed
    from ..utils.compile_cache import enable_compile_cache

    if args.coordinator or (args.num_processes and args.num_processes > 1):
        rank, world = distributed.initialize(
            args.coordinator, args.num_processes, args.process_id
        )
    else:
        rank = getattr(args, "rank", 0)
        world = getattr(args, "world_size", 1)
    enable_compile_cache()
    return rank, world


def load_model_cli(checkpoint: str | None, dtype: str = "auto"):
    """Build the model in the resolved compute dtype and load weights from an
    orbax/msgpack checkpoint dir or a reference ``.torch`` file."""
    import jax

    from ..models import init_model
    from ..models.config import ModelConfig
    from ..models.convert import load_torch_checkpoint
    from ..utils.checkpoints import load_checkpoint

    cfg = ModelConfig(compute_dtype=resolve_dtype(dtype))
    model, variables = init_model(jax.random.PRNGKey(0), cfg)
    if checkpoint:
        if checkpoint.endswith(".torch"):
            variables = load_torch_checkpoint(checkpoint)
        else:
            variables = load_checkpoint(checkpoint, variables)
    return model, variables
