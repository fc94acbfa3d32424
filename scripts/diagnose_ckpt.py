#!/usr/bin/env python
"""Error decomposition of a checkpoint on the resident corpus (train or
eval split): which term carries the MPJPE (angles vs wrist trans/rot), and
whether the BN train/eval-stats gap matters."""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-eval", type=int, default=16)
    p.add_argument("--t", type=int, default=16)
    p.add_argument("--split", default="train", choices=["train", "eval"])
    p.add_argument("--seqs", type=int, default=16)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--bn-train", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scripts.resident_train import load_corpus
    from umetrack_tpu.models import init_model
    from umetrack_tpu.models.config import ModelConfig
    from umetrack_tpu.parallel.resident import resident_diagnose
    from umetrack_tpu.utils.checkpoints import load_checkpoint
    from umetrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    tag = (f"train_{args.n_train}_{args.t}" if args.split == "train"
           else f"eval_{args.n_eval}_{args.t}")
    corpus = load_corpus(tag)
    model, variables = init_model(
        jax.random.PRNGKey(0), ModelConfig(compute_dtype=args.dtype)
    )
    variables = load_checkpoint(args.ckpt, variables)
    idx = jnp.asarray(np.arange(args.seqs) % corpus.n_sequences, jnp.int32)
    out = resident_diagnose(
        model, variables, corpus, idx, jnp.asarray(0, jnp.int32),
        args.window, bn_train=args.bn_train,
    )
    print(json.dumps({k: float(v) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
