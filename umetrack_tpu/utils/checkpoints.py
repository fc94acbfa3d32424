"""Checkpoint save/load.

The reference's only persistence is a raw ``torch.load`` state dict
(model_loader.py:84-88).  Here: native checkpoints via orbax (directory
format, async-capable) with a flax-msgpack single-file fallback, plus the
torch converter in ``models.convert`` for importing reference weights.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, variables: Any) -> str:
    """Save a variables pytree; directory -> orbax, ``.msgpack`` -> flax."""
    if path.endswith(".msgpack"):
        from flax import serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as fp:
            fp.write(serialization.to_bytes(variables))
        return path

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(variables), force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Load into the structure of ``target`` (an existing variables tree)."""
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as fp:
            return serialization.from_bytes(target, fp.read())

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), jax.device_get(target))
