"""Device mesh + sharding helpers.

The distributed design surface of the framework (SURVEY.md §2.3): a single
global mesh with a ``data`` axis (sequences / hand-samples) and a ``model``
axis (tensor-parallel channel sharding for the conv stacks).  The reference
has no collective backend at all — its scale-out was process pools and a
rank-sharding Sampler — so this layer is greenfield TPU design: shardings
are annotated, XLA inserts the collectives, and they ride ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    model_axis: int = 1,
) -> Mesh:
    """Mesh over ``devices`` shaped (data, model).

    ``model_axis``: size of the tensor-parallel axis.  The default is 1
    (pure data parallelism): at ~1M params the conv stacks are far too small
    for channel sharding to pay for its collectives — measured on the
    8-device virtual mesh, (data=4, model=2) evaluates ~2x slower than
    (data=8,) (scripts/scaling_bench.py).  TP remains available behind the
    flag for experiments; 0 = auto picks 2 when the device count is even.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis == 0:
        model_axis = 2 if n % 2 == 0 and n >= 2 else 1
    assert n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def param_sharding(mesh: Mesh, min_shard_size: int = 1024):
    """Per-leaf NamedSharding for a parameter pytree.

    Conv kernels (HWIO) and dense kernels whose output-channel dim divides
    the model axis are sharded over ``model`` (tensor parallelism); all other
    leaves are replicated.  BatchNorm scales/biases stay replicated so the
    normalization math needs no collectives.
    """
    model_size = mesh.shape["model"]

    def leaf_sharding(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if (
            model_size > 1
            and name.endswith("kernel")
            and leaf.ndim >= 2
            and leaf.shape[-1] % model_size == 0
            and leaf.size >= min_shard_size
        ):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return leaf_sharding


def shard_variables(variables, mesh: Mesh, min_shard_size: int = 1024):
    """Place a variables pytree onto the mesh (TP on big kernels)."""
    fn = param_sharding(mesh, min_shard_size)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, fn(path, leaf)), variables
    )


def batch_sharding(mesh: Mesh):
    """NamedSharding for batched data: leading axis over ``data``."""

    def fn(leaf):
        spec = [None] * leaf.ndim
        if leaf.ndim >= 1:
            spec[0] = "data"
        return NamedSharding(mesh, P(*spec))

    return fn


def shard_batch(batch, mesh: Mesh):
    fn = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, fn(a)), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
