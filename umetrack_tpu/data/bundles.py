"""Pytree helpers for host-side data bundles.

The reference hand-rolled a pytree system (``lib/data_utils/bundles.py``:
map_fields / collate / group / to_device over dataclasses and containers).
In JAX-land ``jax.tree_util`` already is that system — these are thin
wrappers giving the same capabilities for numpy host data, plus device
placement via ``jax.device_put``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np


def map_fields(fn: Callable, bundle: Any, only_type: Optional[type] = None) -> Any:
    """Apply ``fn`` to every leaf (optionally only leaves of ``only_type``)."""
    if only_type is None:
        return jax.tree_util.tree_map(fn, bundle)
    return jax.tree_util.tree_map(
        lambda x: fn(x) if isinstance(x, only_type) else x, bundle
    )


def collate(samples: Sequence[Any]) -> Any:
    """Stack a list of identically-structured bundles along a new axis 0
    (reference bundles.collate, bundles.py:155-206)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *samples)


def group(samples: Sequence[Any], fn: Callable) -> Any:
    """Combine corresponding leaves with ``fn`` (e.g. np.concatenate)
    (reference bundles.group, bundles.py:209-244)."""
    return jax.tree_util.tree_map(lambda *xs: fn(xs), *samples)


def to_device(bundle: Any, device=None) -> Any:
    """Move every array leaf onto a device / sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device) if x is not None else None, bundle
    )
