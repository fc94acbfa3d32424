"""Filesystem shim (abstraction point for blob storage, reference fs.py)."""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple


def walk(path: str) -> Iterator[Tuple[str, list, list]]:
    yield from os.walk(path)


def join(*parts: str) -> str:
    return os.path.join(*parts)


def basename(path: str) -> str:
    return os.path.basename(path)


def dirname(path: str) -> str:
    return os.path.dirname(path)


def exists(path: str) -> bool:
    return os.path.exists(path)


def open_file(path: str, mode: str = "rb"):
    return open(path, mode)


def read_bytes(path: str, start: Optional[int] = None, stop: Optional[int] = None) -> bytes:
    with open(path, "rb") as fp:
        if start:
            fp.seek(start)
        if stop is None:
            return fp.read()
        return fp.read(stop - (start or 0))
