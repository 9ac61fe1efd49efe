"""Deterministic stable hashing (seed-free, process-stable).

``stable_hash`` = first 8 bytes of sha256, big-endian unsigned — never
Python's ``hash()`` (not stable across processes). Used by the
synthetic-data generator and the deterministic geocoder
(FIXTURES.md §1).
"""

from __future__ import annotations

import hashlib

import numpy as np


def stable_hash(s: str | bytes) -> int:
    """First 8 bytes of sha256(s) as an unsigned 64-bit int."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.sha256(s).digest()[:8], "big")


def stable_hash_batch(strings) -> np.ndarray:
    """Vectorized-ish batch stable_hash → uint64 ndarray.

    sha256 has no numpy kernel; this is a tight C-loop over hashlib,
    used only at data-generation / ingest time (Arrow-batched), never
    in the relational hot path.
    """
    out = np.empty(len(strings), dtype=np.uint64)
    sha = hashlib.sha256
    for i, s in enumerate(strings):
        if isinstance(s, str):
            s = s.encode("utf-8")
        out[i] = int.from_bytes(sha(s).digest()[:8], "big")
    return out
