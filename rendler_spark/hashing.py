"""Deterministic 64-bit hash mixing, vectorized over numpy uint64 arrays.

This is the single source of randomness for the synthetic web (FIXTURES.md
§1): the engine's pandas UDFs and the pure-Python oracle simulator both call
these functions, so page content is byte-identical regardless of which side
generates it.  splitmix64 is the public-domain finalizer from Steele et al.,
"Fast Splittable Pseudorandom Number Generators" (OOPSLA 2014).

Everything here operates on numpy arrays end-to-end — no per-row Python —
so it is safe to call inside vectorized pandas UDFs (BASELINE.json:L6
"no per-row Python").
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)


def _sm64(z: np.ndarray) -> np.ndarray:
    """splitmix64 core without the errstate guard (caller holds it) —
    entering np.errstate per inner call dominated the mixing cost in the
    render kernel (guide §4.2: per-call overhead inside hot UDF loops)."""
    z = z + _GOLDEN
    z = (z ^ (z >> _U64(30))) * _M1
    z = (z ^ (z >> _U64(27))) * _M2
    return z ^ (z >> _U64(31))


def splitmix64(x) -> np.ndarray:
    """splitmix64 finalizer; accepts scalar or uint64 array, returns uint64."""
    with np.errstate(over="ignore"):
        return _sm64(np.asarray(x).astype(np.uint64, copy=True))


def mix(*parts) -> np.ndarray:
    """Fold any number of scalar/array uint64 parts into one hash.

    ``mix(seed, i, j, tag)`` — each part is mixed then xor-folded, so the
    result depends on order and on every part.  Broadcasting follows numpy
    rules (scalars broadcast against arrays).
    """
    with np.errstate(over="ignore"):
        acc = _U64(0x243F6A8885A308D3)  # pi fraction, arbitrary non-zero
        for p in parts:
            acc = _sm64(np.asarray(p).astype(np.uint64) ^ acc)
    return acc


def mix_int(*parts) -> int:
    """Scalar convenience: ``mix`` collapsed to a Python int."""
    return int(mix(*[np.uint64(p) for p in parts]))


def to_i64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 hash bits as signed int64 (Spark LongType)."""
    return np.asarray(u, dtype=np.uint64).view(np.int64)
