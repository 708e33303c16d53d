"""Cross-engine numeric conventions for the Arrow (numpy) kernels.

Every rounded value this repo emits must reproduce bit-for-bit in the
DuckDB oracles, so the numpy kernels must round the way F.round and
DuckDB's round() do — half AWAY FROM ZERO. np.round is banker's
(half-to-even): a value landing exactly on a 5e-7 midpoint diverges
between engines (the round-5 ADVICE finding against kmeans_assign and
jl_project)."""

from __future__ import annotations


def round_half_up(x, digits: int = 6):
    """Round a numpy array half away from zero to `digits` decimals —
    F.round/DuckDB semantics, not np.round's half-to-even."""
    import numpy as np

    s = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s
