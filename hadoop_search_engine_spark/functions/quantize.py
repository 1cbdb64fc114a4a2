"""Cross-engine-stable decimal quantization for driver-side NumPy.

Every oracle-replayed driver computation quantizes intermediates to a
fixed decimal precision so both engines argmax/compare the SAME
numbers. The rounding mode matters: ``np.round`` is HALF-EVEN while
DuckDB ``round()`` and Spark ``F.round`` are HALF-AWAY-FROM-ZERO — a
value landing exactly on a half boundary (structurally common when a
decimal weight multiplies an already-quantized value, e.g. MMR's
``0.7 * rel`` with rel at 6 dp — the round-4 sf0.1 board catch)
rounds APART across engines. This helper reproduces the SQL engines'
mode bit-for-bit: ``copysign(floor(|x|·10^d + 0.5), x) / 10^d`` —
the same double multiply both engines perform, then half-away.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Element-wise decimal round, half away from zero — semantics of
    DuckDB ``round()`` / Spark ``F.round`` (and C++ ``std::round`` on
    the scaled value), NOT numpy's half-even. Accepts scalars or
    arrays; returns the same shape as float64."""
    m = float(10 ** decimals)
    a = np.asarray(x, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(a) * m + 0.5), a) / m
    return float(out) if np.ndim(x) == 0 else out
