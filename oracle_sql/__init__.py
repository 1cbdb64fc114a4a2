"""DuckDB oracle-SQL registry for the driver contract.

``build(entry_globals)`` assembles the full {name: SQL} dict from the
part modules (split for navigability — VERDICT r03 #10: each part's
docstring lists the board entries it defines). The parts execute in
order against a shared mutable namespace ``g`` seeded with
``__spark_entry__``'s module globals, preserving the exact closure
semantics of the original single-function implementation.
"""

from __future__ import annotations

PARTS = ['part01', 'part02', 'part03', 'part04', 'part05']


def build(entry_globals: dict) -> dict:
    g = dict(entry_globals)
    out: dict = {}
    import importlib

    for name in PARTS:
        mod = importlib.import_module(f"oracle_sql.{name}")
        out = mod.add(out, g)
    return out
