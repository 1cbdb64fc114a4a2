"""ES-style index aliases: a name → index-generation indirection.

The zero-downtime story of every reindex/reshard primitive in
``index_maint`` (new generation built beside the old, then swapped)
needs the last step: a stable NAME readers resolve at query time, so
the swap is one atomic metadata write and no caller ever holds a path
to a half-built index. Elasticsearch models this as aliases
(`POST _aliases` with atomic add+remove actions); here the registry is
one ``aliases.json`` in a directory of the caller's choosing, updated
via write-temp + ``os.replace`` — readers see the old or the new
mapping, never a torn file (same discipline as
``index_build.write_stats``).

An alias maps to a LIST of index dirs, like ES aliases spanning
several indices: a single-dir alias serves through ``search_topk``,
a multi-dir one through the federated ``search_topk_segments``
(global statistics, per-segment top-k) — so "this quarter" can alias
the live delta while "all" aliases every segment.

Reference analog: the reference hard-codes its one index path in the
server config (server/src/utils/index.js); aliases replace that with
the generation indirection a maintained deployment needs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

ALIASES_FILE = "aliases.json"


def _path(registry_dir: str) -> str:
    return os.path.join(registry_dir, ALIASES_FILE)


def list_aliases(registry_dir: str) -> dict[str, list[str]]:
    """The whole registry (empty dict when none exists yet)."""
    try:
        with open(_path(registry_dir)) as f:
            return {k: list(v) for k, v in json.load(f).items()}
    except FileNotFoundError:
        return {}


def _write(registry_dir: str, aliases: dict[str, list[str]]) -> None:
    os.makedirs(registry_dir, exist_ok=True)
    tmp = _path(registry_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f, indent=0, sort_keys=True)
    os.replace(tmp, _path(registry_dir))


def set_alias(
    registry_dir: str,
    alias: str,
    index_dirs: str | list[str],
    must_exist: bool = True,
) -> list[str]:
    """Point ``alias`` at one or more index dirs (replacing any prior
    mapping — the ES atomic add+remove swap). Returns the PRIOR dirs
    (empty list if the alias was new), so a deployment script can
    retire the old generation after the swap. ``must_exist`` verifies
    each target is a committed index (has stats.json) before the
    registry changes — an alias must never dangle."""
    dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
    if not dirs:
        raise ValueError("an alias needs at least one index dir")
    if must_exist:
        for d in dirs:
            if not os.path.exists(os.path.join(d, "stats.json")):
                raise ValueError(
                    f"alias {alias!r} target {d!r} is not a committed index "
                    "(no stats.json)"
                )
    aliases = list_aliases(registry_dir)
    prior = aliases.get(alias, [])
    aliases[alias] = dirs
    _write(registry_dir, aliases)
    return prior


def remove_alias(registry_dir: str, alias: str) -> list[str]:
    """Drop ``alias``; returns what it pointed at. Unknown alias raises
    (a deploy script deleting the wrong name should hear about it)."""
    aliases = list_aliases(registry_dir)
    if alias not in aliases:
        raise KeyError(f"unknown alias {alias!r}")
    prior = aliases.pop(alias)
    _write(registry_dir, aliases)
    return prior


def resolve_alias(registry_dir: str, alias: str) -> list[str]:
    aliases = list_aliases(registry_dir)
    if alias not in aliases:
        raise KeyError(f"unknown alias {alias!r}")
    return aliases[alias]


def load_alias(spark: SparkSession, registry_dir: str, alias: str):
    """Resolve and load: one Index for a single-dir alias, a list of
    Index for a multi-dir one (feed to ``search_topk_segments``)."""
    from .query_exec import Index

    dirs = resolve_alias(registry_dir, alias)
    indexes = [Index.load(spark, d) for d in dirs]
    return indexes[0] if len(indexes) == 1 else indexes


def search_alias(
    spark: SparkSession,
    registry_dir: str,
    alias: str,
    query_text: str,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Query by alias name: single-dir aliases serve via
    ``search_topk``, multi-dir via the federated
    ``search_topk_segments`` (global BM25 statistics across the
    aliased segments). Resolution happens per call — a concurrent
    ``set_alias`` swap is picked up by the next query, old readers
    finish against the generation they resolved (hardlink snapshots
    keep those files alive)."""
    from .query_exec import search_topk, search_topk_segments

    loaded = load_alias(spark, registry_dir, alias)
    if isinstance(loaded, list):
        return search_topk_segments(loaded, query_text, k=k, **kwargs)
    return search_topk(loaded, query_text, k=k, **kwargs)
