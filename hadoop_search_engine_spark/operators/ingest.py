"""ES-style ingest pipelines: JSON-declared per-document transforms
applied BEFORE indexing.

Elasticsearch runs documents through an *ingest pipeline* — an ordered
list of processors (`set`, `rename`, `remove`, `lowercase`, `trim`,
`gsub`, `split`, `convert`, ...) — between receipt and indexing. The
Spark-native equivalent compiles the same JSON processor list into a
chain of Column expressions over the documents frame: declarative in,
Catalyst-fused out (every processor is a JVM expression — the whole
pipeline rides the scan, no Python, no shuffle). A pipeline is data,
so it can live in a config file beside the index and replay
byte-identically in the DuckDB oracle.

Supported processors (the commonly-used core; each mirrors the ES
processor's semantics on a single field):

* ``{"set": {"field": f, "value": v}}`` — literal column (overwrites)
* ``{"copy": {"from": a, "to": b}}`` — duplicate a column
* ``{"rename": {"field": a, "target_field": b}}``
* ``{"remove": {"field": f}}``
* ``{"lowercase"|"uppercase"|"trim": {"field": f}}``
* ``{"gsub": {"field": f, "pattern": p, "replacement": r}}`` — regex
  replace-all (Java regex syntax — document patterns accordingly)
* ``{"split": {"field": f, "separator": regex}}`` — string -> array
* ``{"join": {"field": f, "separator": s}}`` — array -> string
* ``{"convert": {"field": f, "type": "integer"|"long"|"double"|
  "string"|"boolean"}}``
* ``{"substring": {"field": f, "start": i, "length": n}}`` (1-based,
  the SQL convention)
* ``{"default": {"field": f, "value": v}}`` — fill nulls only
* ``{"drop": {"if_missing": f}}`` — drop rows where f IS NULL (the
  ES drop processor's common guard shape)

Unknown processors or malformed bodies raise ``ValueError`` loudly —
pipelines are config, and a silently skipped processor is a corrupt
corpus. Reference analog: the reference's ingest does fixed-shape ETL
in process.py (processVideo/process.py:204-219); the pipeline makes
that declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONVERT_TYPES = {
    "integer": "int",
    "long": "long",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
}


def _one(proc: dict) -> tuple[str, dict]:
    if not isinstance(proc, dict) or len(proc) != 1:
        raise ValueError(f"processor must be a single-key dict, got {proc!r}")
    [(kind, body)] = proc.items()
    if not isinstance(body, dict):
        raise ValueError(f"processor {kind!r} body must be a dict")
    return kind, body


def _need(body: dict, kind: str, *keys: str) -> list:
    out = []
    for k in keys:
        if k not in body:
            raise ValueError(f"processor {kind!r} needs {k!r}")
        out.append(body[k])
    return out


def apply_pipeline(docs: DataFrame, processors: list[dict]) -> DataFrame:
    """Compile + apply the processor list in order. Column references
    are validated against the frame as the pipeline unfolds, so a
    typo'd field fails at compile time, not at job time."""
    out = docs
    for proc in processors:
        kind, body = _one(proc)
        if kind == "set":
            f, v = _need(body, kind, "field", "value")
            out = out.withColumn(f, F.lit(v))
            continue
        if kind == "drop":
            (f,) = _need(body, kind, "if_missing")
            _check(out, f, kind)
            out = out.where(F.col(f).isNotNull())
            continue
        if kind == "copy":
            a, b = _need(body, kind, "from", "to")
            _check(out, a, kind)
            out = out.withColumn(b, F.col(a))
            continue
        if kind == "rename":
            a, b = _need(body, kind, "field", "target_field")
            _check(out, a, kind)
            if b in out.columns:
                # ES rename-processor semantics: existing target is an
                # error. withColumnRenamed would otherwise mint a
                # DUPLICATE column name (later refs ambiguous) while
                # the DuckDB replay overwrites — a silent cross-engine
                # divergence. Both compilers now raise.
                raise ValueError(
                    f"rename target_field {b!r} already exists "
                    f"(have {out.columns}); remove it first"
                )
            out = out.withColumnRenamed(a, b)
            continue
        if kind == "remove":
            (f,) = _need(body, kind, "field")
            _check(out, f, kind)
            out = out.drop(f)
            continue
        (f,) = _need(body, kind, "field")
        _check(out, f, kind)
        c = F.col(f)
        if kind == "lowercase":
            expr = F.lower(c)
        elif kind == "uppercase":
            expr = F.upper(c)
        elif kind == "trim":
            expr = F.trim(c)
        elif kind == "gsub":
            p, r = _need(body, kind, "pattern", "replacement")
            expr = F.regexp_replace(c, p, r)
        elif kind == "split":
            (sep,) = _need(body, kind, "separator")
            expr = F.split(c, sep)
        elif kind == "join":
            (sep,) = _need(body, kind, "separator")
            expr = F.array_join(c, sep)
        elif kind == "convert":
            (t,) = _need(body, kind, "type")
            if t not in _CONVERT_TYPES:
                raise ValueError(
                    f"convert type must be one of {sorted(_CONVERT_TYPES)}, "
                    f"got {t!r}"
                )
            expr = c.cast(_CONVERT_TYPES[t])
        elif kind == "substring":
            i, n = _need(body, kind, "start", "length")
            expr = F.substring(c, int(i), int(n))
        elif kind == "default":
            (v,) = _need(body, kind, "value")
            expr = F.coalesce(c, F.lit(v))
        else:
            raise ValueError(f"unknown ingest processor {kind!r}")
        out = out.withColumn(f, expr)
    return out


def _check(df: DataFrame, field: str, kind: str) -> None:
    if field not in df.columns:
        raise ValueError(
            f"processor {kind!r} references missing field {field!r} "
            f"(have {df.columns})"
        )


def _sql_lit(v) -> str:
    """Render a processor value as a safe DuckDB literal: quotes
    doubled for strings (an apostrophe in a `set` value must not break
    the oracle), None -> NULL, bools -> TRUE/FALSE (repr would emit
    'None'/'True', invalid or mistyped SQL), numbers via repr."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def sql_pipeline_duckdb(processors: list[dict], base_cols: list[str]) -> str:
    """DuckDB replay: the same processor list as a chain of SELECT
    rewrites over ``documents`` (oracle side of the parity contract).
    Returns a full SELECT producing the pipeline's output columns.
    ``gsub`` patterns must stay inside the Java∩RE2-safe subset the
    redact/tokenize oracles already use."""
    cols: dict[str, str] = {c: c for c in base_cols}
    order: list[str] = list(base_cols)

    def set_col(name: str, expr: str) -> None:
        if name not in cols:
            order.append(name)
        cols[name] = expr

    filters: list[str] = []
    for proc in processors:
        kind, body = _one(proc)
        if kind == "set":
            f, v = _need(body, kind, "field", "value")
            set_col(f, _sql_lit(v))
        elif kind == "drop":
            (f,) = _need(body, kind, "if_missing")
            filters.append(f"({cols[f]}) IS NOT NULL")
        elif kind == "copy":
            a, b = _need(body, kind, "from", "to")
            set_col(b, cols[a])
        elif kind == "rename":
            a, b = _need(body, kind, "field", "target_field")
            if b in cols:
                # parity with apply_pipeline: existing target is an
                # error in both compilers (ES rename semantics)
                raise ValueError(
                    f"rename target_field {b!r} already exists "
                    f"(have {order}); remove it first"
                )
            set_col(b, cols[a])
            order.remove(a)
            del cols[a]
        elif kind == "remove":
            (f,) = _need(body, kind, "field")
            order.remove(f)
            del cols[f]
        elif kind == "lowercase":
            (f,) = _need(body, kind, "field")
            set_col(f, f"lower({cols[f]})")
        elif kind == "uppercase":
            (f,) = _need(body, kind, "field")
            set_col(f, f"upper({cols[f]})")
        elif kind == "trim":
            (f,) = _need(body, kind, "field")
            set_col(f, f"trim({cols[f]})")
        elif kind == "gsub":
            f, p, r = _need(body, kind, "field", "pattern", "replacement")
            set_col(f, f"regexp_replace({cols[f]}, '{p}', '{r}', 'g')")
        elif kind == "split":
            f, sep = _need(body, kind, "field", "separator")
            set_col(f, f"regexp_split_to_array({cols[f]}, '{sep}')")
        elif kind == "join":
            f, sep = _need(body, kind, "field", "separator")
            set_col(f, f"array_to_string({cols[f]}, '{sep}')")
        elif kind == "convert":
            f, t = _need(body, kind, "field", "type")
            duck = {"integer": "INTEGER", "long": "BIGINT",
                    "double": "DOUBLE", "float": "FLOAT",
                    "string": "VARCHAR", "boolean": "BOOLEAN"}[t]
            set_col(f, f"CAST({cols[f]} AS {duck})")
        elif kind == "substring":
            f, i, n = _need(body, kind, "field", "start", "length")
            set_col(f, f"substr({cols[f]}, {int(i)}, {int(n)})")
        elif kind == "default":
            f, v = _need(body, kind, "field", "value")
            set_col(f, f"coalesce({cols[f]}, {_sql_lit(v)})")
        else:
            raise ValueError(f"unknown ingest processor {kind!r}")
    select = ", ".join(f"({cols[c]}) AS {c}" for c in order)
    where = f" WHERE {' AND '.join(filters)}" if filters else ""
    return f"SELECT {select} FROM documents{where}"
