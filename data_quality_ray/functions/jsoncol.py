"""Semi-structured (JSON string) column operators.

Parsing JSON per row in Python is a hot-path Python loop; instead each
batch is parsed VECTORIZED through the worker's cached DuckDB
connection (the ``sampling/reservoir._md5_hex`` pattern — one embedded
columnar call per batch, zero Python-object churn). The same engine
evaluates the oracle SQL, so extraction semantics (type coercion, NULL
on missing/malformed) agree by construction while the Ray side stays a
streaming distributed pass.

Two operators:

- ``json_extract_col(ds, col, path, out, cast)`` — typed extraction of
  one path into a real column (NULL when absent/malformed): the ELT
  step that turns a props blob into a queryable column.
- ``json_profile(ds, col)`` — schema discovery over a JSON column: per
  key, presence count and per-JSON-type tally plus numeric min/max —
  the nested-analyzer pattern (profiling/nested.py) for schemaless
  blobs. Per-batch partials are (keys × types) tiny frames; the driver
  merge is ∝ distinct keys, independent of row count.

Reference precedent: schema-walking discovery analyzers
(record/AvroAnalyzer.java, profiling/nested.py port); JSON blobs are
the schemaless equivalent the reference never handled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sampling.reservoir import _duck


def _json_batch_query(series: pd.Series, sql: str) -> pd.DataFrame:
    """Run one DuckDB query over a batch's JSON strings registered as
    view ``j(s)`` — the vectorized per-batch parse."""
    con = _duck()
    frame = pd.DataFrame({"s": series.to_numpy(dtype=object)})
    con.register("__dq_json_in", frame)
    try:
        return con.execute(sql.replace("__J__", "__dq_json_in")).df()
    finally:
        con.unregister("__dq_json_in")


def json_extract_col(ds, col: str, path: str, out: str, cast: str = "BIGINT"):
    """Typed extraction of ``path`` (e.g. ``$.k``) from the JSON-string
    column into a new column ``out`` (NULL on missing/malformed) —
    appended to every row, streaming."""

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        got = _json_batch_query(b[col], f"""
            SELECT CAST(json_extract_string(TRY_CAST(s AS JSON), '{path}')
                        AS {cast}) AS v FROM __J__""")
        b = b.copy()
        b[out] = got["v"].to_numpy()
        return b

    return ds.map_batches(extract, batch_format="pandas")


def json_profile(ds, col: str) -> pd.DataFrame:
    """Schema discovery → one row per key: (key, n_present, plus one
    count per JSON type seen, min_num/max_num over numeric values)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # json_keys + per-key json_type (this DuckDB has no json_each);
        # the oracle SQL uses the IDENTICAL form so type names agree
        return _json_batch_query(b[col], """
            WITH ks AS (
              SELECT s, unnest(json_keys(TRY_CAST(s AS JSON))) AS key
              FROM __J__),
            kv AS (
              SELECT key,
                     json_type(TRY_CAST(s AS JSON), '$."' || key || '"') AS type,
                     TRY_CAST(json_extract_string(TRY_CAST(s AS JSON),
                                                  '$."' || key || '"')
                              AS DOUBLE) AS num
              FROM ks)
            SELECT key, type, count(*) AS n,
                   min(num) AS min_num, max(num) AS max_num
            FROM kv GROUP BY 1, 2""")

    parts = []
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"):
        parts.append(b)
    if not parts:
        return pd.DataFrame({"key": [], "n_present": []})
    allp = pd.concat(parts, ignore_index=True)
    agg = (allp.groupby(["key", "type"], sort=True)
           .agg(n=("n", "sum"), min_num=("min_num", "min"),
                max_num=("max_num", "max")).reset_index())
    types = agg.pivot_table(index="key", columns="type", values="n",
                            aggfunc="sum", fill_value=0)
    types.columns = [f"n_{str(c).lower()}" for c in types.columns]
    nums = (agg.groupby("key")
            .agg(n_present=("n", "sum"), min_num=("min_num", "min"),
                 max_num=("max_num", "max")))
    out = nums.join(types).reset_index()
    return out.sort_values("key", kind="mergesort").reset_index(drop=True)
