"""Deterministic Poisson bootstrap — distribution-level uncertainty for
streaming aggregates.

The online/Poisson bootstrap (Oza & Russell 2001; Kleiner et al.'s
streaming variant): each row enters replicate ``b`` with weight
w ~ Poisson(1), approximating resampling-with-replacement without ever
materializing a resample. Here the weights are DETERMINISTIC — w is the
inverse-CDF bucket of an md5-derived 53-bit integer for (row key, b) —
so two engines reproduce the exact same bootstrap and the whole
distribution of replicate means is SQL-oracle-able. All comparisons are
INTEGER (m >= threshold), all per-replicate sums are int64 (weight ×
cents), so nothing depends on float summation order; the only float op
is one final division per replicate, identical on both engines.

Scale shape: ONE streaming pass; each batch folds to B fixed-size
partial rows (replicate, Σw, Σw·cents); the driver merges O(blocks × B)
rows. No shuffle, no reshipping — the md5 work is vectorized through
DuckDB per worker (the sampling/reservoir pattern).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

B_REPLICATES = 20
KEY_SEP = "|"
_M53 = 1 << 53

# integer inverse-CDF thresholds for Poisson(1): w = #{k : m >= T_k}
# with T_k = floor(P(X <= k) * 2^53); tail clamped at w = 9
_CUM = np.cumsum([math.exp(-1.0) / math.factorial(i) for i in range(9)])
POISSON_THRESHOLDS = [int(c * _M53) for c in _CUM]


def _md5_low53(strings: np.ndarray) -> np.ndarray:
    """Vectorized md5 low-half % 2^53 via DuckDB (one call per batch —
    the reservoir pattern; md5 semantics == md5_number_lower)."""
    from ..sampling.reservoir import _duck

    con = _duck()
    frame = pd.DataFrame({"s": strings})
    con.register("__dq_boot_in", frame)
    try:
        out = con.execute(
            "SELECT CAST(md5_number_lower(s) % 9007199254740992 AS BIGINT) "
            "AS m FROM __dq_boot_in").fetchnumpy()["m"]
    finally:
        con.unregister("__dq_boot_in")
    return out


def poisson_weights(m53: np.ndarray) -> np.ndarray:
    """w = number of thresholds at or below m (vectorized ladder)."""
    w = np.zeros(len(m53), dtype=np.int64)
    for t in POISSON_THRESHOLDS:
        w += (m53 >= t).astype(np.int64)
    return w


def bootstrap_means(ds, key_cols: list[str], value_col: str,
                    b_replicates: int = B_REPLICATES):
    """→ DataFrame (b, n_eff, mean_value): per-replicate weighted mean of
    ``value_col`` (interpreted in integer CENTS — exact for 2-dp money
    columns) under the deterministic Poisson bootstrap. The spread of
    ``mean_value`` across replicates IS the sampling distribution a CI
    reads off."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key + KEY_SEP + batch[c].astype(str)
        cents = np.round(batch[value_col].to_numpy(dtype=np.float64)
                         * 100).astype(np.int64)
        rows = []
        base = key.to_numpy(dtype=object)
        for b in range(b_replicates):
            m = _md5_low53(base + (KEY_SEP + str(b)))
            w = poisson_weights(m)
            rows.append((b, int(w.sum()), int((w * cents).sum())))
        return pd.DataFrame(rows, columns=["b", "sw", "swc"])

    parts = pd.concat(
        list(ds.select_columns(key_cols + [value_col])
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_size=1024, batch_format="pandas")),
        ignore_index=True)
    agg = parts.groupby("b", sort=True)[["sw", "swc"]].sum().reset_index()
    mean = np.round(agg["swc"].to_numpy(dtype=np.float64)
                    / agg["sw"].to_numpy(dtype=np.float64) / 100.0, 6)
    return pd.DataFrame({"b": agg["b"].astype("int64"),
                         "n_eff": agg["sw"].astype("int64"),
                         "mean_value": mean})
