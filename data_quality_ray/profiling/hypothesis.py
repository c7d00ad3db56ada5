"""Distribution tests and classifier-evaluation statistics.

The filter-quality evaluation suite: given a quality classifier's scores
and the rule chain's keep/drop decisions (or any two corpus segments),
quantify agreement and distribution shift with EXACT, tie-aware
statistics — Welch's t, Kolmogorov–Smirnov, ROC AUC (rank-sum), Cohen's
kappa, and per-group percent-rank normalization. The reference's
statistics layer stops at per-column summaries
(statistics/numeric/SummaryAnalyzer.java:24-88); these extend the same
mergeable-fold contract to two-sample and prediction-vs-truth questions
a quality-filter pipeline asks at corpus scale.

Scale shape shared by every function here: ONE grouped value-count
exchange (state = distinct values/cells, not rows — the documented
small-side exact contract of profiling/datarules.spearman), then pure
integer algebra on the driver. Tie-sensitive selections (KS location,
rank sums) stay in INTEGER arithmetic until the final division so the
DuckDB replay computes the identical rational before rounding — no
float-argmax coin flips. For distinct-value spaces beyond the driver,
rank via functions/partitioning.global_row_number + a per-value grouped
fold instead (same escape hatch spearman documents).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupagg import grouped_aggregate

__all__ = ["welch_ttest", "ks_statistic", "roc_auc", "cohens_kappa",
           "grouped_percent_rank", "grouped_roc_auc", "wasserstein1",
           "cusum_changepoint"]


def welch_ttest(ds, group_col: str, val_col: str,
                group_a, group_b) -> dict:
    """Welch's unequal-variance t-test between two groups from one
    (n, Σx, Σx²) fold per group. t = (m_a−m_b)/√(v_a/n_a + v_b/n_b)
    with sample variances; df by Welch–Satterthwaite. The SQL replay
    uses the same Σx/Σx² algebra (not var_samp) so both sides round
    the identical expression."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sub = b[b[group_col].isin([group_a, group_b])]
        x = pd.to_numeric(sub[val_col], errors="coerce")
        ok = x.notna()
        sub, x = sub[ok], x[ok].astype(np.float64)
        g = sub[group_col].to_numpy()
        out = []
        for name in (group_a, group_b):
            xv = x.to_numpy()[g == name]
            out.append({"grp": name, "n": len(xv), "s": float(xv.sum()),
                        "s2": float((xv * xv).sum())})
        return pd.DataFrame(out)

    agg = grouped_aggregate(
        ds.select_columns([group_col, val_col]).map_batches(
            partial, batch_format="pandas"),
        ["grp"], {"n": ("n", "sum"), "s": ("s", "sum"), "s2": ("s2", "sum")})
    row = {r["grp"]: r for _, r in agg.iterrows()}
    na, nb = int(row[group_a]["n"]), int(row[group_b]["n"])
    ma, mb = row[group_a]["s"] / na, row[group_b]["s"] / nb
    va = (row[group_a]["s2"] - na * ma * ma) / (na - 1)
    vb = (row[group_b]["s2"] - nb * mb * mb) / (nb - 1)
    se2a, se2b = va / na, vb / nb
    t = (ma - mb) / np.sqrt(se2a + se2b)
    df = (se2a + se2b) ** 2 / (se2a ** 2 / (na - 1) + se2b ** 2 / (nb - 1))
    return {"n_a": na, "n_b": nb, "mean_a": float(ma), "mean_b": float(mb),
            "var_a": float(va), "var_b": float(vb),
            "t_stat": float(t), "welch_df": float(df)}


def ks_statistic(ds, group_col: str, val_col: str,
                 group_a, group_b) -> dict:
    """Two-sample Kolmogorov–Smirnov D between the ``val_col``
    distributions of two groups. One (value → n_a, n_b) exchange; the
    driver sorts distinct values and takes the max ECDF gap IN INTEGERS
    (|cum_a·N_b − cum_b·N_a|), so the arg-max location (smallest value
    attaining the max) is exact and replayable in SQL — a float-CDF
    argmax flips on 1e-16 noise between engines."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sub = b[b[group_col].isin([group_a, group_b])]
        x = pd.to_numeric(sub[val_col], errors="coerce")
        ok = x.notna()
        sub = sub[ok].assign(__v=x[ok].astype(np.float64))
        c = (sub.groupby(["__v", group_col], sort=False).size()
             .rename("n").reset_index())
        return pd.DataFrame({
            "value": c["__v"],
            "n_a": np.where(c[group_col].to_numpy() == group_a, c["n"], 0),
            "n_b": np.where(c[group_col].to_numpy() == group_b, c["n"], 0),
        })

    counts = grouped_aggregate(
        ds.select_columns([group_col, val_col]).map_batches(
            partial, batch_format="pandas"),
        ["value"], {"n_a": ("n_a", "sum"), "n_b": ("n_b", "sum")})
    counts = counts.sort_values("value").reset_index(drop=True)
    ca = counts["n_a"].to_numpy(np.int64).cumsum()
    cb = counts["n_b"].to_numpy(np.int64).cumsum()
    tot_a, tot_b = int(ca[-1]), int(cb[-1])
    gap = np.abs(ca * tot_b - cb * tot_a)  # integer; D = gap/(Na·Nb)
    i = int(gap.argmax())  # first (= smallest value) on ties
    return {"n_a": tot_a, "n_b": tot_b,
            "ks_stat": float(gap[i] / (tot_a * tot_b)),
            "ks_at": float(counts["value"].iloc[i])}


def wasserstein1(ds, group_col: str, val_col: str, group_a, group_b,
                 decimals: int = 2) -> dict:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between two
    groups' ``val_col`` distributions — the area between the ECDFs:
    W₁ = Σ_consecutive |F_a − F_b| · Δv. Complements ``ks_statistic``
    (max gap) with the INTEGRATED shift a curation run cares about
    (how far did the whole distribution move, not just its worst
    point). Same scale shape: ONE (value → n_a, n_b) exchange, then
    driver algebra over distinct values.

    Values are fixed-point at ``decimals`` (TPC-H money is 2-dp), so
    the whole sum stays INTEGER — Σ |cum_a·N_b − cum_b·N_a| · Δv_fp is
    exact and summation-order-free, and the single final division by
    (10^decimals · N_a · N_b) produces the identical rational in the
    DuckDB window replay (float partial sums would diverge between
    engines on re-association)."""
    fp = 10 ** decimals

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sub = b[b[group_col].isin([group_a, group_b])]
        x = pd.to_numeric(sub[val_col], errors="coerce")
        ok = x.notna()
        sub = sub[ok].assign(
            __v=np.rint(x[ok].astype(np.float64) * fp).astype(np.int64))
        c = (sub.groupby(["__v", group_col], sort=False).size()
             .rename("n").reset_index())
        return pd.DataFrame({
            "value": c["__v"],
            "n_a": np.where(c[group_col].to_numpy() == group_a, c["n"], 0),
            "n_b": np.where(c[group_col].to_numpy() == group_b, c["n"], 0),
        })

    counts = grouped_aggregate(
        ds.select_columns([group_col, val_col]).map_batches(
            partial, batch_format="pandas"),
        ["value"], {"n_a": ("n_a", "sum"), "n_b": ("n_b", "sum")})
    counts = counts.sort_values("value").reset_index(drop=True)
    v = counts["value"].to_numpy(np.int64)
    ca = counts["n_a"].to_numpy(np.int64).cumsum()
    cb = counts["n_b"].to_numpy(np.int64).cumsum()
    tot_a, tot_b = int(ca[-1]), int(cb[-1])
    # arbitrary-precision: gap·Δv products overflow int64 past ~1e18
    gap = np.abs(ca[:-1] * tot_b - cb[:-1] * tot_a).astype(object)
    dv = np.diff(v).astype(object)
    total = int(np.add.reduce(gap * dv)) if len(gap) else 0
    # float(total) FIRST, then double division — the exact evaluation
    # order of the SQL replay's HUGEINT→DOUBLE cast (an int/int exact
    # quotient can differ in the last ulp once total exceeds 2^53)
    return {"n_a": tot_a, "n_b": tot_b,
            "emd": float(total) / (float(fp) * tot_a * tot_b)}


def cusum_changepoint(ds, ts_col: str, unit: str = "day") -> dict:
    """Level-shift change-point over the event-arrival time series:
    bucket timestamps to ``unit``, then the classic centered CUSUM
    S_i = Σ_{j≤i}(x_j − x̄) over the ordered buckets; the bucket with
    max |S_i| is the most likely single change point (Page's CUSUM /
    binary-segmentation first split). The arg-max is selected on the
    INTEGER |n_buckets·cum_i − i·total| (ties → earliest bucket), so
    the SQL window replay picks the identical bucket. One
    (bucket → count) exchange; driver work ∝ number of buckets."""
    from ..functions.cohort import week_start_days

    def trunc(t: np.ndarray) -> np.ndarray:
        if unit == "hour":
            return t.astype("datetime64[h]")
        if unit == "day":
            return t.astype("datetime64[D]")
        return week_start_days(t).astype("datetime64[D]")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[b[ts_col].notna()][ts_col].to_numpy()
        g = (pd.DataFrame({"bucket": trunc(t)})
             .groupby("bucket", sort=False).size().rename("n"))
        return g.reset_index()

    counts = grouped_aggregate(
        ds.select_columns([ts_col]).map_batches(
            partial, batch_format="pandas"),
        ["bucket"], {"n": ("n", "sum")})
    counts = counts.sort_values("bucket").reset_index(drop=True)
    n = counts["n"].to_numpy(np.int64)
    nd = len(n)
    tot = int(n.sum())
    cum = n.cumsum()
    i = np.arange(1, nd + 1, dtype=np.int64)
    stat = np.abs(nd * cum - i * tot)  # = |S_i| · n_buckets, integer
    j = int(stat.argmax())  # first (= earliest bucket) on ties
    return {"n_buckets": nd, "n_events": tot,
            "change_at": counts["bucket"].iloc[j],
            "cusum_stat": float(int(stat[j]) / nd)}


def roc_auc(ds, score_col: str, label_col: str) -> dict:
    """Exact tie-aware ROC AUC of a score against a boolean label via
    the Mann–Whitney rank-sum: AUC = (R_pos − n_pos(n_pos+1)/2) /
    (n_pos·n_neg) with AVERAGE ranks for tied scores. One
    (score → n, n_pos) exchange; twice-the-rank-sum stays integer
    (2·R_pos = Σ_v n_pos_v·(2·rows_before_v + n_v + 1)) so the SQL
    window replay computes the identical rational. Scores must carry
    the repo's 6-dp rounding on both sides for consistent ties."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.to_numeric(b[score_col], errors="coerce")
        lab = b[label_col].astype(bool)
        ok = s.notna()
        g = (pd.DataFrame({"score": s[ok].astype(np.float64),
                           "pos": lab[ok].astype(np.int64)})
             .groupby("score", sort=False)
             .agg(n=("pos", "size"), n_pos=("pos", "sum")).reset_index())
        return g

    counts = grouped_aggregate(
        ds.select_columns([score_col, label_col]).map_batches(
            partial, batch_format="pandas"),
        ["score"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum")})
    counts = counts.sort_values("score").reset_index(drop=True)
    n_v = counts["n"].to_numpy(np.int64)
    p_v = counts["n_pos"].to_numpy(np.int64)
    before = np.concatenate([[0], n_v.cumsum()[:-1]])
    n_pos = int(p_v.sum())
    n_neg = int(n_v.sum() - n_pos)
    r2 = int((p_v * (2 * before + n_v + 1)).sum())  # 2 × rank-sum of positives
    auc = (r2 - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)
    return {"n": int(n_v.sum()), "n_pos": n_pos, "n_neg": n_neg,
            "auc": float(auc)}


def cohens_kappa(ds, pred_col: str, truth_col: str) -> dict:
    """Cohen's kappa between two boolean verdict columns from the same
    single joint-count fold as datarules.chi_square: observed agreement
    p_o vs chance agreement p_e from the marginals,
    κ = (p_o − p_e)/(1 − p_e)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = b[pred_col].astype(bool)
        t = b[truth_col].astype(bool)
        return pd.DataFrame({
            "tp": [int((p & t).sum())], "fp": [int((p & ~t).sum())],
            "fn": [int((~p & t).sum())], "tn": [int((~p & ~t).sum())],
        })

    agg = grouped_aggregate(
        ds.select_columns([pred_col, truth_col]).map_batches(
            lambda b: partial(b).assign(__k=0), batch_format="pandas"),
        ["__k"], {c: (c, "sum") for c in ("tp", "fp", "fn", "tn")})
    tp, fp, fn, tn = (int(agg[c].iloc[0]) for c in ("tp", "fp", "fn", "tn"))
    n = tp + fp + fn + tn
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    kappa = (po - pe) / (1 - pe) if pe < 1 else 0.0
    return {"n": n, "tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "p_o": float(po), "p_e": float(pe), "kappa": float(kappa)}


def grouped_percent_rank(ds, group_col: str, val_col: str,
                         out_col: str = "pct_rank"):
    """Per-group percent_rank of ``val_col`` (SQL window semantics:
    (min_rank − 1)/(n_group − 1), ties share the min rank) appended to
    every row WITHOUT a per-row window shuffle: one (group, value) →
    count exchange builds per-group sorted value → rows_before arrays,
    broadcast once via ray.put, and a stateless searchsorted fill maps
    each row — work ∝ distinct (group, value) pairs plus one streaming
    pass. Returns a Dataset (null values get null rank)."""
    import ray

    from ..functions.broadcast import cached_get

    def cpartial(b: pd.DataFrame) -> pd.DataFrame:
        x = pd.to_numeric(b[val_col], errors="coerce")
        sub = pd.DataFrame({"grp": b[group_col], "value": x})
        sub = sub[x.notna()]
        return (sub.groupby(["grp", "value"], sort=False).size()
                .rename("n").reset_index())

    counts = grouped_aggregate(
        ds.select_columns([group_col, val_col]).map_batches(
            cpartial, batch_format="pandas"),
        ["grp", "value"], {"n": ("n", "sum")})

    lut = {}
    for grp, sub in counts.groupby("grp", sort=False):
        sub = sub.sort_values("value")
        nn = sub["n"].to_numpy(np.int64)
        before = np.concatenate([[0], nn.cumsum()[:-1]])
        denom = max(int(nn.sum()) - 1, 1)
        lut[grp] = (sub["value"].to_numpy(np.float64), before / denom)
    ref = ray.put(lut)

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        table = cached_get(ref)
        x = pd.to_numeric(b[val_col], errors="coerce").to_numpy(np.float64)
        out = np.full(len(b), np.nan)
        g = b[group_col].to_numpy()
        for grp in pd.unique(b[group_col].dropna()):
            vals, pct = table[grp]
            m = (g == grp) & ~np.isnan(x)
            out[m] = pct[np.searchsorted(vals, x[m])]
        b = b.copy()
        b[out_col] = out
        return b

    return ds.map_batches(fill, batch_format="pandas")


def grouped_roc_auc(ds, group_col: str, score_col: str,
                    label_col: str) -> pd.DataFrame:
    """Per-group exact tie-aware ROC AUC (``roc_auc`` partitioned by a
    group axis — per-source model health from ONE
    (group, score) → (n, n_pos) exchange; the per-group rank algebra is
    the same integer 2·R rank-sum, vectorized across groups on the
    driver). Groups with no positives or no negatives report null AUC
    (SQL NULL-division parity). → (group, n, n_pos, n_neg, auc)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = pd.to_numeric(b[score_col], errors="coerce")
        ok = s.notna()
        g = (pd.DataFrame({"grp": b.loc[ok, group_col],
                           "score": s[ok].astype(np.float64),
                           "pos": b.loc[ok, label_col].astype(bool)
                           .astype(np.int64)})
             .groupby(["grp", "score"], sort=False)
             .agg(n=("pos", "size"), n_pos=("pos", "sum")).reset_index())
        return g

    counts = grouped_aggregate(
        ds.select_columns([group_col, score_col, label_col]).map_batches(
            partial, batch_format="pandas"),
        ["grp", "score"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum")})
    counts = counts.sort_values(["grp", "score"]).reset_index(drop=True)
    rows = []
    for grp, sub in counts.groupby("grp", sort=False):
        n_v = sub["n"].to_numpy(np.int64)
        p_v = sub["n_pos"].to_numpy(np.int64)
        before = np.concatenate([[0], n_v.cumsum()[:-1]])
        n_pos = int(p_v.sum())
        n_neg = int(n_v.sum() - n_pos)
        r2 = int((p_v * (2 * before + n_v + 1)).sum())
        auc = ((r2 - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)
               if n_pos and n_neg else None)
        rows.append((grp, int(n_v.sum()), n_pos, n_neg, auc))
    return pd.DataFrame(rows, columns=["group", "n", "n_pos", "n_neg",
                                       "auc"])
