"""T-Swoosh match-merge — per-group online clustering with golden records.

Rebuilds the reference's MFB algorithm (dataquality-record-linkage
matchmerge/mfb/MFB.java:119-227): poll records in order, compare each
against the current set of MERGED (golden) records; on match, merge into
the golden record and RE-ENQUEUE it so it can absorb further records;
group-id bookkeeping per MFB.java:199-217. Mergers use the survivorship
functions (MFBRecordMerger.java:30-50 → dedup/survivorship.py).

The algorithm is order-sensitive (MFB.java:126-147: queue order decides
masters), so each group is processed in a DETERMINISTIC sort order —
reruns reproduce clusters bit-for-bit (SURVEY.md §7 hard-part 3).

Ray shape: ``groupby(block_key).map_groups(swoosh)`` — sequential within
a group, parallel across groups; oversized groups are truncated at
``max_block`` (StringsClusterAnalyzer.blockSizeThreshold:57,85 analog).

Multipass (TSwooshGrouping.java:47-362 + MultiPassGroupingCallBack
oldGID2New remap): run a second blocking pass over pass-1 golden records
and remap pass-1 group ids through the pass-2 clustering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.matchers import match_score
from .survivorship import RULE_FUNCTIONS


def _merge_records(a: dict, b: dict, attr_rules: dict[str, str]) -> dict:
    out = dict(a)
    for col, rule in attr_rules.items():
        out[col] = RULE_FUNCTIONS[rule](pd.Series([a.get(col), b.get(col)]))
    return out


def swoosh_group(g: pd.DataFrame, id_col: str, attr_cols: list[str],
                 attr_rules: dict[str, str] | None = None,
                 matcher="JARO_WINKLER", threshold: float = 0.9,
                 max_block: int = 10_000) -> pd.DataFrame:
    """MFB over one group → one row per GOLDEN record plus membership:
    columns = merged attrs + gid + members (list of source ids) + n."""
    rules = attr_rules or {c: "Longest" for c in attr_cols}
    g = g.sort_values(id_col, kind="mergesort").head(max_block)
    queue: list[dict] = g.to_dict("records")
    for r in queue:
        r["__members"] = [r[id_col]]
    merged: list[dict] = []
    while queue:
        rec = queue.pop(0)  # FIFO poll (MFB.java:126)
        hit = None
        for m in merged:
            s = np.mean([match_score(rec.get(c), m.get(c), matcher) for c in attr_cols])
            if s >= threshold:
                hit = m
                break
        if hit is None:
            merged.append(rec)
        else:
            merged.remove(hit)
            new = _merge_records(hit, rec, rules)
            new["__members"] = sorted(set(hit["__members"]) | set(rec["__members"]))
            queue.append(new)  # re-enqueue the golden record (MFB.java:167-197)
    rows = []
    for m in merged:
        row = {c: m.get(c) for c in attr_cols}
        row["gid"] = min(m["__members"])
        row["members"] = m["__members"]
        row["n"] = len(m["__members"])
        rows.append(row)
    return pd.DataFrame(rows)


def swoosh_match_merge(ds, id_col: str, attr_cols: list[str], block_col: str,
                       attr_rules: dict[str, str] | None = None,
                       matcher="JARO_WINKLER", threshold: float = 0.9,
                       max_block: int = 10_000):
    """Distributed T-Swoosh: sequential within blocks, parallel across."""
    return ds.groupby(block_col).map_groups(
        lambda g: swoosh_group(g, id_col, attr_cols, attr_rules, matcher,
                               threshold, max_block),
        batch_format="pandas",
    )


def multipass_remap(pass1: pd.DataFrame, pass2: pd.DataFrame) -> pd.DataFrame:
    """Reconcile two grouping passes (oldGID2New analog,
    grouping/callback/MultiPassGroupingCallBack.java:30-126): pass-2 rows
    cluster pass-1 golden records; every pass-1 gid inside a pass-2
    cluster collapses to the pass-2 cluster's gid."""
    ex = pass2[["gid", "members"]].explode("members")
    remap = dict(zip(ex["members"], ex["gid"]))
    out = pass1.copy()
    out["gid"] = (out["gid"].map(remap).fillna(out["gid"])
                  .astype(out["gid"].dtype))
    return out
