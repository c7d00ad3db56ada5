"""Column profiling — the Analyzer framework re-expressed for Ray Data.

Reference shape: ``Analyzers.with_(a1..an)`` runs N analyzers in ONE pass
over each record and returns per-column results
(dataquality-common inference/Analyzers.java:48-121, Analyzer.java:28-57).

Ray shape (one pass, no shuffle): every Arrow block is folded into a small
per-block PARTIAL (a dict of mergeable accumulators per column/analyzer) by
``map_batches``; the partials (one pickled row per block) stream to the
driver where they merge into the final result — exactly the partial/final
contract the reference's Serializable mergeable beans were designed for
(ValueQualityStatistics.mergeCounts:92-97, CardinalityHLLStatistics.merge,
histogram bins additive, SummaryStatistics moments).

Accumulator ↔ reference bean map:
  SummaryAcc        → numeric/summary/SummaryStatistics.java:24-76
  TextLengthAcc     → text/TextLengthStatistics.java:24-183 (code points)
  HistogramAcc      → numeric/histogram/HistogramStatistics.java:29-118
  CardinalityAcc    → cardinality/CardinalityHLLAnalyzer.java:33-84 (HLL)
  FrequencyAcc      → frequency/AbstractFrequencyAnalyzer.java:38-85 (top-K capped)
  PatternFreqAcc    → frequency/pattern/CompositePatternFrequencyAnalyzer.java:41-159
  TypeAcc           → type/DataTypeAnalyzer.java:34-120 + DataTypeOccurences
  QualityAcc        → quality/DataTypeQualityAnalyzer.java:32-120 /
                      ValueQualityStatistics.java:31-106
  QuantileAcc       → numeric/quantile/TDigestAnalyzer.java:32-102
"""

from __future__ import annotations

import pickle
from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.text import pattern_fingerprint, unique_apply
from ..functions.typeinfer import dominant_type, infer_type_one
from .sketches import HyperLogLog, TDigest

FREQ_PARTIAL_CAP = 4096  # per-partial frequency table cap (memory bound)


class SummaryAcc:
    __slots__ = ("count", "sum", "sumsq", "min", "max")

    def __init__(self):
        self.count = 0
        self.sum = 0.0
        self.sumsq = 0.0
        self.min = np.inf
        self.max = -np.inf

    def update(self, col: np.ndarray) -> None:
        v = np.asarray(col, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.count += len(v)
        self.sum += float(v.sum())
        self.sumsq += float((v * v).sum())
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))

    def merge(self, o: "SummaryAcc") -> None:
        self.count += o.count
        self.sum += o.sum
        self.sumsq += o.sumsq
        self.min = min(self.min, o.min)
        self.max = max(self.max, o.max)

    def result(self) -> dict:
        mean = self.sum / self.count if self.count else float("nan")
        var = self.sumsq / self.count - mean * mean if self.count else float("nan")
        return {"count": self.count, "sum": self.sum, "min": self.min, "max": self.max,
                "mean": mean, "variance": max(var, 0.0) if self.count else var}


class TextLengthAcc:
    __slots__ = ("count", "sum", "min", "max", "count_blank")

    def __init__(self):
        self.count = 0
        self.sum = 0
        self.min = None
        self.max = None
        self.count_blank = 0

    def update(self, col: np.ndarray) -> None:
        for v in col:
            if v is None:
                continue
            n = len(v)  # Python len == code points (reference codePointCount)
            self.count += 1
            self.sum += n
            if v.strip() == "":
                self.count_blank += 1
            self.min = n if self.min is None else min(self.min, n)
            self.max = n if self.max is None else max(self.max, n)

    def merge(self, o: "TextLengthAcc") -> None:
        self.count += o.count
        self.sum += o.sum
        self.count_blank += o.count_blank
        for attr, fn in (("min", min), ("max", max)):
            a, b = getattr(self, attr), getattr(o, attr)
            setattr(self, attr, b if a is None else a if b is None else fn(a, b))

    def result(self) -> dict:
        return {"count": self.count, "min_length": self.min, "max_length": self.max,
                "sum_length": self.sum,
                "avg_length": self.sum / self.count if self.count else None,
                "blank_count": self.count_blank}


class HistogramAcc:
    __slots__ = ("bins", "counts", "below", "above", "lo", "hi")

    def __init__(self, lo: float, hi: float, n_bins: int):
        self.lo, self.hi, self.bins = lo, hi, n_bins
        self.counts = np.zeros(n_bins, dtype=np.int64)
        self.below = 0
        self.above = 0

    def update(self, col: np.ndarray) -> None:
        v = np.asarray(col, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.below += int((v < self.lo).sum())
        self.above += int((v > self.hi).sum())
        inside = v[(v >= self.lo) & (v <= self.hi)]
        idx = np.minimum(((inside - self.lo) / (self.hi - self.lo) * self.bins).astype(np.int64),
                         self.bins - 1)
        np.add.at(self.counts, idx, 1)

    def merge(self, o: "HistogramAcc") -> None:
        self.counts += o.counts
        self.below += o.below
        self.above += o.above

    def result(self) -> dict:
        edges = np.linspace(self.lo, self.hi, self.bins + 1)
        return {"bin_low": edges[:-1].tolist(), "bin_high": edges[1:].tolist(),
                "counts": self.counts.tolist(), "below": self.below, "above": self.above}


class CardinalityAcc:
    def __init__(self, p: int = 14):
        self.hll = HyperLogLog(p)

    def update(self, col: np.ndarray) -> None:
        vals = np.asarray(col, dtype=object)
        self.hll.update_array(vals[np.array([v is not None for v in vals], dtype=bool)])

    def merge(self, o: "CardinalityAcc") -> None:
        self.hll.merge(o.hll)

    def result(self) -> dict:
        return {"distinct_estimate": self.hll.estimate()}


class FrequencyAcc:
    def __init__(self, top_k: int = 20):
        self.top_k = top_k
        self.counter: Counter = Counter()

    def update(self, col: np.ndarray) -> None:
        self.counter.update(v for v in col if v is not None)
        if len(self.counter) > FREQ_PARTIAL_CAP:
            self.counter = Counter(dict(self.counter.most_common(FREQ_PARTIAL_CAP)))

    def merge(self, o: "FrequencyAcc") -> None:
        self.counter.update(o.counter)

    def result(self) -> dict:
        top = self.counter.most_common()
        top.sort(key=lambda kv: (-kv[1], str(kv[0])))  # deterministic ties
        return {"top_values": top[: self.top_k]}


class PatternFreqAcc(FrequencyAcc):
    def update(self, col: np.ndarray) -> None:
        vals = np.asarray(col, dtype=object)
        mask = np.array([v is not None for v in vals], dtype=bool)
        super().update(pattern_fingerprint(vals[mask]))


class TypeAcc:
    def __init__(self):
        self.counter: Counter = Counter()

    def update(self, col: np.ndarray) -> None:
        types = unique_apply(np.asarray(col, dtype=object), infer_type_one)
        self.counter.update(types)

    def merge(self, o: "TypeAcc") -> None:
        self.counter.update(o.counter)

    def result(self) -> dict:
        return {"type_counts": dict(self.counter), "dominant_type": dominant_type(self.counter)}


class RegexValidFn:
    """Picklable regex predicate for QualityAcc (accumulators are pickled
    into the partials stream — local lambdas would break there)."""

    def __init__(self, pattern: str):
        import re

        self.pattern = pattern
        self._rx = re.compile(pattern)

    def __call__(self, vals: np.ndarray) -> np.ndarray:
        return np.array([bool(self._rx.fullmatch(str(v))) for v in vals], dtype=bool)

    def __getstate__(self):
        return {"pattern": self.pattern}

    def __setstate__(self, state):
        self.__init__(state["pattern"])


class QualityAcc:
    """valid/empty/invalid tallies vs a per-column predicate (declared type
    or regex), with capped invalid samples."""

    def __init__(self, valid_fn, sample_cap: int = 10):
        self.valid_fn = valid_fn
        self.valid = 0
        self.empty = 0
        self.invalid = 0
        self.samples: list[str] = []
        self.sample_cap = sample_cap

    def update(self, col: np.ndarray) -> None:
        vals = np.asarray(col, dtype=object)
        empty = np.array([v is None or str(v).strip() == "" for v in vals], dtype=bool)
        self.empty += int(empty.sum())
        rest = vals[~empty]
        ok = np.asarray(self.valid_fn(rest), dtype=bool)
        self.valid += int(ok.sum())
        bad = rest[~ok]
        self.invalid += len(bad)
        for v in bad[: max(0, self.sample_cap - len(self.samples))]:
            self.samples.append(str(v))

    def merge(self, o: "QualityAcc") -> None:
        self.valid += o.valid
        self.empty += o.empty
        self.invalid += o.invalid
        self.samples.extend(o.samples[: max(0, self.sample_cap - len(self.samples))])

    def result(self) -> dict:
        return {"valid": self.valid, "empty": self.empty, "invalid": self.invalid,
                "invalid_samples": self.samples}


class QuantileAcc:
    def __init__(self, compression: float = 200.0):
        self.td = TDigest(compression)

    def update(self, col: np.ndarray) -> None:
        self.td.update_array(np.asarray(col, dtype=np.float64))

    def merge(self, o: "QuantileAcc") -> None:
        self.td.merge(o.td)

    def result(self) -> dict:
        return {"q25": self.td.quantile(0.25), "median": self.td.quantile(0.5),
                "q75": self.td.quantile(0.75)}


# ---------------------------------------------------------------------------
# the one-pass Ray driver
# ---------------------------------------------------------------------------

ANALYZER_FACTORIES = {
    "summary": SummaryAcc,
    "text_length": TextLengthAcc,
    "cardinality": CardinalityAcc,
    "frequency": FrequencyAcc,
    "pattern_frequency": PatternFreqAcc,
    "type": TypeAcc,
    "quantile": QuantileAcc,
}


def profile_accs(ds, spec: dict[str, list], batch_size: int = 8192,
                 merge: str = "driver", tree_fanin: int = 64) -> dict[str, dict]:
    """``profile`` stopping at the MERGED ACCUMULATORS (column →
    analyzer → acc) instead of finalized result dicts — the mergeable
    state the cross-run profile store persists per run
    (state/profile_store.py): merging two runs' accs is exact for the
    exact analyzers, within the sketch bound for t-digest/HLL, and never
    re-reads historical rows."""
    columns = list(spec)

    def make_accs():
        out = {}
        for col, analyzers in spec.items():
            out[col] = {}
            for a in analyzers:
                if isinstance(a, str):
                    out[col][a] = ANALYZER_FACTORIES[a]()
                else:
                    name, factory = a
                    out[col][name] = factory()
        return out

    def partial(batch: pa.Table) -> pa.Table:
        accs = make_accs()
        for col in columns:
            arr = batch[col].to_numpy(zero_copy_only=False)
            for acc in accs[col].values():
                acc.update(arr)
        return pa.table({"partial": pa.array([pickle.dumps(accs)], type=pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        accs = None
        for blob in batch["partial"]:
            cur = pickle.loads(blob.as_py())
            if accs is None:
                accs = cur
            else:
                for col in accs:
                    for name, acc in accs[col].items():
                        acc.merge(cur[col][name])
        if accs is None:
            return batch
        return pa.table({"partial": pa.array([pickle.dumps(accs)], type=pa.binary())})

    merged = None
    partials = ds.select_columns(columns).map_batches(partial, batch_format="pyarrow",
                                                      batch_size=batch_size)
    if merge == "tree":
        partials = partials.materialize()
        while partials.count() > tree_fanin:
            partials = partials.map_batches(
                combine, batch_size=tree_fanin, batch_format="pyarrow").materialize()
    for b in partials.iter_batches(batch_size=64, batch_format="pyarrow"):
        for blob in b["partial"]:
            accs = pickle.loads(blob.as_py())
            if merged is None:
                merged = accs
            else:
                for col in merged:
                    for name, acc in merged[col].items():
                        acc.merge(accs[col][name])
    if merged is None:
        merged = make_accs()
    return merged


def profile(ds, spec: dict[str, list], batch_size: int = 8192,
            merge: str = "driver", tree_fanin: int = 64) -> dict[str, dict[str, dict]]:
    """One-pass composite profiling (Analyzers.with_ analog).

    ``spec``: column → list of analyzer names (from ANALYZER_FACTORIES) or
    ready accumulator factories (e.g. ``lambda: HistogramAcc(0, 100, 10)``,
    ``lambda: QualityAcc(fn)``). Returns {column: {analyzer: result_dict}}.

    Scale shape: map_batches folds each block into one pickled partial row;
    the partials stream (tiny — one row per block) merges on the driver.
    ``merge="tree"`` inserts distributed combine rounds (``tree_fanin``
    partials per task) until ≤ ``tree_fanin`` rows remain — for jobs whose
    block count makes the driver loop itself the bottleneck (the SCALE.md
    #blocks ≫ 10^6 case). Exact accumulators give identical results under
    any merge grouping (parity-tested); the approximate sketches (t-digest
    quantiles) are merge-order-sensitive within their accuracy bound, as
    any distributed t-digest is.
    """
    merged = profile_accs(ds, spec, batch_size=batch_size, merge=merge,
                          tree_fanin=tree_fanin)
    return {col: {name: acc.result() for name, acc in d.items()} for col, d in merged.items()}
