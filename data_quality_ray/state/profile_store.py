"""Cross-run profile store — day-over-day data-quality monitoring that
never re-reads history.

Each run commits its MERGEABLE analyzer accumulators (the
``profiling/analyzers.profile_accs`` output: column → analyzer → acc,
one pickled blob per run) as an append-only generation, the same
crash-safe layout as the cross-run dedup indexes
(``state/dedup_index.py``):

    <dir>/gen-<n>/profile.bin    pickled accumulator tree
    <dir>/gen-<n>/meta.json      spec signature + run label + committed-at
    <dir>/gen-<n>/_GEN           atomic commit marker (tmp+rename last)

- The cumulative profile of ALL runs = merge of all committed
  generations — exact for the exact analyzers (summary / text-length /
  frequency-topK / type / quality), within the sketch bound for
  HLL / t-digest. History's rows are never touched again.
- Uncommitted / torn generations are invisible (marker written last);
  a killed run retries by re-profiling only ITS OWN input.
- The spec signature (column → analyzer names) is validated on commit
  and on merge: mixing incompatible specs raises instead of silently
  merging different analyzer trees.

This is the reference's "re-run the analyzers per ingest" monitoring
loop (SURVEY.md §2.2) restructured for scale: per-ingest cost is one
streaming pass over the NEW data only; the full-history profile is a
driver-side merge of per-run blobs (bytes ∝ #runs × #columns, not rows).
"""

from __future__ import annotations

import json
import os
import pickle
import re
import time

_GEN_RE = re.compile(r"^gen-(\d+)$")


def _committed_gens(store_dir: str) -> list[str]:
    if not os.path.isdir(store_dir):
        return []
    out = []
    for name in sorted(os.listdir(store_dir)):
        m = _GEN_RE.match(name)
        if m and os.path.exists(os.path.join(store_dir, name, "_GEN")):
            out.append(os.path.join(store_dir, name))
    return out


def _next_gen(store_dir: str) -> int:
    mx = -1
    if os.path.isdir(store_dir):
        for name in os.listdir(store_dir):
            m = _GEN_RE.match(name)
            if m:
                mx = max(mx, int(m.group(1)))
    return mx + 1


def _signature(spec: dict) -> dict:
    """Canonical spec signature: column → sorted analyzer identities. A
    string entry is its own identity; a (name, factory) tuple is
    ``name@<md5 of the factory's FRESH accumulator pickle>`` — so two
    same-named analyzers with different parameters (e.g. HistogramAcc
    ranges) get different signatures and can never merge silently."""
    import hashlib

    def ident(a):
        if isinstance(a, str):
            return a
        name, factory = a
        fp = hashlib.md5(pickle.dumps(factory())).hexdigest()[:12]
        return f"{name}@{fp}"

    return {col: sorted(ident(a) for a in analyzers)
            for col, analyzers in spec.items()}


class ProfileStore:
    def __init__(self, store_dir: str):
        self.store_dir = store_dir

    # -- write ------------------------------------------------------------

    def commit(self, ds, spec: dict, run_label: str | None = None,
               merge: str = "driver") -> str:
        """Profile ``ds`` (one streaming pass) and commit the mergeable
        accumulators as the next generation. Returns the generation dir."""
        from ..profiling.analyzers import profile_accs

        sig = _signature(spec)
        for gen in _committed_gens(self.store_dir):
            with open(os.path.join(gen, "meta.json")) as f:
                if json.load(f)["signature"] != sig:
                    raise ValueError(
                        f"profile spec mismatch vs committed {gen} — open a "
                        f"new store for a different analyzer tree")
        accs = profile_accs(ds, spec, merge=merge)
        gen_dir = os.path.join(self.store_dir, f"gen-{_next_gen(self.store_dir)}")
        os.makedirs(gen_dir, exist_ok=True)
        with open(os.path.join(gen_dir, "profile.bin"), "wb") as f:
            f.write(pickle.dumps(accs))
        with open(os.path.join(gen_dir, "meta.json"), "w") as f:
            json.dump({"signature": sig, "run_label": run_label,
                       "committed_at": time.time()}, f)
        tmp = os.path.join(gen_dir, "._GEN.tmp")
        open(tmp, "w").close()
        os.replace(tmp, os.path.join(gen_dir, "_GEN"))  # commit point
        return gen_dir

    # -- read -------------------------------------------------------------

    def n_runs(self) -> int:
        return len(_committed_gens(self.store_dir))

    def run_results(self) -> list[dict]:
        """Per-run finalized profiles, commit order — the drift series."""
        out = []
        for gen in _committed_gens(self.store_dir):
            with open(os.path.join(gen, "meta.json")) as f:
                meta = json.load(f)
            with open(os.path.join(gen, "profile.bin"), "rb") as f:
                accs = pickle.loads(f.read())
            out.append({"run_label": meta["run_label"],
                        "profile": {c: {n: a.result() for n, a in d.items()}
                                    for c, d in accs.items()}})
        return out

    def drift(self, column: str, analyzer: str, eps: float = 1e-6):
        """Population-stability drift between CONSECUTIVE committed runs,
        computed straight off the stored histogram accumulators — no data
        is re-read. Below/above-range counts fold into the edge bins (the
        clamp convention of ``drift_psi``); PSI per pair =
        Σ (p−q)·ln(p/q) with an ``eps`` probability floor on both sides.
        → pandas DataFrame (run_prev, run_cur, psi), one row per
        consecutive pair, commit order."""
        import numpy as np
        import pandas as pd

        runs = []
        for gen in _committed_gens(self.store_dir):
            with open(os.path.join(gen, "meta.json")) as f:
                label = json.load(f)["run_label"]
            with open(os.path.join(gen, "profile.bin"), "rb") as f:
                acc = pickle.loads(f.read())[column][analyzer]
            counts = np.asarray(acc.counts, dtype=np.float64)
            counts[0] += acc.below
            counts[-1] += acc.above
            runs.append((label, counts))
        rows = []
        for (la, ca), (lb, cb) in zip(runs, runs[1:]):
            p = np.maximum(ca / max(ca.sum(), 1), eps)
            q = np.maximum(cb / max(cb.sum(), 1), eps)
            rows.append({"run_prev": la, "run_cur": lb,
                         "psi": round(float(((p - q) * np.log(p / q)).sum()), 6)})
        return pd.DataFrame(rows, columns=["run_prev", "run_cur", "psi"])

    def merged(self) -> dict:
        """Cumulative profile over every committed run:
        {column: {analyzer: result_dict}}. Raises on an empty store."""
        merged = None
        sig = None
        for gen in _committed_gens(self.store_dir):
            with open(os.path.join(gen, "meta.json")) as f:
                cur_sig = json.load(f)["signature"]
            if sig is None:
                sig = cur_sig
            elif cur_sig != sig:
                raise ValueError(f"incompatible spec in {gen}")
            with open(os.path.join(gen, "profile.bin"), "rb") as f:
                accs = pickle.loads(f.read())
            if merged is None:
                merged = accs
            else:
                for col in merged:
                    for name, acc in merged[col].items():
                        acc.merge(accs[col][name])
        if merged is None:
            raise ValueError(f"no committed runs in {self.store_dir}")
        return {c: {n: a.result() for n, a in d.items()}
                for c, d in merged.items()}
