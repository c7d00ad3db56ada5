"""Checkpoint manifest — per-input-fragment lineage records.

No reference precedent (the reference is an embedded library); designed
fresh per the north rule: every processed input fragment gets one JSON
record (fragment id, source file, row counts, per-rule hit counts,
keep/drop/corrected tallies, output location) written ATOMICALLY
(tmp + rename) into ``<out_dir>/_manifest/``. A restart loads the
manifest and skips completed fragments — exact resume at fragment
granularity. Records are idempotent upserts: a Ray task retry that
re-commits a fragment overwrites with identical content.
"""

from __future__ import annotations

import json
import os
import tempfile


class Manifest:
    """``shard_size`` > 0 groups records into ``shard-<n>/`` subdirs of
    that many fragments each, so one directory never holds 10^8 entries
    (listing a flat manifest is O(#fragments) — the SCALE.md note). Reads
    accept BOTH layouts, so flipping the flag on an existing run (or
    resuming a flat manifest with sharding enabled) just works; a record
    committed under sharding that already exists flat is an upsert of the
    same content either way."""

    def __init__(self, out_dir: str, shard_size: int = 0):
        self.dir = os.path.join(out_dir, "_manifest")
        self.shard_size = shard_size
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, fragment: int) -> str:
        if self.shard_size:
            shard = os.path.join(self.dir, f"shard-{fragment // self.shard_size:06d}")
            os.makedirs(shard, exist_ok=True)
            return os.path.join(shard, f"frag-{fragment:06d}.json")
        return os.path.join(self.dir, f"frag-{fragment:06d}.json")

    def _read_path(self, fragment: int) -> str:
        for cand in (os.path.join(self.dir, f"frag-{fragment:06d}.json"),
                     os.path.join(self.dir, f"shard-{fragment // self.shard_size:06d}",
                                  f"frag-{fragment:06d}.json") if self.shard_size else None):
            if cand and os.path.exists(cand):
                return cand
        # layout-independent fallback (record written under a different
        # shard_size setting)
        import glob as _glob

        hits = _glob.glob(os.path.join(self.dir, "**", f"frag-{fragment:06d}.json"),
                          recursive=True)
        return hits[0]

    def completed_fragments(self) -> set[int]:
        out = set()
        for root, _, files in os.walk(self.dir):
            for name in files:
                if name.startswith("frag-") and name.endswith(".json"):
                    out.add(int(name[5:-5]))
        return out

    def commit(self, record: dict) -> None:
        """Atomic idempotent upsert of one fragment record."""
        path = self._path(record["fragment"])
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp-")
        with os.fdopen(fd, "w") as f:
            json.dump(record, f, sort_keys=True)
        os.replace(tmp, path)  # atomic on POSIX

    def load(self) -> list[dict]:
        out = []
        for frag in sorted(self.completed_fragments()):
            with open(self._read_path(frag)) as f:
                out.append(json.load(f))
        return out

    def totals(self) -> dict:
        """Run-level metrics from the per-fragment records."""
        tot = {"n_rows": 0, "kept": 0, "dropped": 0, "corrected": 0, "rule_hits": {}}
        for r in self.load():
            tot["n_rows"] += r["n_rows"]
            tot["kept"] += r["kept"]
            tot["dropped"] += r["dropped"]
            tot["corrected"] += r["corrected"]
            for k, v in r.get("rule_hits", {}).items():
                tot["rule_hits"][k] = tot["rule_hits"].get(k, 0) + v
        return tot
