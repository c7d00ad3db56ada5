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
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, fragment: int) -> str:
        return os.path.join(self.dir, f"frag-{fragment:06d}.json")

    def completed_fragments(self) -> set[int]:
        out = set()
        for name in os.listdir(self.dir):
            if name.startswith("frag-") and name.endswith(".json"):
                out.add(int(name[5:-5]))
        return out

    def commit(self, record: dict) -> None:
        """Atomic idempotent upsert of one fragment record."""
        path = self._path(record["fragment"])
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix=".tmp-")
        with os.fdopen(fd, "w") as f:
            json.dump(record, f, sort_keys=True)
        os.replace(tmp, path)  # atomic on POSIX

    def load(self) -> list[dict]:
        out = []
        for frag in sorted(self.completed_fragments()):
            with open(self._path(frag)) as f:
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
