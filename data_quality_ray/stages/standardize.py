"""Standardization — broadcast-dictionary synonym lookup.

Rebuilds dataquality-standardization's Lucene synonym index
(index/SynonymIndexSearcher.java:51-508, query/FirstNameStandardize.java:46-144)
as the idiomatic Ray Data broadcast join: the dictionary is ``ray.put``
ONCE on the driver; each actor reads it ONCE in ``__init__`` (zero-copy
from the object store, never re-shipped per batch); lookups are exact
first, then optional fuzzy fallback (Jaro-Winkler over the key set —
the MatchMode/fuzzy-query analog) memoized per distinct value.
"""

from __future__ import annotations

import pandas as pd

from ..functions.matchers import jaro_winkler
from ..functions.text import unique_apply


def build_dictionary(pairs: dict[str, str]) -> dict[str, str]:
    """word/synonym → standardized form; keys lowercased."""
    return {k.lower(): v for k, v in pairs.items()}


class StandardizeStage:
    """map_batches actor: adds ``<col>_std`` via broadcast dict lookup."""

    def __init__(self, dict_ref, column: str, fuzzy: bool = False, fuzzy_threshold: float = 0.92):
        import ray

        self.dictionary = ray.get(dict_ref) if not isinstance(dict_ref, dict) else dict_ref
        self.keys = sorted(self.dictionary)
        self.column = column
        self.fuzzy = fuzzy
        self.fuzzy_threshold = fuzzy_threshold

    def _lookup_one(self, v) -> str | None:
        if v is None:
            return None
        key = str(v).lower()
        hit = self.dictionary.get(key)
        if hit is not None or not self.fuzzy:
            return hit if hit is not None else v
        best, best_s = None, self.fuzzy_threshold
        for k in self.keys:  # fuzzy fallback over the (small) key set
            s = jaro_winkler(key, k)
            if s > best_s:
                best, best_s = k, s
        return self.dictionary[best] if best is not None else v

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[self.column + "_std"] = unique_apply(
            batch[self.column].to_numpy(dtype=object), self._lookup_one
        )
        return batch


def standardize(ds, dictionary: dict[str, str], column: str, fuzzy: bool = False,
                concurrency: int | tuple = 2):
    import ray

    ref = ray.put(build_dictionary(dictionary))
    return ds.map_batches(
        StandardizeStage,
        fn_constructor_kwargs={"dict_ref": ref, "column": column, "fuzzy": fuzzy},
        batch_format="pandas",
        concurrency=concurrency,
    )


def standardize_record(ds, column_dicts: dict[str, dict[str, str]], fuzzy: bool = False,
                       concurrency: int | tuple = 2):
    """Record-level standardization across N columns
    (record/SynonymRecordSearcher.java analog): compose one broadcast
    lookup stage per column in a single pipeline."""
    for column, dictionary in column_dicts.items():
        ds = standardize(ds, dictionary, column, fuzzy=fuzzy, concurrency=concurrency)
    return ds


def fuzzy_lookup(ds, column: str, canon: list[str], out_col: str = "canonical",
                 dist_col: str = "lev"):
    """Nearest-canonical standardization: map every (messy) value to its
    closest entry of a SMALL canonical list by Levenshtein distance,
    ties to the alphabetically first candidate. The list broadcasts via
    ``ray.put``; each batch scores its UNIQUE values against all
    candidates through the vectorized pair kernel
    (functions/matchers_vec.levenshtein_pairs) — work ∝ distinct values
    × |canon|, zero shuffle. Null values stay null."""
    import ray

    from ..functions.broadcast import cached_get
    from ..functions.matchers_vec import levenshtein_pairs

    ref = ray.put(sorted(canon))

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        cands = cached_get(ref)
        vals = b[column].astype(object)
        uniq = pd.unique(vals.dropna())
        if len(uniq):
            import numpy as np

            d = np.stack([
                levenshtein_pairs(uniq, np.repeat(c, len(uniq)))
                for c in cands
            ], axis=1)  # (n_uniq, n_canon)
            best = d.argmin(axis=1)  # ties → first (alphabetical) index
            canon_map = {u: cands[j] for u, j in zip(uniq, best)}
            dist_map = {u: int(di) for u, di in
                        zip(uniq, d[np.arange(len(uniq)), best])}
        else:
            canon_map, dist_map = {}, {}
        b = b.copy()
        # direct dict scatter (Series.map(dict) is a vectorized lookup;
        # a lambda per row is not) — unmapped/null values stay null
        b[out_col] = vals.map(canon_map)
        b[dist_col] = vals.map(dist_map)
        return b

    return ds.map_batches(stage, batch_format="pandas")
