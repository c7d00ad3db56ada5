"""Iterative graph ranking over an edge Dataset — PageRank with the
quantized-state trick (ranks re-rounded every round, so float iteration
is engine-stable and a SQL oracle can replay every round with unrolled
CTEs, exactly like similarity/kmeans).

Scale shape: edges stay a Dataset throughout; each round is one
streaming pass computing per-edge contributions ``r[src]·w/outdeg[src]``
against the BROADCAST rank vector, folded to per-dst sums by the
grouped-aggregate partial machinery. Driver state = the rank vector
(one float per node). Node spaces too large for a broadcast would swap
the vector for a keyed Dataset and one hash-bucketed join per round —
the components-propagation shape — documented, not needed while nodes ≪
edges (the usual web-graph regime).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RANK_ROUND = 9  # per-round quantization; final outputs re-round to 6


def pagerank(edges_ds, damping: float = 0.85, rounds: int = 5):
    """PageRank over a weighted DIRECTED edge Dataset (src, dst, w) —
    symmetrize upstream for undirected graphs. Every node must have out
    edges (true after symmetrization); the dangling-mass term is
    therefore omitted. → DataFrame (node, rank) with rank quantized to
    RANK_ROUND decimals."""
    import ray

    from ..functions.broadcast import cached_get
    from ..profiling.groupagg import grouped_aggregate

    # consumed once per round: materialize with a bounded block count so
    # per-round task launches stay fixed as upstream block counts grow
    # (neutral at sf0.1 where rounds cost 0.5-1 s; the bound matters when
    # the upstream exchange emits hundreds of small blocks)
    edges_ds = edges_ds.repartition(32).materialize()

    od = grouped_aggregate(edges_ds, ["src"], {"od": ("w", "sum")},
                           final="driver")
    nodes = np.sort(od["src"].to_numpy())
    odv = od.set_index("src")["od"].reindex(nodes).to_numpy(dtype=np.float64)
    n = len(nodes)
    ranks = np.full(n, round(1.0 / n, RANK_ROUND))

    for _ in range(rounds):
        ref = ray.put((nodes, ranks, odv))

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            ns, rs, ods = cached_get(ref)
            pos = np.searchsorted(ns, b["src"].to_numpy())
            c = (rs[pos] * b["w"].to_numpy(dtype=np.float64)) / ods[pos]
            return pd.DataFrame({"dst": b["dst"].to_numpy(), "c": c})

        m = grouped_aggregate(edges_ds.map_batches(contrib,
                                                   batch_format="pandas"),
                              ["dst"], {"m": ("c", "sum")}, final="driver")
        mv = m.set_index("dst")["m"].reindex(nodes).fillna(0.0) \
            .to_numpy(dtype=np.float64)
        ranks = np.round((1.0 - damping) / n + damping * mv, RANK_ROUND)

    return pd.DataFrame({"node": nodes, "rank": ranks})
