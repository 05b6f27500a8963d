"""Graph traversal streams (upstream ``SJ/graph/GatherNodesStream.java``,
``NodesStream`` — Solr streaming-expression graph expansion [U]).

``gather_nodes`` is one breadth-first hop over an edge table expressed
as a Ray Dataset: a broadcast semi-join keeps only edges leaving the
frontier (no shuffle of the edge table), then a small grouped distinct
collects the next frontier. ``walk`` chains hops across edge tables —
the reference's multi-level ``nodes(...)`` expression.

Scale note: the frontier set is broadcast via ``ray.put`` once per hop
(small side), while each edge table streams through ``map_batches`` —
the same partitioning story as every other broadcast join here. A
frontier too large to broadcast would switch to the shuffle
``hash_join`` path; that cutoff is the caller's choice.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from engine.ops import relational as rel


def gather_nodes(edges: ray.data.Dataset, from_col: str, to_col: str,
                 frontier: pa.Array) -> pa.Array:
    """One hop: distinct ``to_col`` values over edges whose
    ``from_col`` is in ``frontier``. Distinct runs as a grouped count
    (partial-per-block combine, small shuffle of unique keys only)."""
    hop = rel.semi_join(edges, frontier, from_col)
    uniq = hop.select_columns([to_col]).groupby(to_col).count()
    tabs = [t for t in ray.get(uniq.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.array([], type=pa.int64())
    return pa.concat_tables(tabs).combine_chunks()[to_col] \
        .combine_chunks().cast(pa.int64())


def walk(hops: list[tuple[ray.data.Dataset, str, str]],
         seeds: pa.Array) -> pa.Table:
    """Multi-level ``gatherNodes``: run each ``(edges, from, to)`` hop
    in turn, feeding each level's distinct nodes into the next.
    Returns ``(level, node)`` rows (level 1 = first expansion), sorted
    by (level, node) — the traversal's collect output."""
    levels, nodes = [], []
    frontier = seeds
    for lvl, (edges, f, t) in enumerate(hops, start=1):
        frontier = gather_nodes(edges, f, t, frontier)
        arr = frontier.sort()
        levels.append(pa.array([lvl] * len(arr), type=pa.int64()))
        nodes.append(arr)
    return pa.table({
        "level": pa.concat_arrays(levels),
        "node": pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in nodes]),
    })
