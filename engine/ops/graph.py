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


def score_nodes(edges: ray.data.Dataset, from_col: str, to_col: str,
                frontier: pa.Array) -> pa.Table:
    """``scoreNodes`` (upstream ``SJ/graph/ScoreNodesStream`` [U]):
    rank gathered nodes tf-idf-style — ``count`` = edges reaching the
    node from the frontier (the traversal's term frequency) and
    ``score = count * ln(total_edges / global_count)`` where
    ``global_count`` is the node's frequency over the WHOLE edge
    table (its document frequency). Both sides are grouped aggregates:
    the frontier-restricted count via a broadcast semi-join, the
    global count via a plain groupby — no driver loops.

    Returns (node, cnt, score f64) sorted score desc, node asc."""
    empty = pa.table({"node": pa.array([], type=pa.int64()),
                      "cnt": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})
    if not len(frontier):
        return empty
    hop = rel.semi_join(edges, frontier, from_col)
    loc = hop.select_columns([to_col]).groupby(to_col).count()
    loc_t = _collect(loc)
    if loc_t is None or not loc_t.num_rows:
        return empty
    glob = edges.select_columns([to_col]).groupby(to_col).count()
    glob_t = _collect(glob)
    total = int(edges.count())
    import numpy as np
    import pyarrow.compute as pc

    nodes = loc_t[to_col].cast(pa.int64()).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    cnt = loc_t["count()"].to_numpy().astype(np.int64)
    gidx = pc.index_in(loc_t[to_col], value_set=glob_t[to_col])
    gcnt = glob_t["count()"].take(gidx).to_numpy().astype(np.float64)
    # quantize (floor-half-up, 6 dp) so a SQL oracle's libm ln agrees
    score = np.floor(cnt.astype(np.float64) * np.log(total / gcnt)
                     * 1e6 + 0.5) / 1e6
    order = np.lexsort((nodes, -score))
    return pa.table({
        "node": pa.array(nodes[order], type=pa.int64()),
        "cnt": pa.array(cnt[order], type=pa.int64()),
        "score": pa.array(score[order], type=pa.float64()),
    })


def _collect(ds: ray.data.Dataset) -> pa.Table | None:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs).combine_chunks() if tabs else None
