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


def shortest_path(edges: ray.data.Dataset, from_col: str, to_col: str,
                  src: int, dst: int, max_depth: int) -> pa.Table:
    """``shortestPath`` stream (upstream
    ``SJ/graph/ShortestPathStream.java`` — Solr's BFS shortest-path
    streaming expression [U]): ALL shortest paths from ``src`` to
    ``dst`` over a ``(from_col, to_col)`` edge Dataset, bounded by
    ``max_depth`` hops.

    Level-synchronous BFS with parent tracking: each hop keeps only
    edges leaving the current frontier (broadcast semi-join — the edge
    table streams, the frontier ships once via ``ray.put``), then a
    grouped distinct of (from, to) pairs yields this level's parent
    map. Nodes seen at an earlier level are pruned (they cannot sit at
    this position on a shortest path), so the per-level state is the
    visited set — the same small-side-broadcast assumption as
    ``gather_nodes``; upstream makes the identical one (its traversal
    state lives on one worker).

    Returns (path "a->b->c", depth) rows sorted by path; empty when
    ``dst`` is unreachable within ``max_depth``."""
    src, dst = int(src), int(dst)
    if src == dst:
        return pa.table({"path": pa.array([str(src)]),
                         "depth": pa.array([0], type=pa.int64())})
    empty = pa.table({"path": pa.array([], type=pa.string()),
                      "depth": pa.array([], type=pa.int64())})
    visited = {src}
    frontier = pa.array([src], type=pa.int64())
    parents: list[dict[int, list[int]]] = []   # parents[i] = level i+1
    for depth in range(1, max_depth + 1):
        hop = rel.semi_join(edges, frontier, from_col)
        pairs = hop.select_columns([from_col, to_col]) \
            .groupby([from_col, to_col]).count()
        t = _collect(pairs)
        if t is None:
            return empty
        lvl: dict[int, list[int]] = {}
        for f, to in zip(t[from_col].to_pylist(), t[to_col].to_pylist()):
            to = int(to)
            if to not in visited:
                lvl.setdefault(to, []).append(int(f))
        if not lvl:
            return empty
        parents.append(lvl)
        if dst in lvl:
            maps = parents

            def expand(node: int, d: int) -> list[list[int]]:
                if d == 0:
                    return [[node]]
                return [pre + [node] for p in maps[d - 1][node]
                        for pre in expand(p, d - 1)]

            paths = sorted("->".join(map(str, p))
                           for p in expand(dst, depth))
            return pa.table({
                "path": pa.array(paths),
                "depth": pa.array([depth] * len(paths), type=pa.int64()),
            })
        visited.update(lvl)
        frontier = pa.array(sorted(lvl), type=pa.int64())
    return empty
