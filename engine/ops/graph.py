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

import numpy as np
import pyarrow as pa

import ray.data

from engine.ops import relational as rel


def _partial_counts(col: str):
    """Per-block (value, count) partials — the combiner half of a
    grouped count. Blocks shrink to their unique keys before leaving
    the worker; the tiny partials are merged by ``_merge_counts``."""
    def fn(b: pa.Table) -> pa.Table:
        u, c = np.unique(b[col].to_numpy(), return_counts=True)
        return pa.table({col: pa.array(u, type=pa.int64()),
                         "c": pa.array(c, type=pa.int64())})
    return fn


def _merge_counts(t: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Merge (value, c) partials: sorted unique values + summed counts."""
    v = t[col].to_numpy()
    c = t["c"].to_numpy()
    o = np.argsort(v, kind="stable")
    v, c = v[o], c[o]
    nb = np.empty(len(v), dtype=bool)
    nb[0] = True
    nb[1:] = v[1:] != v[:-1]
    st = np.flatnonzero(nb)
    return v[st], np.add.reduceat(c, st)


def gather_nodes(edges: ray.data.Dataset, from_col: str, to_col: str,
                 frontier: pa.Array) -> pa.Array:
    """One hop: distinct ``to_col`` values over edges whose
    ``from_col`` is in ``frontier``. Distinct runs as per-block
    partial counts merged on the driver (the frontier lives there
    anyway — same small-node-space assumption as the traversal)."""
    hop = rel.semi_join(edges, frontier, from_col)
    t = _collect(hop.select_columns([to_col])
                 .map_batches(_partial_counts(to_col),
                              batch_format="pyarrow"))
    if t is None:
        return pa.array([], type=pa.int64())
    u, _ = _merge_counts(t, to_col)
    return pa.array(u, type=pa.int64())


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
    loc_t = _collect(hop.select_columns([to_col])
                     .map_batches(_partial_counts(to_col),
                                  batch_format="pyarrow"))
    if loc_t is None or not loc_t.num_rows:
        return empty
    glob_t = _collect(edges.select_columns([to_col])
                      .map_batches(_partial_counts(to_col),
                                   batch_format="pyarrow"))
    nodes, cnt = _merge_counts(loc_t, to_col)
    gnodes, gc = _merge_counts(glob_t, to_col)
    total = int(gc.sum())
    gcnt = gc[np.searchsorted(gnodes, nodes)].astype(np.float64)
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
    # materialize() first: to_arrow_refs() on a lazy Dataset executes
    # the plan twice (limit-1 schema probe)
    tabs = [t for t in ray.get(ds.materialize().to_arrow_refs())
            if t.num_rows]
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
    def loc_distinct(b: pa.Table) -> pa.Table:
        f = b[from_col].to_numpy()
        tt = b[to_col].to_numpy()
        if not len(f):
            return b
        o = np.lexsort((tt, f))
        f, tt = f[o], tt[o]
        nb = np.empty(len(f), dtype=bool)
        nb[0] = True
        nb[1:] = (f[1:] != f[:-1]) | (tt[1:] != tt[:-1])
        return pa.table({from_col: pa.array(f[nb], type=pa.int64()),
                         to_col: pa.array(tt[nb], type=pa.int64())})

    for depth in range(1, max_depth + 1):
        # per-batch local distinct + driver distinct: the level's
        # parent map is collected to the driver anyway, so a full
        # groupby-shuffle per level only added latency
        hop = rel.semi_join(edges, frontier, from_col) \
            .select_columns([from_col, to_col]) \
            .map_batches(loc_distinct, batch_format="pyarrow")
        t = _collect(hop)
        if t is None:
            return empty
        fv = t[from_col].to_numpy()
        tv = t[to_col].to_numpy()
        o = np.lexsort((tv, fv))
        fv, tv = fv[o], tv[o]
        nb = np.empty(len(fv), dtype=bool)
        nb[0] = True
        nb[1:] = (fv[1:] != fv[:-1]) | (tv[1:] != tv[:-1])
        lvl: dict[int, list[int]] = {}
        for f, to in zip(fv[nb].tolist(), tv[nb].tolist()):
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


def graph_query(docs: ray.data.Dataset, id_col: str, from_col: str,
                to_col: str, roots: ray.data.Dataset,
                max_depth: int, return_root: bool = True) -> pa.Table:
    """Solr ``{!graph}`` query parser (upstream
    ``S/search/join/GraphQuery.java`` / ``GraphQueryParser`` [U]):
    query-time traversal FILTER over ONE collection. Root docs seed a
    frontier of their ``from_col`` values; each hop matches docs whose
    ``to_col`` carries a frontier value, adding their ids to the
    result and their own ``from_col`` values to the next frontier;
    traversal stops after ``max_depth`` hops (upstream ``maxDepth``;
    pass a large value for the unlimited ``-1``) or at a fixed point
    (no unseen frontier values — upstream's bitset convergence check).
    Result = distinct ``id_col`` of every traversed doc, plus the
    roots when ``return_root`` (upstream ``returnRoot`` default true).

    Each hop is a broadcast semi-join probe — the frontier value set
    ships once via ``ray.put`` while the collection streams through
    ``map_batches`` with a per-batch distinct of the 2-column
    ``(id, from)`` projection; the collection is never shuffled.
    Frontier / visited-value sets live on the driver: the same
    small-node-space assumption as ``gather_nodes`` (upstream keeps
    the traversal docset on one node too)."""
    def pairs(b: pa.Table) -> pa.Table:
        i = b[id_col].to_numpy().astype(np.int64)
        f = b[from_col].to_numpy().astype(np.int64)
        if len(i):
            o = np.lexsort((f, i))
            i, f = i[o], f[o]
            nb = np.empty(len(i), dtype=bool)
            nb[0] = True
            nb[1:] = (i[1:] != i[:-1]) | (f[1:] != f[:-1])
            i, f = i[nb], f[nb]
        return pa.table({id_col: pa.array(i, type=pa.int64()),
                         from_col: pa.array(f, type=pa.int64())})

    proj = [id_col, from_col] if from_col != id_col else [id_col]
    t = _collect(roots.select_columns(proj)
                 .map_batches(pairs, batch_format="pyarrow"))
    matched: set[int] = set()
    if t is not None and return_root:
        matched.update(t[id_col].to_numpy().tolist())
    queried: set[int] = set()
    frontier = (set(t[from_col].to_numpy().tolist())
                if t is not None else set())
    for _ in range(max_depth):
        new_vals = sorted(frontier - queried)
        if not new_vals:
            break                          # fixed point — converged
        queried.update(new_vals)
        hop = rel.semi_join(docs, pa.array(new_vals, type=pa.int64()),
                            to_col)
        t = _collect(hop.select_columns(proj)
                     .map_batches(pairs, batch_format="pyarrow"))
        if t is None:
            break
        matched.update(t[id_col].to_numpy().tolist())
        frontier = set(t[from_col].to_numpy().tolist())
    return pa.table({id_col: pa.array(sorted(matched),
                                      type=pa.int64())})
