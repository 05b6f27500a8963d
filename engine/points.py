"""Points index — the Lucene PointValues / BKD-tree analog (1-D).

Upstream references: ``L/util/bkd/BKDWriter.java`` (sorted leaf
blocks + inner-node min/max), ``L/index/PointValues.java`` (the
``IntersectVisitor`` protocol with ``CELL_INSIDE_QUERY`` /
``CELL_CROSSES_QUERY`` / ``CELL_OUTSIDE_QUERY`` relations),
``L/search/PointRangeQuery.java`` and
``L/document/LongPoint.java#newRangeQuery`` [U].

A 1-D BKD tree is exactly a value-sorted file with a block
directory: leaves hold a fixed number of points, inner nodes carry
``(min, max)`` per subtree so a range query counts fully-covered
leaves without decoding them and visits only the boundary
("crosses") leaves point-by-point.

Ray-Data-native restatement: ONE distributed ``sort(value, id)`` →
fixed-size leaf Parquet files written by parallel tasks, plus a tiny
directory table ``(leaf, min, max, count, sum)`` committed LAST
(manifest-style: the directory names exactly the leaf files that
make up the index, so a crashed build is invisible). A range query
reads ONLY the directory (O(leaves) driver arithmetic, no corpus
I/O), answers count/sum for INSIDE leaves from directory stats, and
decodes just the CROSSES leaves — for a contiguous 1-D range that is
at most 2 leaves plus duplicate-value ties, independent of corpus
size.  At 100 TB the directory itself (1 row per ~8k-row leaf) stays
millions of times smaller than the data and still fits one node; a
two-level directory (directory-of-directories) is the same pattern
applied once more.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

LEAF_ROWS = 4096
_DIR_NAME = "points_directory.json"
_DIR2D_NAME = "points2d_directory.json"
GEO_SCALE = 10_000_000          # 1e-7 degrees, LatLonPoint-precision


def build_points(ds: ray.data.Dataset, value_col: str, id_col: str,
                 out_dir: str, leaf_rows: int = LEAF_ROWS) -> str:
    """Build the points index: one global sort, parallel leaf writes,
    directory committed last. ``value_col`` must be integral (callers
    quantize floats — e.g. money to cents — exactly as Lucene callers
    encode doubles to sortable longs)."""
    done = os.path.join(out_dir, _DIR_NAME)
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    mat = ds.sort([value_col, id_col]).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def write_leaves(t: pa.Table, block: int) -> list[dict]:
        rows = []
        for i, s in enumerate(range(0, t.num_rows, leaf_rows)):
            leaf = t.slice(s, leaf_rows)
            vals = leaf[value_col].to_numpy(zero_copy_only=False)
            name = f"leaf-{block:05d}-{i:05d}.parquet"
            pq.write_table(
                pa.table({id_col: leaf[id_col],
                          value_col: leaf[value_col].cast(pa.int64())}),
                os.path.join(out_dir, name))
            rows.append({"file": name,
                         "min": int(vals.min()), "max": int(vals.max()),
                         "count": int(len(vals)),
                         "sum": int(vals.sum(dtype=np.int64))})
        return rows

    parts = ray.get([write_leaves.remote(r, i)
                     for i, r in enumerate(refs)])
    directory = [row for p in parts for row in p]
    tmp = done + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"value_col": value_col, "id_col": id_col,
                   "leaf_rows": leaf_rows, "leaves": directory}, f)
    os.replace(tmp, done)                      # commit = directory last
    return out_dir


def _load_dir(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _DIR_NAME)) as f:
        return json.load(f)


def range_agg(index_dir: str, lo: int | None, hi: int | None) -> dict:
    """``PointRangeQuery`` count+sum over ``[lo, hi)`` — the
    IntersectVisitor walk: INSIDE leaves answered from the directory
    (zero I/O), OUTSIDE leaves skipped, CROSSES leaves decoded with a
    vectorized mask. Returns the pruning evidence
    (``decoded_leaves``/``inside_leaves``/``total_leaves``) alongside
    count and sum so callers/tests can assert the BKD behavior."""
    d = _load_dir(index_dir)
    lo_v = -(1 << 63) if lo is None else int(lo)
    # None => +inf: no int64 sentinel exists above all values, so an
    # unbounded hi is one past the directory's global max
    hi_v = (max((leaf["max"] for leaf in d["leaves"]), default=0) + 1) \
        if hi is None else int(hi)
    count = 0
    total = 0
    inside = 0
    decode = []
    for leaf in d["leaves"]:
        if leaf["max"] < lo_v or leaf["min"] >= hi_v:
            continue                            # CELL_OUTSIDE_QUERY
        if leaf["min"] >= lo_v and leaf["max"] < hi_v:
            count += leaf["count"]              # CELL_INSIDE_QUERY
            total += leaf["sum"]
            inside += 1
        else:
            decode.append(leaf["file"])         # CELL_CROSSES_QUERY

    vcol = d["value_col"]
    for name in decode:
        vals = pq.read_table(os.path.join(index_dir, name),
                             columns=[vcol])[vcol] \
            .to_numpy(zero_copy_only=False)
        m = (vals >= lo_v) & (vals < hi_v)
        count += int(m.sum())
        total += int(vals[m].sum(dtype=np.int64))
    return {"count": count, "sum": total,
            "decoded_leaves": len(decode), "inside_leaves": inside,
            "total_leaves": len(d["leaves"])}


def range_ids(index_dir: str, lo: int | None, hi: int | None
              ) -> np.ndarray:
    """Matching ids for ``[lo, hi)``: INSIDE leaves read only the id
    column, CROSSES leaves masked — the collect form of the same
    visitor walk (``LongPoint.newRangeQuery`` → DocIdSet)."""
    d = _load_dir(index_dir)
    lo_v = -(1 << 63) if lo is None else int(lo)
    hi_v = (max((leaf["max"] for leaf in d["leaves"]), default=0) + 1) \
        if hi is None else int(hi)
    icol, vcol = d["id_col"], d["value_col"]
    out = []
    for leaf in d["leaves"]:
        if leaf["max"] < lo_v or leaf["min"] >= hi_v:
            continue
        p = os.path.join(index_dir, leaf["file"])
        if leaf["min"] >= lo_v and leaf["max"] < hi_v:
            out.append(pq.read_table(p, columns=[icol])[icol]
                       .to_numpy(zero_copy_only=False))
        else:
            t = pq.read_table(p)
            vals = t[vcol].to_numpy(zero_copy_only=False)
            m = (vals >= lo_v) & (vals < hi_v)
            out.append(t[icol].to_numpy(zero_copy_only=False)[m])
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(out))


def _spread32(x: np.ndarray) -> np.ndarray:
    """Spread the lower 32 bits of each uint64 to the even bit
    positions (classic Morton magic-constant dilation)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def quantize_deg(deg: np.ndarray, scale: int = GEO_SCALE) -> np.ndarray:
    """floor(deg * scale) — the sortable-int encoding of a coordinate
    (Lucene ``GeoEncodingUtils.encodeLatitude`` analog: fixed ~1e-7°
    grid, floor rounding). f64 op order matches the SQL oracle
    (``FLOOR(deg * scale)``) bit-for-bit."""
    return np.floor(np.asarray(deg, dtype=np.float64) * float(scale)) \
        .astype(np.int64)


def morton_key(lat_q: np.ndarray, lon_q: np.ndarray,
               scale: int = GEO_SCALE) -> np.ndarray:
    """Z-order (Morton) interleave of the two quantized coordinates.
    Offsets make both axes non-negative 32-bit; lat bit 31 is always 0
    so the interleaved key fits a POSITIVE int64 (sortable by Arrow)."""
    lat_u = (lat_q + 90 * scale).astype(np.uint64)
    lon_u = (lon_q + 180 * scale).astype(np.uint64)
    return ((_spread32(lat_u) << np.uint64(1)) | _spread32(lon_u)) \
        .astype(np.int64)


def build_points_2d(ds: ray.data.Dataset, lat_col: str, lon_col: str,
                    id_col: str, out_dir: str, scale: int = GEO_SCALE,
                    leaf_rows: int = LEAF_ROWS) -> str:
    """2-D points index — the ``LatLonPoint`` / 2-D BKD analog
    (upstream ``L/document/LatLonPoint.java#newBoxQuery``,
    ``L/util/bkd/BKDWriter.java`` with numDims=2 [U]).

    Where the real BKD recursively splits the widest dimension, the
    Ray-native restatement gets the same leaf-level spatial locality
    from ONE distributed sort on the Z-order (Morton) interleave of
    the quantized coordinates: consecutive fixed-size leaves cover
    compact rectangles, so each leaf's stored bounding box
    (min/max lat, min/max lon) prunes box queries exactly like the
    BKD's inner-node bounds. The directory (one row per leaf) is the
    only driver-side state and is committed LAST (manifest-style)."""
    done = os.path.join(out_dir, _DIR2D_NAME)
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def encode(b: pa.Table) -> pa.Table:
        lat_q = quantize_deg(b[lat_col].to_numpy(zero_copy_only=False),
                             scale)
        lon_q = quantize_deg(b[lon_col].to_numpy(zero_copy_only=False),
                             scale)
        return pa.table({
            id_col: b[id_col],
            "lat_q": pa.array(lat_q, type=pa.int64()),
            "lon_q": pa.array(lon_q, type=pa.int64()),
            "zkey": pa.array(morton_key(lat_q, lon_q, scale),
                             type=pa.int64())})

    mat = ds.map_batches(encode, batch_format="pyarrow") \
        .sort(["zkey", id_col]).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def write_leaves(t: pa.Table, block: int) -> list[dict]:
        rows = []
        for i, s in enumerate(range(0, t.num_rows, leaf_rows)):
            leaf = t.slice(s, leaf_rows)
            la = leaf["lat_q"].to_numpy(zero_copy_only=False)
            lo = leaf["lon_q"].to_numpy(zero_copy_only=False)
            name = f"leaf2d-{block:05d}-{i:05d}.parquet"
            pq.write_table(leaf.select([id_col, "lat_q", "lon_q"]),
                           os.path.join(out_dir, name))
            rows.append({"file": name, "count": int(len(la)),
                         "min_lat": int(la.min()), "max_lat": int(la.max()),
                         "min_lon": int(lo.min()), "max_lon": int(lo.max())})
        return rows

    parts = ray.get([write_leaves.remote(r, i)
                     for i, r in enumerate(refs)])
    directory = [row for p in parts for row in p]
    tmp = done + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"lat_col": lat_col, "lon_col": lon_col,
                   "id_col": id_col, "scale": scale,
                   "leaf_rows": leaf_rows, "leaves": directory}, f)
    os.replace(tmp, done)                      # commit = directory last
    return out_dir


def _load_dir_2d(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _DIR2D_NAME)) as f:
        return json.load(f)


def _bbox_walk(index_dir: str, lat_lo: float, lat_hi: float,
               lon_lo: float, lon_hi: float, collect_ids: bool) -> dict:
    """IntersectVisitor walk over the 2-D directory: the box is the
    INCLUSIVE quantized rectangle [floor(lo·s), floor(hi·s)] on each
    axis (LatLonPoint.newBoxQuery compares encoded ints the same
    way). INSIDE leaves are answered from the directory (count) or
    read id-column-only (collect); only CROSSES leaves decode
    coordinates."""
    d = _load_dir_2d(index_dir)
    s = d["scale"]
    qla_lo, qla_hi = (int(np.floor(lat_lo * float(s))),
                      int(np.floor(lat_hi * float(s))))
    qlo_lo, qlo_hi = (int(np.floor(lon_lo * float(s))),
                      int(np.floor(lon_hi * float(s))))
    icol = d["id_col"]
    count, inside, decode, ids = 0, 0, [], []
    for leaf in d["leaves"]:
        if (leaf["max_lat"] < qla_lo or leaf["min_lat"] > qla_hi
                or leaf["max_lon"] < qlo_lo or leaf["min_lon"] > qlo_hi):
            continue                            # CELL_OUTSIDE_QUERY
        if (leaf["min_lat"] >= qla_lo and leaf["max_lat"] <= qla_hi
                and leaf["min_lon"] >= qlo_lo
                and leaf["max_lon"] <= qlo_hi):
            count += leaf["count"]              # CELL_INSIDE_QUERY
            inside += 1
            if collect_ids:
                ids.append(pq.read_table(
                    os.path.join(index_dir, leaf["file"]),
                    columns=[icol])[icol].to_numpy(zero_copy_only=False))
        else:
            decode.append(leaf["file"])         # CELL_CROSSES_QUERY
    for name in decode:
        t = pq.read_table(os.path.join(index_dir, name))
        la = t["lat_q"].to_numpy(zero_copy_only=False)
        lo = t["lon_q"].to_numpy(zero_copy_only=False)
        m = ((la >= qla_lo) & (la <= qla_hi)
             & (lo >= qlo_lo) & (lo <= qlo_hi))
        count += int(m.sum())
        if collect_ids:
            ids.append(t[icol].to_numpy(zero_copy_only=False)[m])
    out = {"count": count, "decoded_leaves": len(decode),
           "inside_leaves": inside, "total_leaves": len(d["leaves"])}
    if collect_ids:
        out["ids"] = (np.sort(np.concatenate(ids)) if ids
                      else np.empty(0, dtype=np.int64))
    return out


def bbox_agg(index_dir: str, lat_lo: float, lat_hi: float,
             lon_lo: float, lon_hi: float) -> dict:
    """``LatLonPoint.newBoxQuery`` count with pruning evidence."""
    return _bbox_walk(index_dir, lat_lo, lat_hi, lon_lo, lon_hi, False)


def bbox_ids(index_dir: str, lat_lo: float, lat_hi: float,
             lon_lo: float, lon_hi: float) -> dict:
    """Box-query matching ids (sorted) + pruning evidence."""
    return _bbox_walk(index_dir, lat_lo, lat_hi, lon_lo, lon_hi, True)


def distance_ids(index_dir: str, clat: float, clon: float,
                 radius_km: float) -> dict:
    """``LatLonPoint.newDistanceQuery`` analog (upstream
    ``L/document/LatLonPoint.java#newDistanceQuery``,
    ``L/geo/Rectangle.java#fromPointDistance`` [U]): the circle's
    bounding box — derived exactly as Lucene's Rectangle.fromPointDistance
    (lat span from the radius arc, lon span widened by the highest
    |lat| the box reaches) — prunes leaves through the 2-D directory
    with ZERO I/O; every surviving leaf decodes and evaluates the
    exact quantized haversine on the GRID coordinates (lat_q/scale),
    so results are bit-reproducible against a SQL oracle that floors
    the same way.

    Safety note: leaf-vs-circle INSIDE/OUTSIDE classification on a
    sphere has pole/antimeridian subtleties, so this walk only ever
    prunes on the (safe) axis-aligned box disjointness test and
    verifies everything else exactly — candidates ∝ circle area, the
    right 100-TB scaling. A box crossing ±180° or a pole falls back
    to the full lon range (correct, just less pruning)."""
    from engine.ops.spatial import (EARTH_RADIUS_KM, haversine_km,
                                    quantize_km)
    d = _load_dir_2d(index_dir)
    s = float(d["scale"])
    dlat = np.degrees(radius_km / EARTH_RADIUS_KM)
    top = min(89.999, abs(clat) + dlat)
    cos_top = np.cos(np.radians(top))
    if dlat >= 89.999 - abs(clat) or cos_top <= 1e-9:
        lon_lo, lon_hi = -180.0, 180.0          # pole inside the box
    else:
        dlon = np.degrees(radius_km / (EARTH_RADIUS_KM * cos_top))
        if dlon >= 180.0 or clon - dlon < -180.0 or clon + dlon > 180.0:
            lon_lo, lon_hi = -180.0, 180.0      # antimeridian wrap
        else:
            lon_lo, lon_hi = clon - dlon, clon + dlon
    qla_lo = int(np.floor((clat - dlat) * s))
    qla_hi = int(np.floor((clat + dlat) * s))
    qlo_lo = int(np.floor(lon_lo * s))
    qlo_hi = int(np.floor(lon_hi * s))
    icol = d["id_col"]
    ids, dists, decoded = [], [], 0
    for leaf in d["leaves"]:
        if (leaf["max_lat"] < qla_lo or leaf["min_lat"] > qla_hi
                or leaf["max_lon"] < qlo_lo or leaf["min_lon"] > qlo_hi):
            continue                            # box-disjoint: OUTSIDE
        decoded += 1
        t = pq.read_table(os.path.join(index_dir, leaf["file"]))
        lat_g = t["lat_q"].to_numpy(zero_copy_only=False) / s
        lon_g = t["lon_q"].to_numpy(zero_copy_only=False) / s
        dk = quantize_km(haversine_km(clat, clon, lat_g, lon_g))
        m = dk <= radius_km
        ids.append(t[icol].to_numpy(zero_copy_only=False)[m])
        dists.append(dk[m])
    out_ids = (np.concatenate(ids) if ids else np.empty(0, np.int64))
    out_d = (np.concatenate(dists) if dists else np.empty(0, np.float64))
    order = np.lexsort((out_ids, out_d))        # dist asc, id asc
    return {"ids": out_ids[order], "dist_km": out_d[order],
            "count": int(len(out_ids)), "decoded_leaves": decoded,
            "total_leaves": len(d["leaves"])}


def range_facet(index_dir: str, lo: int, hi: int,
                n_buckets: int) -> list[dict]:
    """``RangeFacetCounts`` over point values (upstream
    ``lucene/facet/.../range/LongRangeFacetCounts.java`` [U]):
    equal-width bucket counts for ``[lo, hi)`` answered from the BKD
    directory — INSIDE leaves add their count to a bucket without
    decode when the whole leaf falls in one bucket; only leaves
    straddling a bucket edge decode. O(buckets + boundary leaves)
    I/O, independent of corpus size."""
    if hi <= lo or n_buckets <= 0:
        return []
    d = _load_dir(index_dir)
    width = (hi - lo + n_buckets - 1) // n_buckets
    counts = np.zeros(n_buckets, dtype=np.int64)
    decoded = 0
    vcol = d["value_col"]
    for leaf in d["leaves"]:
        if leaf["max"] < lo or leaf["min"] >= hi:
            continue
        b_lo = (leaf["min"] - lo) // width
        b_hi = (leaf["max"] - lo) // width
        if leaf["min"] >= lo and leaf["max"] < hi and b_lo == b_hi:
            counts[b_lo] += leaf["count"]       # whole leaf, one bucket
            continue
        decoded += 1
        vals = pq.read_table(os.path.join(index_dir, leaf["file"]),
                             columns=[vcol])[vcol] \
            .to_numpy(zero_copy_only=False)
        m = (vals >= lo) & (vals < hi)
        counts += np.bincount((vals[m] - lo) // width,
                              minlength=n_buckets)[:n_buckets]
    return [{"bucket": int(i), "lo": int(lo + i * width),
             "hi": int(lo + (i + 1) * width), "n": int(counts[i]),
             "decoded_leaves": decoded}
            for i in range(n_buckets)]


def _min_km_to_box(clat: float, clon: float, min_lat: float,
                   max_lat: float, min_lon: float, max_lon: float) -> float:
    """Provably-safe lower bound (km) on the haversine distance from
    ``(clat, clon)`` to ANY point of the lat/lon rectangle.

    The haversine central angle satisfies
    ``sin²(θ/2) = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)``; each term is
    lower-bounded independently — Δφ by the latitude gap to the box,
    Δλ by the (wrap-aware) longitude gap, and ``cosφ₂`` by its minimum
    over the box's latitude range (attained at the endpoint of larger
    ``|lat|``). A combined bound from per-term minima is valid because
    both terms are monotone in their gap. This deliberately
    under-estimates (never over-estimates) the true minimum, so
    best-first pruning with it is exact — the same safety contract as
    Lucene's ``Rectangle.axisLat`` handling in ``NearestNeighbor.java``
    [U], reached by a cruder but provable route."""
    from engine.ops.spatial import EARTH_RADIUS_KM
    if clat < min_lat:
        dphi = min_lat - clat
    elif clat > max_lat:
        dphi = clat - max_lat
    else:
        dphi = 0.0
    if min_lon <= clon <= max_lon:
        dlmb = 0.0
    else:
        d1 = abs(clon - min_lon) % 360.0
        d2 = abs(clon - max_lon) % 360.0
        dlmb = min(min(d1, 360.0 - d1), min(d2, 360.0 - d2))
    cos_box = np.cos(np.radians(max(abs(min_lat), abs(max_lat))))
    s = (np.sin(np.radians(dphi) / 2.0) ** 2
         + np.cos(np.radians(clat)) * max(0.0, cos_box)
         * np.sin(np.radians(dlmb) / 2.0) ** 2)
    return float(2.0 * EARTH_RADIUS_KM
                 * np.arcsin(min(1.0, np.sqrt(max(0.0, s)))))


def nearest_ids(index_dir: str, clat: float, clon: float, k: int) -> dict:
    """k-nearest-neighbor points through the 2-D directory — the
    ``LatLonPointPrototypeQueries.nearest`` / ``NearestNeighbor.java``
    analog (upstream ``lucene/sandbox/src/java/org/apache/lucene/
    document/NearestNeighbor.java`` [U]): best-first traversal of
    leaves ordered by a safe lower bound of the point→bbox distance;
    a leaf decodes only while its bound can still beat the current
    k-th distance, so I/O ∝ the leaves overlapping the final k-NN
    circle, independent of corpus size. Exact quantized haversine on
    the 1e-7° grid (same arithmetic as ``distance_ids``) keeps the
    result bit-reproducible against a SQL oracle; final order is
    (dist asc, id asc)."""
    import heapq

    from engine.ops.spatial import haversine_km, quantize_km
    d = _load_dir_2d(index_dir)
    s = float(d["scale"])
    icol = d["id_col"]
    if k <= 0:
        return {"ids": np.empty(0, dtype=np.int64),
                "dist_km": np.empty(0, dtype=np.float64),
                "decoded_leaves": 0,
                "total_leaves": len(d["leaves"])}
    heap = []
    for i, leaf in enumerate(d["leaves"]):
        lb = _min_km_to_box(clat, clon, leaf["min_lat"] / s,
                            leaf["max_lat"] / s, leaf["min_lon"] / s,
                            leaf["max_lon"] / s)
        heapq.heappush(heap, (lb, i))
    best_ids = np.empty(0, dtype=np.int64)
    best_d = np.empty(0, dtype=np.float64)
    decoded = 0
    while heap:
        lb, i = heapq.heappop(heap)
        # 1e-3 slack covers the exact distances' half-up quantization
        if len(best_ids) >= k and lb > best_d[k - 1] + 1e-3:
            break                               # no leaf can improve
        leaf = d["leaves"][i]
        decoded += 1
        t = pq.read_table(os.path.join(index_dir, leaf["file"]))
        lat_g = t["lat_q"].to_numpy(zero_copy_only=False) / s
        lon_g = t["lon_q"].to_numpy(zero_copy_only=False) / s
        dk = quantize_km(haversine_km(clat, clon, lat_g, lon_g))
        ids = t[icol].to_numpy(zero_copy_only=False)
        all_ids = np.concatenate([best_ids, ids])
        all_d = np.concatenate([best_d, dk])
        order = np.lexsort((all_ids, all_d))[:k]
        best_ids, best_d = all_ids[order], all_d[order]
    return {"ids": best_ids, "dist_km": best_d,
            "decoded_leaves": decoded,
            "total_leaves": len(d["leaves"])}
