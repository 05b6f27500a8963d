"""Relational / dataflow operators over ray.data.Dataset.

Ray-native re-expressions of Solr streaming expressions and facet/stats
components (SURVEY.md §2.5-2.7; upstream ``SJ/stream/*Stream.java``,
``S/request/SimpleFacets.java``, ``S/search/facet/`` [U]). Each helper
is a thin, streaming-safe composition of Dataset primitives:
aggregations push partial work into ``map_batches``/grouped aggregates,
small sides broadcast via ``ray.put`` instead of shuffling, and nothing
materializes the big side on the driver.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum


def rollup(ds: ray.data.Dataset, keys: list[str],
           sums: list[str] = (), means: list[str] = (),
           mins: list[str] = (), maxs: list[str] = (),
           stds: list[str] = ()) -> ray.data.Dataset:
    """``rollup`` stream / StatsComponent: grouped aggregates.

    Ray's grouped aggregates already run partial-per-block then a
    small combine shuffle — the partial/final split of the reference's
    distributed faceting (upstream ``SJ/stream/RollupStream.java`` [U]).
    """
    aggs: list[Any] = [Count()]
    aggs += [Sum(c) for c in sums]
    aggs += [Mean(c) for c in means]
    aggs += [Min(c) for c in mins]
    aggs += [Max(c) for c in maxs]
    aggs += [Std(c) for c in stds]
    return ds.groupby(keys).aggregate(*aggs)


def facet(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
    """Field faceting: per-bucket counts (upstream SimpleFacets [U])."""
    return ds.groupby(keys).count()


def top_k(ds: ray.data.Dataset, sort_keys: list[tuple[str, bool]],
          k: int) -> ray.data.Dataset:
    """``top``/RankStream: top-k by sort (upstream ``RankStream`` [U]).

    Per-block partial top-k (each block shrinks to ≤k rows before
    leaving the worker) + one tiny final merge — top-k is associative,
    so this replaces the full range-partition sort shuffle that
    ``ds.sort().limit(k)`` would run. Callers must provide a total
    order (a unique tiebreak key) for deterministic output."""
    sb = [(c, "descending" if d else "ascending") for c, d in sort_keys]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        return b.sort_by(sb).slice(0, k)

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in ds.schema().base_schema],
            schema=pa.schema(ds.schema().base_schema)))
    final = pa.concat_tables(parts, promote_options="default") \
        .combine_chunks().sort_by(sb).slice(0, k)
    return ray.data.from_arrow(final)


def having(ds: ray.data.Dataset, expr_fn, batch_format: str = "pyarrow"
           ) -> ray.data.Dataset:
    """Post-aggregation filter (upstream ``HavingStream`` [U]):
    ``expr_fn(batch) -> bool mask`` applied vectorized per batch."""
    def _f(b: pa.Table) -> pa.Table:
        return b.filter(expr_fn(b))
    return ds.map_batches(_f, batch_format=batch_format)


def select_eval(ds: ray.data.Dataset, fn) -> ray.data.Dataset:
    """``select`` + evaluators: vectorized projection/compute via a
    batch fn of pyarrow.compute kernels (upstream ``SelectStream`` +
    ``SJ/eval/*Evaluator`` [U])."""
    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_hash_join(big: ray.data.Dataset, small: pa.Table,
                        key: str, small_key: str | None = None,
                        small_cols: list[str] | None = None,
                        how: str = "inner") -> ray.data.Dataset:
    """``hashJoin``: build side broadcast once via ``ray.put``, probed
    inside every map task — no shuffle of the big side (upstream
    ``SJ/stream/HashJoinStream.java`` [U]; broadcast-join pattern).

    ``how``: "inner" or "left" (left-outer: unmatched rows keep nulls).
    """
    small_key = small_key or key
    small_cols = small_cols or [c for c in small.column_names
                                if c != small_key]
    ref = ray.put(small.select([small_key] + small_cols).combine_chunks())

    def probe(batch: pa.Table) -> pa.Table:
        tbl: pa.Table = ray.get(ref)
        idx = pc.index_in(batch[key], value_set=tbl[small_key])
        if how == "inner":
            keep = pc.is_valid(idx)
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for c in small_cols:
            batch = batch.append_column(c, tbl[c].take(idx))
        return batch

    return big.map_batches(probe, batch_format="pyarrow")


def semi_join(big: ray.data.Dataset, keys: pa.Array | pa.ChunkedArray,
              key: str) -> ray.data.Dataset:
    """``intersect`` on key: keep big rows whose key is in ``keys``
    (upstream ``IntersectStream`` [U]); broadcast key-set filter."""
    ref = ray.put(pc.unique(pa.chunked_array([keys]).combine_chunks()))

    def f(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[key], value_set=ray.get(ref)))
    return big.map_batches(f, batch_format="pyarrow")


def anti_join(big: ray.data.Dataset, keys: pa.Array | pa.ChunkedArray,
              key: str) -> ray.data.Dataset:
    """``complement``: big rows whose key is NOT in ``keys`` (upstream
    ``ComplementStream`` [U])."""
    ref = ray.put(pc.unique(pa.chunked_array([keys]).combine_chunks()))

    def f(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.is_in(b[key], value_set=ray.get(ref))))
    return big.map_batches(f, batch_format="pyarrow")


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: str, right_on: str | None = None, how: str = "inner",
              num_partitions: int = 8) -> ray.data.Dataset:
    """``innerJoin``/``leftOuterJoin`` via Ray's distributed hash join
    (both sides shuffled on the key — use broadcast_hash_join when one
    side is small; upstream ``SJ/stream/InnerJoinStream.java`` [U])."""
    how_map = {"inner": "inner", "left": "left_outer",
               "right": "right_outer", "full": "full_outer"}
    return left.join(right, join_type=how_map[how],
                     num_partitions=num_partitions, on=(on,),
                     right_on=(right_on,) if right_on else None)


def unique_first(ds: ray.data.Dataset, key: str, id_col: str
                 ) -> ray.data.Dataset:
    """``unique`` stream / exact dedup: keep min(id) per key — exact
    dedup as hash-partition + per-group first (upstream
    ``UniqueStream``, ``SignatureUpdateProcessorFactory`` [U])."""
    return ds.groupby(key).min(id_col)


def _first_n_per_run(t: pa.Table, key: str, order: list, n: int
                     ) -> pa.Table:
    """Top-n rows per key, fully vectorized: ONE sort by
    (key, sort-keys), run boundaries by adjacent comparison, and a
    rank-within-run mask — no per-group Python whatever the key
    cardinality."""
    if t.num_rows == 0:
        return t
    t = t.sort_by([(key, "ascending")] + order)
    kv = t[key].combine_chunks()
    m = len(kv)
    if m == 1:
        return t
    eq = pc.equal(kv.slice(1), kv.slice(0, m - 1)) \
        .to_numpy(zero_copy_only=False)
    new = np.empty(m, dtype=bool)
    new[0] = True
    np.logical_not(eq, out=new[1:])
    idx = np.arange(m, dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(new, idx, 0))
    keep = (idx - run_start) < n
    return t.filter(pa.array(keep))


def group_top_n(ds: ray.data.Dataset, key: str,
                sort_keys: list[tuple[str, bool]], n: int,
                num_partitions: int = 64) -> ray.data.Dataset:
    """Result grouping / collapse: top-n rows per group (upstream
    ``lucene/grouping``, ``CollapsingQParserPlugin`` [U]).

    Partial top-k shape: each batch keeps ≤n rows per key it contains
    (one vectorized sort + run slice), the shuffle moves only those
    survivors hashed into ``num_partitions`` COARSE groups, and the
    final per-key cut is the same vectorized run slice inside each
    coarse group — per-key cost is flat (no one-Python-call-per-group
    ``map_groups``, which is Ray-overhead-bound at 10^6+ keys)."""
    order = [(c, "descending" if d else "ascending")
             for c, d in sort_keys]

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        b = _first_n_per_run(b, key, order, n)
        cg = (pd.util.hash_array(
            b[key].combine_chunks().to_numpy(zero_copy_only=False))
            % num_partitions).astype(np.int64)
        return b.append_column("_cg", pa.array(cg, type=pa.int64()))

    def final(g: pa.Table) -> pa.Table:
        return _first_n_per_run(g.drop_columns(["_cg"]), key, order, n)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_cg").map_groups(final, batch_format="pyarrow")


def timeseries(ds: ray.data.Dataset, ts_col: str, unit: str,
               sums: list[str] = ()) -> ray.data.Dataset:
    """``timeseries`` stream: tumbling window aggregates — truncate the
    timestamp inside map_batches, then a grouped aggregate (upstream
    ``SJ/stream/TimeSeriesStream.java`` [U]; fixed offline windows, no
    watermarks — the reference has none either)."""
    def trunc(b: pa.Table) -> pa.Table:
        w = pc.floor_temporal(b[ts_col], unit=unit)
        return b.append_column("window", w)
    aggs = [Count()] + [Sum(c) for c in sums]
    return ds.map_batches(trunc, batch_format="pyarrow") \
             .groupby("window").aggregate(*aggs)


def hist(ds: ray.data.Dataset, col: str, bins: int) -> pa.Table:
    """Solr math ``hist()`` (upstream Solr math expressions, backed by
    commons-math ``EmpiricalDistribution`` [U]): equal-width bins over
    [min, max] with per-bin count and sum. Two streaming passes:
    (1) one distributed min/max aggregate, (2) per-batch vectorized
    ``np.bincount`` partials (bins rows each) summed on the driver —
    output-sized combine, no shuffle. The top edge value lands in the
    last bin (numpy/commons-math closed-top convention); the SQL
    oracle mirrors the exact f64 expression ``(v - lo) / ((hi - lo) /
    bins)`` then floor + clamp."""
    st = ds.aggregate(Min(col), Max(col))
    lo, hi = float(st[f"min({col})"]), float(st[f"max({col})"])
    width = (hi - lo) / bins
    if width == 0.0:
        return pa.table({"bin": pa.array([0], type=pa.int64()),
                         "n": pa.array([ds.count()], type=pa.int64()),
                         "sum_v": pa.array([lo * ds.count()])})

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy().astype(np.float64)
        idx = np.minimum(np.floor((v - lo) / width).astype(np.int64),
                         bins - 1)
        return pa.table({
            "bin": pa.array(np.arange(bins), type=pa.int64()),
            "n": pa.array(np.bincount(idx, minlength=bins)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(idx, weights=v,
                                      minlength=bins))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("bin", as_index=False).sum()
    return pa.table({
        "bin": pa.array(g["bin"].to_numpy(), type=pa.int64()),
        "n": pa.array(g["n"].to_numpy(), type=pa.int64()),
        "sum_v": pa.array(g["s"].to_numpy())})


def timeseries_fill(ds: ray.data.Dataset, ts_col: str, unit: str,
                    sums: list[str] = ()) -> "pa.Table":
    """``timeseries`` with gap filling (upstream
    ``SJ/stream/TimeSeriesStream`` emits EVERY bucket of the
    start/end/gap range, zeroing metrics for empty windows [U]). The
    grouped aggregate runs distributed exactly like
    :func:`timeseries`; densification happens on the driver over the
    AGGREGATED buckets only — output-sized work bounded by
    range/gap, never by the corpus."""
    import pandas as pd

    agg = timeseries(ds, ts_col, unit, list(sums))
    df = agg.to_pandas()
    if not len(df):
        return pa.Table.from_pandas(df, preserve_index=False)
    freq = {"minute": "min", "hour": "h", "day": "D"}[unit]
    full = pd.date_range(df["window"].min(), df["window"].max(),
                         freq=freq)
    df = (df.set_index("window").reindex(full).fillna(0)
          .rename_axis("window").reset_index())
    df["count()"] = df["count()"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


def regress(ds: ray.data.Dataset, x_col: str, y_col: str,
                y_scale: int = 100) -> pa.Table:
    """``regress`` stream evaluator (upstream
    ``solrj/io/eval/RegressionEvaluator.java`` [U] — the BIVARIATE
    slope/intercept fit, distinct from the multivariate ``olsRegress``
    covered by ``ols_regress_lineitem``): least-squares fit
    ``y = slope·x + intercept`` from EXACT integer sufficient
    statistics, so distributed sum order cannot perturb the result:
    ``y`` is fixed-point scaled by ``y_scale`` (the synthetic value
    column carries 2 decimals), per-batch int64 partials
    (n, Σx, Σx², Σy′, Σxy′) stream out of ``map_batches`` (one tiny
    row per batch, no shuffle), the driver folds Python big-ints, and
    slope/intercept each take ONE f64 divide at the end —
    bit-reproducible across batch counts, cluster sizes and retries.
    ``x`` must be integral; y_scale·y must round to an integer."""
    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy().astype(np.int64)
        y = np.round(b[y_col].to_numpy().astype(np.float64)
                     * y_scale).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # Python ints: overflow-proof fold regardless of corpus size
    n = int(parts["n"].sum());  sx = int(parts["sx"].sum())
    sxx = int(parts["sxx"].sum())
    sy = int(parts["sy"].sum()); sxy = int(parts["sxy"].sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope_s = float(num) / float(den)        # scaled-y slope
    intercept_s = float(sy) / float(n) - slope_s * (float(sx) / float(n))
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "slope": pa.array([np.round(slope_s / y_scale, 6)]),
        "intercept": pa.array([np.round(intercept_s / y_scale, 6)])})


def sort_nulls(ds: ray.data.Dataset, col: str, descending: bool = False,
               nulls_last: bool = True) -> ray.data.Dataset:
    """Sort with explicit null placement (the reference's
    ``sortMissingLast`` / ``sortMissingFirst`` field options, upstream
    ``S/schema/FieldType`` [U]). Ray's distributed sort has no null
    placement knob, so a null-flag column is prepended to the sort key
    (flag asc puts nulls last when it equals ``is_null``), then
    dropped — still ONE distributed sort, no extra shuffle."""
    flag_desc = not nulls_last

    def add_flag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__isnull", pc.cast(pc.is_null(b[col]), pa.int8()))

    out = ds.map_batches(add_flag, batch_format="pyarrow") \
        .sort(["__isnull", col], descending=[flag_desc, descending])

    def drop_flag(b: pa.Table) -> pa.Table:
        return b.drop_columns(["__isnull"])
    return out.map_batches(drop_flag, batch_format="pyarrow")


def seeded_sample(ds: ray.data.Dataset, id_col: str, percent: int,
                  seed: str = "s0") -> ray.data.Dataset:
    """``random`` stream, made deterministic (upstream
    ``SJ/stream/RandomStream.java`` [U] — the reference's is seeded by
    request too): keep rows whose md5(seed || id) bucket of 100 falls
    below ``percent``. Stable across retries/partitionings and
    reproducible in SQL (md5 is the shared hash), unlike
    ``ds.random_sample``."""
    import hashlib

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].cast(pa.string()).to_pylist()
        bucket = np.fromiter(
            (int(hashlib.md5((seed + i).encode()).hexdigest()[:8], 16) % 100
             for i in ids),
            dtype=np.int64, count=len(ids))
        return b.filter(pa.array(bucket < percent))
    return ds.map_batches(f, batch_format="pyarrow")


def topic(input_path: str | list[str], checkpoint_path: str):
    """``topic`` stream analog (upstream ``SJ/stream/TopicStream.java``
    [U]): checkpointed incremental consumption. Each call returns a
    Dataset over ONLY the input Parquet files not yet recorded in the
    checkpoint, plus a ``commit()`` callable that atomically advances
    the checkpoint AFTER the caller has durably consumed the batch —
    at-least-once delivery, exactly the reference's
    checkpoint-collection semantics. A crash before ``commit()``
    redelivers. ``daemon`` (the reference's periodic re-run wrapper) is
    an external scheduler concern — call this in a loop.

    File-granular offsets: new data arrives as new immutable Parquet
    files (the landing pattern of every large-scale ingest); 10^12-row
    feeds checkpoint per directory shard the same way."""
    import json

    if isinstance(input_path, str):
        files = sorted(
            os.path.join(input_path, f) for f in os.listdir(input_path)
            if f.endswith(".parquet"))
    else:
        files = sorted(input_path)
    seen: set[str] = set()
    if os.path.exists(checkpoint_path):
        with open(checkpoint_path) as f:
            seen = set(json.load(f)["files"])
    new = [f for f in files if f not in seen]

    def commit() -> None:
        tmp = checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"files": sorted(seen | set(new))}, f)
        os.replace(tmp, checkpoint_path)

    ds = ray.data.read_parquet(new) if new else None
    return ds, new, commit


def range_filter(ds: ray.data.Dataset, col: str, lo=None, hi=None
                 ) -> ray.data.Dataset:
    """PointRangeQuery analog: predicate filter on a metadata column
    (upstream ``L/search/PointRangeQuery.java`` [U]); Parquet row-group
    stats prune at the read when applied via read filters."""
    def f(b: pa.Table) -> pa.Table:
        m = None
        if lo is not None:
            m = pc.greater_equal(b[col], lo)
        if hi is not None:
            m2 = pc.less(b[col], hi)
            m = m2 if m is None else pc.and_(m, m2)
        return b.filter(m) if m is not None else b
    return ds.map_batches(f, batch_format="pyarrow")


def cartesian_product(ds: ray.data.Dataset, list_col: str,
                      val_col: str = "val", pos_col: str = "pos"
                      ) -> ray.data.Dataset:
    """``cartesianProduct`` stream (upstream
    ``SJ/stream/CartesianProductStream.java`` [U]): explode a
    multi-valued (list) column into one row per element, carrying the
    element ordinal (1-based, like SQL ``generate_subscripts``).
    Vectorized: the list column's flattened values + repeated parents
    — no per-row Python."""
    def f(b: pa.Table) -> pa.Table:
        lists = b[list_col].combine_chunks()
        if isinstance(lists, pa.ChunkedArray):
            lists = (lists.chunk(0) if lists.num_chunks
                     else pa.array([], type=lists.type))
        offs = lists.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        parent = np.repeat(np.arange(len(lists)), counts)
        pos = np.concatenate([np.arange(1, c + 1) for c in counts]) \
            if len(counts) else np.empty(0, dtype=np.int64)
        out = b.drop_columns([list_col]).take(pa.array(parent))
        out = out.append_column(pos_col, pa.array(pos, type=pa.int64()))
        return out.append_column(val_col, lists.flatten())
    return ds.map_batches(f, batch_format="pyarrow")


def interval_facet(ds: ray.data.Dataset, col: str,
                   intervals: list[tuple[str, float | None, float | None]]
                   ) -> ray.data.Dataset:
    """``facet.interval`` (upstream ``S/request/IntervalFacets.java``
    [U]): counts for arbitrary, possibly OVERLAPPING ``[lo, hi)``
    intervals (unlike range faceting's disjoint buckets) in ONE pass —
    per-batch partial counts (the combiner), then a tiny grouped sum
    of ``len(intervals)`` keys."""
    def f(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        labels, ns = [], []
        for lab, lo, hi in intervals:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= v >= lo
            if hi is not None:
                m &= v < hi
            labels.append(lab)
            ns.append(int(m.sum()))
        return pa.table({"interval": pa.array(labels),
                         "n": pa.array(ns, type=pa.int64())})
    return ds.map_batches(f, batch_format="pyarrow") \
             .groupby("interval").sum("n")


class DaemonRunner:
    """``daemon`` stream (upstream ``SJ/stream/DaemonStream.java``
    [U]): re-runs an inner stream function on a fixed interval; the
    inner callable owns its sink (the reference wraps an update push).
    Ticks are explicit (``run_once``) or looped (``run``) so tests and
    schedulers drive it without hidden threads; state is the same
    (iterations, last start/stop) the reference reports via its
    daemon-list admin command."""

    def __init__(self, fn, interval_sec: float = 1.0):
        self.fn = fn
        self.interval_sec = interval_sec
        self.iterations = 0
        self.last_result = None

    def run_once(self):
        self.last_result = self.fn()
        self.iterations += 1
        return self.last_result

    def run(self, max_iterations: int, sleep=None):
        import time as _t

        sleep = sleep or _t.sleep
        for i in range(max_iterations):
            self.run_once()
            if i + 1 < max_iterations:
                sleep(self.interval_sec)
        return self.last_result

    # --- wall-clock service mode (the reference daemon's background
    # loop + DaemonStream.shutdown() admin command)

    def start(self):
        """Run ticks on a background thread every ``interval_sec``
        until :meth:`stop` — the long-lived daemon service the
        reference registers under /stream's daemon-list."""
        import threading

        if getattr(self, "_thread", None) and self._thread.is_alive():
            return
        self._stop = threading.Event()

        def loop():
            while not self._stop.is_set():
                self.run_once()
                self._stop.wait(self.interval_sec)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 30.0):
        self._stop.set()
        self._thread.join(timeout)
        return self.iterations


def stratified_sample(ds: ray.data.Dataset, key_col: str, id_col: str,
                      fractions: dict[str, int], default: int = 0,
                      seed: str = "s0") -> ray.data.Dataset:
    """Stratified deterministic sampling — per-stratum keep rates for
    dataset curation (rebalancing sources/languages in a training
    mix). Same md5-bucket mechanism as :func:`seeded_sample` so it is
    retry/partitioning-stable and SQL-reproducible; ``fractions`` maps
    stratum value → percent kept (0-100), others keep ``default``."""
    import hashlib

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].cast(pa.string()).to_pylist()
        bucket = np.fromiter(
            (int(hashlib.md5((seed + i).encode()).hexdigest()[:8], 16)
             % 100 for i in ids),
            dtype=np.int64, count=len(ids))
        keys = b[key_col].to_pylist()
        cut = np.fromiter((fractions.get(k, default) for k in keys),
                          dtype=np.int64, count=len(keys))
        return b.filter(pa.array(bucket < cut))

    return ds.map_batches(f, batch_format="pyarrow")


def sessionize(ds: ray.data.Dataset, user_col: str, ts_col: str,
               tie_col: str, gap_us: int) -> pa.Table:
    """Gap-based sessionization of an event stream — the standard
    behavioral-log primitive (no Solr analog; part of the
    training-pipeline op set): events of one user more than ``gap_us``
    apart start a new session. Returns one row per session:
    ``(user, session_start, session_end, n_events)``.

    Distributed shape: ONE global sort on (user, ts, tie), then the
    two-pass boundary-stitch pattern (as in sequence packing) — pass A
    ships only each sorted block's FIRST/LAST boundary rows to the
    driver (O(blocks)); the driver walks blocks once to resolve each
    block's carry-in session start; pass B emits per-block session
    partials with the carry broadcast, and a final small groupby
    merges sessions that span blocks. No per-group Python anywhere."""
    mat = ds.sort([user_col, ts_col, tie_col]).materialize()
    refs = [r for r in mat.to_arrow_refs()]

    @ray.remote
    def bounds(t: pa.Table):
        if not t.num_rows:
            return None
        u = t[user_col]
        ts = t[ts_col].cast(pa.int64()).to_numpy()
        uu = u.to_numpy(zero_copy_only=False)
        brk = np.empty(t.num_rows, dtype=bool)
        brk[0] = False                     # resolved by the driver
        if t.num_rows > 1:
            brk[1:] = (uu[1:] != uu[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        ib = np.flatnonzero(brk)
        last_break_ts = int(ts[ib[-1]]) if len(ib) else None
        return (uu[0], int(ts[0]), uu[-1], int(ts[-1]), last_break_ts)

    infos = ray.get([bounds.remote(r) for r in refs])

    # driver walk: carry-in session start per block (O(blocks))
    carry_in: list[tuple | None] = []
    prev_last: list[tuple | None] = []
    cu, cs, plu, plt = None, None, None, None   # carry user/start, prev last
    for info in infos:
        carry_in.append((cu, cs))
        prev_last.append((plu, plt))
        if info is None:
            continue
        u0, t0, ul, tl, lb = info
        first_brk = (plu is None or u0 != plu or t0 - plt > gap_us)
        if lb is not None:
            cu, cs = ul, lb
        elif first_brk:
            cu, cs = u0, t0
        # else: carry unchanged (whole block continues prior session)
        plu, plt = ul, tl

    @ray.remote
    def partial(t: pa.Table, carry, prev) -> pa.Table:
        if not t.num_rows:
            return pa.table({user_col: pa.array([], type=pa.string()),
                             "session_start": pa.array([], type=pa.int64()),
                             "session_end": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64())})
        import pandas as pd
        uu = t[user_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy()
        brk = np.empty(t.num_rows, dtype=bool)
        plu, plt = prev
        brk[0] = (plu is None or uu[0] != plu or ts[0] - plt > gap_us)
        if t.num_rows > 1:
            brk[1:] = (uu[1:] != uu[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        # forward-fill session starts; rows before the first break
        # inherit the carried start
        start = np.where(brk, ts, np.int64(0))
        idx = np.maximum.accumulate(np.where(brk, np.arange(len(ts)), -1))
        cu_, cs_ = carry
        st = np.where(idx >= 0, start[np.maximum(idx, 0)],
                      np.int64(cs_ if cs_ is not None else 0))
        df = pd.DataFrame({user_col: uu, "session_start": st, "ts": ts})
        g = df.groupby([user_col, "session_start"], as_index=False).agg(
            session_end=("ts", "max"), n_events=("ts", "size"))
        return pa.Table.from_pandas(g[[user_col, "session_start",
                                       "session_end", "n_events"]],
                                    preserve_index=False)

    parts = ray.get([partial.remote(r, c, p)
                     for r, c, p in zip(refs, carry_in, prev_last)])
    allp = pa.concat_tables([p for p in parts if p.num_rows])
    import pandas as pd
    df = allp.to_pandas().groupby([user_col, "session_start"],
                                  as_index=False).agg(
        session_end=("session_end", "max"), n_events=("n_events", "sum"))
    df = df.sort_values([user_col, "session_start"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def context_windows(ds: ray.data.Dataset, user_col: str, ts_col: str,
                    tie_col: str, val_col: str, w: int) -> pa.Table:
    """Sliding context-window assembly — the training-sample primitive
    that turns an ordered per-entity stream into model contexts (no
    Solr analog; part of the training-pipeline op set): for every row,
    emit the space-joined last ``w`` values of the SAME entity in
    (ts, tie) order, current row last. Rows near an entity's start get
    shorter windows (no padding).

    Distributed shape: ONE global sort on (user, ts, tie), then the
    boundary-carry pattern of :func:`sessionize` — each sorted block
    needs only the previous block's LAST ``w - 1`` rows (O(blocks ×
    w) driver traffic), window assembly inside each block is fully
    vectorized (shifted arrays + ``binary_join_element_wise`` with
    null-skip; entity breaks null out invalid shifts)."""
    mat = ds.sort([user_col, ts_col, tie_col]).materialize()
    refs = list(mat.to_arrow_refs())

    @ray.remote
    def tail(t: pa.Table):
        n = min(w - 1, t.num_rows)
        return t.select([user_col, val_col]).slice(t.num_rows - n, n) \
            if n else None

    tails = ray.get([tail.remote(r) for r in refs])
    # rolling driver-side stitch so carries span SHORT blocks too:
    # the carry into block i is the last w-1 rows of ALL prior blocks
    carries: list[pa.Table | None] = []
    cur: pa.Table | None = None
    for tl in tails:
        carries.append(cur)
        pieces = [x for x in (cur, tl) if x is not None and x.num_rows]
        nxt = pa.concat_tables(pieces) if pieces else None
        if nxt is not None and nxt.num_rows > w - 1:
            nxt = nxt.slice(nxt.num_rows - (w - 1), w - 1)
        cur = nxt

    @ray.remote
    def windows(t: pa.Table, carry) -> pa.Table | None:
        if not t.num_rows:
            return None
        ncarry = carry.num_rows if carry is not None else 0
        m = t.num_rows
        uu = np.concatenate([
            carry[user_col].to_numpy(zero_copy_only=False)
            if ncarry else np.empty(0, object),
            t[user_col].to_numpy(zero_copy_only=False)])
        vv = pa.concat_arrays(
            (list(carry[val_col].chunks) if ncarry else [])
            + list(t[val_col].chunks))
        # shifted columns via take with NULL indices (null index →
        # null value) — NOT via slice + if_else: pyarrow 16's string
        # if_else corrupts data on sliced value buffers
        out_idx = np.arange(ncarry, ncarry + m)
        cols = []
        for j in range(w - 1, -1, -1):       # oldest shift first
            src = out_idx - j
            valid = src >= 0
            valid[valid] &= uu[src[valid]] == uu[out_idx[valid]]
            ia = pc.if_else(pa.array(valid),
                            pa.array(np.where(valid, src, 0),
                                     type=pa.int64()),
                            pa.scalar(None, pa.int64()))
            cols.append(vv.take(ia))
        ctx = pc.binary_join_element_wise(
            *cols, " ", null_handling="skip")
        return pa.table({tie_col: t[tie_col], user_col: t[user_col],
                         "ctx": ctx})

    parts = ray.get([windows.remote(r, c)
                     for r, c in zip(refs, carries)])
    out = pa.concat_tables([p for p in parts if p is not None])
    return out.sort_by(tie_col)


def merge_sorted(streams: list[ray.data.Dataset],
                 sort_keys: list[tuple[str, bool]],
                 k: int | None = None) -> pa.Table:
    """Order-preserving k-way stream merge (upstream
    ``SJ/stream/MergeStream`` [U]: N substreams already sorted by the
    same comparator, merged WITHOUT re-sorting the union).

    Ray Data carries no per-block sort metadata, so "already sorted"
    can't be trusted as a physical property — each substream is
    reduced with the associative per-block partial top-k (``top_k``'s
    shuffle-free shape; the whole stream when ``k`` is None via
    ``sort``), then the ≤N×k head rows are comparator-merged in one
    driver lexsort. With ``k`` set, no stream ships more than k rows
    to the driver and there is NO all-to-all exchange at any point —
    the MergeStream contract (earliest rows by the shared comparator)
    at broadcast cost."""
    sb = [(c, "descending" if d else "ascending") for c, d in sort_keys]
    heads = []
    for s in streams:
        if k is None:
            heads += [t for t in ray.get(
                s.materialize().to_arrow_refs()) if t.num_rows]
        else:
            heads.append(ray.get(
                top_k(s, sort_keys, k).materialize()
                .to_arrow_refs())[0])
    merged = pa.concat_tables(
        [h for h in heads if h.num_rows],
        promote_options="default").combine_chunks().sort_by(sb)
    return merged.slice(0, k) if k is not None else merged
