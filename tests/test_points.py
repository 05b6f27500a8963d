"""Points / BKD-tree analog: correctness vs numpy + pruning evidence."""
import numpy as np
import pyarrow as pa
import ray

from engine import points as pts


def _build(tmp_path, vals, leaf_rows=64):
    ids = np.arange(len(vals), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "v": pa.array(vals, type=pa.int64())}))
    out = str(tmp_path / "pts")
    pts.build_points(ds, "v", "id", out, leaf_rows=leaf_rows)
    return out, ids, np.asarray(vals, dtype=np.int64)


def test_range_agg_matches_numpy(tmp_path):
    rng = np.random.RandomState(7)
    vals = rng.randint(-1000, 1000, size=1777)
    out, ids, v = _build(tmp_path, vals)
    for lo, hi in [(-2000, 2000), (0, 1), (-50, 450), (999, 1000),
                   (-1000, -999), (500, 400), (None, 0), (0, None),
                   (None, None)]:
        r = pts.range_agg(out, lo, hi)
        lo_v = -(1 << 62) if lo is None else lo
        hi_v = (1 << 62) if hi is None else hi
        m = (v >= lo_v) & (v < hi_v)
        assert r["count"] == int(m.sum()), (lo, hi)
        assert r["sum"] == int(v[m].sum()), (lo, hi)
        got = pts.range_ids(out, lo, hi)
        assert np.array_equal(got, np.sort(ids[m])), (lo, hi)


def test_inside_leaves_not_decoded(tmp_path):
    # distinct values => a contiguous range crosses at most 2 leaves
    vals = np.arange(4096, dtype=np.int64)
    np.random.RandomState(3).shuffle(vals)
    out, _, v = _build(tmp_path, vals, leaf_rows=64)
    r = pts.range_agg(out, 100, 3900)
    assert r["total_leaves"] == 64
    assert r["decoded_leaves"] <= 2
    assert r["inside_leaves"] >= 57
    assert r["count"] == 3800 and r["sum"] == int(np.arange(100, 3900).sum())


def test_duplicate_heavy_values(tmp_path):
    # one hot value spanning many leaves: INSIDE classification still
    # answers them without decode (min == max == hot)
    vals = np.concatenate([np.full(1000, 5, dtype=np.int64),
                           np.arange(200, dtype=np.int64)])
    out, _, v = _build(tmp_path, vals, leaf_rows=64)
    r = pts.range_agg(out, 5, 6)
    assert r["count"] == 1001
    assert r["sum"] == 5 * 1001
    assert r["inside_leaves"] > 10        # the hot-value leaves


def test_build_is_resumable(tmp_path):
    vals = np.arange(100, dtype=np.int64)
    out, _, _ = _build(tmp_path, vals, leaf_rows=16)
    # second call is a no-op (directory exists)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(np.zeros(1, dtype=np.int64)),
        "v": pa.array([123], type=pa.int64())}))
    pts.build_points(ds, "v", "id", out, leaf_rows=16)
    r = pts.range_agg(out, None, None)
    assert r["count"] == 100


def _build_2d(tmp_path, lat, lon, leaf_rows=64):
    ids = np.arange(len(lat), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids),
        "lat": pa.array(lat, type=pa.float64()),
        "lon": pa.array(lon, type=pa.float64())}))
    out = str(tmp_path / "pts2d")
    pts.build_points_2d(ds, "lat", "lon", "id", out, leaf_rows=leaf_rows)
    return out, ids


def test_spread32_matches_bit_loop():
    rng = np.random.RandomState(11)
    xs = rng.randint(0, 1 << 32, size=200, dtype=np.uint64)
    got = pts._spread32(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        want = 0
        for b in range(32):
            want |= ((x >> b) & 1) << (2 * b)
        assert g == want


def test_bbox_matches_numpy(tmp_path):
    rng = np.random.RandomState(4)
    lat = rng.uniform(-85, 85, size=2500)
    lon = rng.uniform(-180, 180, size=2500)
    out, ids = _build_2d(tmp_path, lat, lon)
    qla = np.floor(lat * 1e7)
    qlo = np.floor(lon * 1e7)
    for box in [(-90, 90, -180, 180), (0, 30, -60, 10),
                (-85, -80, 100, 180), (50, 50.001, 0, 0.001),
                (10, 5, 0, 100)]:
        la0, la1, lo0, lo1 = box
        m = ((qla >= np.floor(la0 * 1e7)) & (qla <= np.floor(la1 * 1e7))
             & (qlo >= np.floor(lo0 * 1e7)) & (qlo <= np.floor(lo1 * 1e7)))
        r = pts.bbox_ids(out, la0, la1, lo0, lo1)
        assert r["count"] == int(m.sum()), box
        assert np.array_equal(r["ids"], np.sort(ids[m])), box
        assert pts.bbox_agg(out, la0, la1, lo0, lo1)["count"] == r["count"]


def test_bbox_zorder_prunes(tmp_path):
    # uniform cloud, small query box: Z-order locality means most
    # leaves are OUTSIDE (zero I/O), only boundary leaves decode
    rng = np.random.RandomState(9)
    lat = rng.uniform(-85, 85, size=8192)
    lon = rng.uniform(-180, 180, size=8192)
    out, _ = _build_2d(tmp_path, lat, lon, leaf_rows=64)
    r = pts.bbox_agg(out, 10.0, 30.0, -50.0, -20.0)
    assert r["total_leaves"] == 128
    touched = r["decoded_leaves"] + r["inside_leaves"]
    assert touched < r["total_leaves"] // 2, r
    assert r["count"] > 0


def test_distance_matches_brute(tmp_path):
    from engine.ops.spatial import haversine_km, quantize_km
    rng = np.random.RandomState(6)
    lat = rng.uniform(-85, 85, size=3000)
    lon = rng.uniform(-180, 180, size=3000)
    out, ids = _build_2d(tmp_path, lat, lon)
    lat_g = np.floor(lat * 1e7) / 1e7
    lon_g = np.floor(lon * 1e7) / 1e7
    for clat, clon, rad in [(35.0, -97.5, 2000.0), (0.0, 0.0, 500.0),
                            (80.0, 10.0, 3000.0),      # pole in box
                            (10.0, 179.0, 1000.0),     # antimeridian
                            (-40.0, 60.0, 50.0)]:
        r = pts.distance_ids(out, clat, clon, rad)
        dk = quantize_km(haversine_km(clat, clon, lat_g, lon_g))
        m = dk <= rad
        assert r["count"] == int(m.sum()), (clat, clon, rad)
        order = np.lexsort((ids[m], dk[m]))
        assert np.array_equal(r["ids"], ids[m][order]), (clat, clon, rad)
        assert np.array_equal(r["dist_km"], dk[m][order])
    # pruning evidence on the small-radius query
    r = pts.distance_ids(out, -40.0, 60.0, 50.0)
    assert r["decoded_leaves"] < r["total_leaves"] // 4, r


def test_nearest_matches_brute(tmp_path):
    from engine.ops.spatial import haversine_km, quantize_km
    rng = np.random.RandomState(12)
    lat = rng.uniform(-85, 85, size=3000)
    lon = rng.uniform(-180, 180, size=3000)
    out, ids = _build_2d(tmp_path, lat, lon)
    lat_g = np.floor(lat * 1e7) / 1e7
    lon_g = np.floor(lon * 1e7) / 1e7
    for clat, clon, k in [(35.0, -97.5, 10), (0.0, 0.0, 1),
                          (80.0, 10.0, 25),          # near pole
                          (10.0, 179.9, 10),         # antimeridian
                          (-40.0, 60.0, 3000)]:      # k == n
        r = pts.nearest_ids(out, clat, clon, k)
        dk = quantize_km(haversine_km(clat, clon, lat_g, lon_g))
        order = np.lexsort((ids, dk))[:k]
        assert np.array_equal(r["ids"], ids[order]), (clat, clon, k)
        assert np.array_equal(r["dist_km"], dk[order]), (clat, clon, k)
    # best-first pruning evidence on a small k
    r = pts.nearest_ids(out, -40.0, 60.0, 5)
    assert r["decoded_leaves"] < r["total_leaves"] // 2, r


def test_build_2d_is_resumable(tmp_path):
    lat = np.linspace(-80, 80, 300)
    lon = np.linspace(-170, 170, 300)
    out, _ = _build_2d(tmp_path, lat, lon, leaf_rows=32)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([0], type=pa.int64()),
        "lat": pa.array([1.0]), "lon": pa.array([1.0])}))
    pts.build_points_2d(ds, "lat", "lon", "id", out, leaf_rows=32)
    assert pts.bbox_agg(out, -90, 90, -180, 180)["count"] == 300


def test_range_facet_matches_numpy(tmp_path):
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 10_000, size=3000)
    out, _, v = _build(tmp_path, vals, leaf_rows=128)
    rows = pts.range_facet(out, 0, 10_000, 8)
    width = (10_000 + 7) // 8
    want = np.bincount(v // width, minlength=8)[:8]
    got = np.array([r["n"] for r in rows])
    assert np.array_equal(got, want)
    assert rows[0]["decoded_leaves"] < 24   # most leaves undecoded
    # partial window
    rows = pts.range_facet(out, 2_000, 6_000, 4)
    m = (v >= 2_000) & (v < 6_000)
    want = np.bincount((v[m] - 2_000) // 1_000, minlength=4)[:4]
    assert np.array_equal(np.array([r["n"] for r in rows]), want)
