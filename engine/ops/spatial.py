"""Spatial search ops (upstream Solr spatial: ``LatLonPointSpatialField``,
``geodist()`` function query, ``{!geofilt}`` [U]).

Haversine great-circle distance as a vectorized numpy kernel inside
``map_batches`` — no spatial index: at Parquet scale the row-group
min/max stats on lat/lon columns are the pruning story (a bounding-box
pre-filter is cheap SQL/compute both sides), and the exact distance
filter runs only on survivors. Distances are quantized with
``floor(d*1000 + 0.5)/1000`` (km, 3 decimals) so the engine and a SQL
oracle agree bit-for-bit despite libm sin/cos ulp differences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: float, lon1: float,
                 lat2: np.ndarray, lon2: np.ndarray) -> np.ndarray:
    """Vectorized haversine distance (km, f64) from one point to many."""
    p1, l1 = np.radians(lat1), np.radians(lon1)
    p2, l2 = np.radians(lat2), np.radians(lon2)
    a = (np.sin((p2 - p1) / 2.0) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin((l2 - l1) / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def quantize_km(d: np.ndarray, decimals: int = 3) -> np.ndarray:
    """floor(d*10^k + 0.5)/10^k — half-up, matching SQL FLOOR exactly
    (np.round is half-to-even; SQL ROUND is half-away — use neither)."""
    scale = 10.0 ** decimals
    return np.floor(d * scale + 0.5) / scale


def geofilt(ds: ray.data.Dataset, lat_col: str, lon_col: str,
            center: tuple[float, float], radius_km: float,
            dist_col: str = "dist_km") -> ray.data.Dataset:
    """``{!geofilt}`` + ``geodist()`` sort field: append the quantized
    distance from ``center`` and keep rows within ``radius_km``.
    Embarrassingly parallel map — the sort/top-k that usually follows
    is the caller's (`top_k`) step."""
    clat, clon = center

    def f(b: pa.Table) -> pa.Table:
        lat = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        d = quantize_km(haversine_km(clat, clon, lat, lon))
        b = b.append_column(dist_col, pa.array(d, type=pa.float64()))
        return b.filter(pa.array(d <= radius_km))

    return ds.map_batches(f, batch_format="pyarrow")
