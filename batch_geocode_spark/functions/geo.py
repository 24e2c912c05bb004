"""Core geodesic + normalization functions, three-way implemented:

1. Spark ``Column`` expressions (JVM-side, whole-stage codegen — the hot path)
2. numpy vectorized (for the pandas test oracle and pandas-UDF kernels)
3. ANSI-SQL string builders (so the DuckDB oracle computes bit-identical values)

Semantics mirror the reference:
- haversine with mean earth radius 6371.0088 km — the default of the
  ``haversine`` package the reference wraps (reference:
  geocode/query_funcs.py:247-252).
- "buffer" = haversine length in km of a bounding box's diagonal
  (reference: geocode/query_funcs.py:272-278).
- ISO2 normalization: keep only length-2 strings, lowercased
  (reference: geocode/query_funcs.py:26-33).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


# ---------------------------------------------------------------- Column API
def haversine_km(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in km as a native Column expression."""
    dlat = F.radians(lat2 - lat1) / 2.0
    dlng = F.radians(lng2 - lng1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlng) * F.sin(dlng)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def bbox_diag_km(min_x: Column, min_y: Column, max_x: Column, max_y: Column) -> Column:
    """The reference's "buffer": km diagonal of a lng/lat bbox
    (reference: geocode/query_funcs.py:272-278; x=lng, y=lat)."""
    return haversine_km(min_y, min_x, max_y, max_x)


def norm_name(c: Column) -> Column:
    """Canonical gazetteer join key: lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def norm_iso2(c: Column) -> Column:
    """reference: geocode/query_funcs.py:26-33 — len==2 → lower, else NULL."""
    return F.when(F.length(c) == 2, F.lower(c))


# ----------------------------------------------------------------- numpy API
def np_haversine_km(lat1, lng1, lat2, lng2):
    lat1, lng1, lat2, lng2 = (np.asarray(v, dtype=np.float64) for v in (lat1, lng1, lat2, lng2))
    dlat = np.radians(lat2 - lat1) / 2.0
    dlng = np.radians(lng2 - lng1) / 2.0
    a = np.sin(dlat) ** 2 + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(dlng) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


# ------------------------------------------------------------ SQL generators
def haversine_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """ANSI SQL equivalent (runs identically in Spark SQL and DuckDB)."""
    return (
        f"(2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lng2}) - ({lng1})) / 2.0), 2))))"
    )
