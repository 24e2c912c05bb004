import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from batch_geocode_spark.functions.geo import (
    EARTH_RADIUS_KM,
    haversine_km,
    haversine_sql,
    norm_iso2,
    norm_name,
    np_haversine_km,
)

lat_st = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False)
lng_st = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False)


def test_known_distance():
    # Paris → London ≈ 343.5 km (published haversine figure)
    d = float(np_haversine_km(48.8566, 2.3522, 51.5074, -0.1278))
    assert abs(d - 343.5) < 1.5


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, lat_st, lng_st)
def test_haversine_properties(lat1, lng1, lat2, lng2):
    d = float(np_haversine_km(lat1, lng1, lat2, lng2))
    assert d >= 0
    assert d <= np.pi * EARTH_RADIUS_KM + 1e-6
    d_rev = float(np_haversine_km(lat2, lng2, lat1, lng1))
    assert abs(d - d_rev) < 1e-9
    assert float(np_haversine_km(lat1, lng1, lat1, lng1)) == 0.0


def test_column_matches_numpy_and_sql(spark):
    rows = [(48.8566, 2.3522, 51.5074, -0.1278), (0.0, 0.0, 0.0, 90.0), (10.0, 10.0, 10.0, 10.0)]
    df = spark.createDataFrame(rows, "lat1 double, lng1 double, lat2 double, lng2 double")
    got = df.select(
        haversine_km(F.col("lat1"), F.col("lng1"), F.col("lat2"), F.col("lng2")).alias("d"),
        F.expr(haversine_sql("lat1", "lng1", "lat2", "lng2")).alias("d_sql"),
    ).collect()
    import duckdb

    for (lat1, lng1, lat2, lng2), r in zip(rows, got):
        want = float(np_haversine_km(lat1, lng1, lat2, lng2))
        assert r["d"] == pytest.approx(want, abs=1e-9)
        assert r["d_sql"] == pytest.approx(want, abs=1e-9)
        duck = duckdb.sql(
            f"SELECT {haversine_sql(str(lat1), str(lng1), str(lat2), str(lng2))} AS d"
        ).fetchone()[0]
        assert duck == pytest.approx(want, abs=1e-9)


def test_norms(spark):
    df = spark.createDataFrame(
        [("  Foo   BAR ", "US"), ("x", "USA"), ("y", None)], "name string, iso string"
    )
    got = df.select(norm_name(F.col("name")).alias("n"), norm_iso2(F.col("iso")).alias("i")).collect()
    assert got[0]["n"] == "foo bar"
    assert got[0]["i"] == "us"
    assert got[1]["i"] is None
    assert got[2]["i"] is None
