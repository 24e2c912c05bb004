import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from batch_geocode_spark import datagen
from batch_geocode_spark.functions.cells import np_cell_encode
from batch_geocode_spark.functions.geo import np_haversine_km
from batch_geocode_spark.operators import geocode as G
from batch_geocode_spark.operators import knn, pip, rollups, tiles


@pytest.fixture(scope="module")
def geo(spark):
    images = datagen.images_to_spark(spark, 300, with_bytes=False)
    gaz = datagen.gazetteer_to_spark(spark)
    vetted, best = G.geocode_images(images, gaz)
    vetted = vetted.cache()
    best = best.cache()
    return images, gaz, vetted, best


# ------------------------------------------------------------------ tiles
def test_cell_density_salted_equals_plain(geo):
    _, _, _, best = geo
    plain = tiles.cell_density(best, res=9).toPandas().sort_values("cell")
    salted = tiles.cell_density(best, res=9, salt_buckets=8, distinct_col="image_id")
    salted = salted.toPandas().sort_values("cell")
    assert plain["cell"].tolist() == salted["cell"].tolist()
    assert plain["n_images"].tolist() == salted["n_images"].tolist()


def test_raster_tiles(geo):
    _, _, _, best = geo
    density = tiles.cell_density(best, res=9)
    rast = tiles.assemble_raster_tiles(density, res=9, tile_res=6).toPandas()
    assert (rast["tile_px"] == 8).all()
    assert all(len(r) == 64 for r in rast["raster"])
    # mass conservation: raster sums equal density sums
    assert rast["n_images"].sum() == density.toPandas()["n_images"].sum()
    assert all(sum(r) == n for r, n in zip(rast["raster"], rast["n_images"]))


def test_density_rollup_conserves_mass(geo):
    _, _, _, best = geo
    density = tiles.cell_density(best, res=9)
    rolled = rollups.density_rollup(density, res=9, parent_res=4).toPandas()
    assert rolled["n_images"].sum() == density.toPandas()["n_images"].sum()


# -------------------------------------------------------------------- PIP
def test_pip_join_matches_bbox_oracle(spark, geo):
    _, _, _, best = geo
    polys = datagen.admin_polygons_to_spark(spark)
    got = (
        pip.pip_join(best, polys, res=6)
        .toPandas()
        .sort_values(["pt_id", "admin_id"])
        .reset_index(drop=True)
    )
    # oracle: rectangles → bbox containment with the same half-open edges
    bp = best.toPandas()
    pp = datagen.make_admin_polygons()
    rows = []
    for b in bp.itertuples():
        for p in pp.itertuples():
            if (p.bb_w <= b.best_long < p.bb_e) and (p.bb_s <= b.best_lat < p.bb_n):
                rows.append((b.image_id, p.admin_id))
    want = pd.DataFrame(rows, columns=["pt_id", "admin_id"]).sort_values(
        ["pt_id", "admin_id"]
    ).reset_index(drop=True)
    got_pairs = got[["pt_id", "admin_id"]].reset_index(drop=True)
    assert got_pairs.equals(want)
    # every matched point lands in exactly one level-0 and one level-1 polygon
    lvl = got.groupby(["pt_id", "admin_id"]).size()
    assert (lvl == 1).all()


def test_pip_ray_casting_concave():
    # concave "L" polygon with a hole — beyond what rectangles exercise
    outer = [(0, 0), (4, 0), (4, 4), (2, 4), (2, 2), (0, 2), (0, 0)]
    hole = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]
    rings = [
        [{"x": float(x), "y": float(y)} for x, y in outer],
        [{"x": float(x), "y": float(y)} for x, y in hole],
    ]
    px = np.array([1.0, 3.0, 3.0, 1.0, 5.0, 2.5])
    py = np.array([1.0, 1.0, 3.0, 3.0, 1.0, 2.5])
    got = pip._points_in_rings(px, py, rings)
    # (1,1) in hole; (3,1) inside; (3,3) inside upper arm; (1,3) in the
    # notch (outside); (5,1) outside; (2.5,2.5) inside
    assert got.tolist() == [False, True, True, False, False, True]


def test_admin_rollup(spark, geo):
    _, _, _, best = geo
    polys = datagen.admin_polygons_to_spark(spark)
    matches = pip.pip_join(best, polys, res=6)
    rolled = rollups.admin_rollup(matches).toPandas()
    assert rolled["n_points"].sum() == matches.count()


# -------------------------------------------------------------------- kNN
def test_knn_within_image_matches_bruteforce(geo):
    _, _, vetted, best = geo
    got = knn.knn_within_image(vetted, k=3).toPandas()
    vp = vetted.toPandas()
    bp = best.toPandas().set_index("image_id")
    for img, grp in got.groupby("image_id"):
        cands = vp[vp.image_id == img]
        b = bp.loc[img]
        d = np_haversine_km(cands.cand_lat, cands.cand_lng, b.best_lat, b.best_long)
        want = np.sort(d)[: len(grp)]
        np.testing.assert_allclose(np.sort(grp["dist_km"].to_numpy()), want, atol=1e-9)
    assert (got.groupby("image_id").size() <= 3).all()


def test_knn_spatial_exact_within_ring(spark, geo):
    _, gaz, _, best = geo
    got = knn.knn_spatial(best.limit(50), gaz, k=3, res=6).toPandas()
    bp = best.limit(50).toPandas()
    gp = gaz.toPandas()
    for img, grp in got.groupby("query_id"):
        b = bp[bp.image_id == img].iloc[0]
        d = np_haversine_km(gp.lat, gp.lng, b.best_lat, b.best_long)
        # brute-force k nearest; engine is exact when kth nbr is inside the ring
        kth = np.sort(d)[min(2, len(d) - 1)]
        cell_width_km = 40075.0 / (2**6)
        if kth < cell_width_km / 2:
            np.testing.assert_allclose(
                np.sort(grp["dist_km"].to_numpy()), np.sort(d)[: len(grp)], atol=1e-9
            )


def test_match_rate_by_source(geo):
    images, _, vetted, _ = geo
    mr = rollups.match_rate_by_source(images, vetted).toPandas()
    assert set(mr["source"]) <= {"GM", "OSM", "GN", "FG"}
    assert ((mr["match_rate"] > 0) & (mr["match_rate"] <= 1)).all()


def test_raster_tiles_as_blobs_decode_exact(spark):
    """raster↔vector loop: the PGM16 blob decodes back to the exact
    per-tile count grid produced by assemble_raster_tiles."""
    import numpy as np

    from batch_geocode_spark import datagen
    from batch_geocode_spark.codecs import decode_pgm16
    from batch_geocode_spark.operators import geocode as G
    from batch_geocode_spark.operators import tiles as T

    images = datagen.images_to_spark(spark, 300, with_bytes=False)
    gaz = datagen.gazetteer_to_spark(spark)
    _, best = G.geocode_images(images, gaz)
    density = T.cell_density(best, res=9)
    tiles = T.assemble_raster_tiles(density, res=9, tile_res=6)
    blobs = T.raster_tiles_as_blobs(tiles).toPandas().set_index("tile")
    want = tiles.toPandas().set_index("tile")
    assert len(blobs) == len(want) > 0
    for tile, r in want.iterrows():
        px = int(r["tile_px"])
        grid = np.asarray(r["raster"], dtype=np.int64).reshape(px, px)
        dec = decode_pgm16(bytes(blobs.loc[tile, "blob"]))
        assert (dec == grid).all()
        assert blobs.loc[tile, "fmt"] == "pgm16"
        assert int(blobs.loc[tile, "n_images"]) == int(grid.sum())


def test_raster_blobs_to_cells_roundtrip(geo):
    """Full raster↔vector loop: density → raster tiles → PGM16 blobs →
    raster_blobs_to_cells reproduces the original (cell, n_images)
    table exactly, with the fine resolution recovered from the tile id
    + grid size alone (no parameters)."""
    _, _, _, best = geo
    density = tiles.cell_density(best, res=9)
    rast = tiles.assemble_raster_tiles(density, res=9, tile_res=5)
    blobs = tiles.raster_tiles_as_blobs(rast)
    back = tiles.raster_blobs_to_cells(blobs).toPandas().sort_values("cell")
    want = density.toPandas().sort_values("cell")
    assert back["cell"].tolist() == want["cell"].tolist()
    assert back["n_images"].tolist() == want["n_images"].tolist()


def test_polygonize_cells(spark):
    """Hand-built res-3 density grid: an L-shaped 3-cell region, a
    2-cell vertical bar, an isolated singleton, and a below-threshold
    cell that must vanish. Labels = min cell id per region."""
    res, n = 3, 8
    enc = lambda x, y: res * (2**58) + y * (2**29) + x  # noqa: E731
    rows = [
        # L-shape: (1,1), (2,1), (2,2)
        (enc(1, 1), 5), (enc(2, 1), 3), (enc(2, 2), 2),
        # vertical bar: (5, 4), (5, 5)
        (enc(5, 4), 2), (enc(5, 5), 7),
        # isolated singleton
        (enc(7, 7), 9),
        # below threshold -> dropped
        (enc(0, 5), 1),
    ]
    dens = spark.createDataFrame(rows, "cell long, n_images long")
    got = (
        tiles.polygonize_cells(dens, res=res, threshold=2)
        .toPandas()
        .sort_values("region")
        .reset_index(drop=True)
    )
    assert len(got) == 3
    l_shape = got[got.region == enc(1, 1)].iloc[0]
    assert l_shape["n_cells"] == 3 and l_shape["n_images"] == 10
    # bbox spans cells x in [1,2], y in [1,2] at res 3 (45-degree cells)
    assert l_shape["bb_w"] == pytest.approx(1 / n * 360 - 180)
    assert l_shape["bb_e"] == pytest.approx(3 / n * 360 - 180)
    bar = got[got.region == enc(5, 4)].iloc[0]
    assert bar["n_cells"] == 2 and bar["n_images"] == 9
    single = got[got.region == enc(7, 7)].iloc[0]
    assert single["n_cells"] == 1 and single["n_images"] == 9


def test_polygonize_antimeridian_wrap(spark):
    """East neighbor wraps at x = 2^res - 1: cells (7, 3) and (0, 3) at
    res 3 are 4-connected across the antimeridian."""
    res = 3
    enc = lambda x, y: res * (2**58) + y * (2**29) + x  # noqa: E731
    dens = spark.createDataFrame(
        [(enc(7, 3), 2), (enc(0, 3), 2)], "cell long, n_images long"
    )
    got = tiles.polygonize_cells(dens, res=res, threshold=2).toPandas()
    assert len(got) == 1
    assert got.iloc[0]["n_cells"] == 2
    # wrap-aware bbox (RFC 7946): interval crosses ±180 with
    # bb_w > bb_e and width = 2 cells (90° at res 3), not world-span
    r = got.iloc[0]
    assert r["bb_w"] == pytest.approx(7 / 8 * 360 - 180)  # 135
    assert r["bb_e"] == pytest.approx(1 / 8 * 360 - 180)  # -135
    width = (r["bb_e"] - r["bb_w"]) % 360
    assert width == pytest.approx(90.0)


def test_polygonize_full_ring_bbox(spark):
    """A region covering every x column at its latitude is a full ring:
    reported as the canonical [-180, 180] interval."""
    res, n = 3, 8
    enc = lambda x, y: res * (2**58) + y * (2**29) + x  # noqa: E731
    dens = spark.createDataFrame(
        [(enc(x, 2), 2) for x in range(n)], "cell long, n_images long"
    )
    got = tiles.polygonize_cells(dens, res=res, threshold=2).toPandas()
    assert len(got) == 1
    assert got.iloc[0]["bb_w"] == -180.0 and got.iloc[0]["bb_e"] == 180.0


def test_zonal_stats(geo, spark):
    """Zonal stats over cell centers: per-zone cell counts and mass sum
    to the density cells whose centers fall in some zone; one world-box
    polygon captures every cell."""
    _, _, _, best = geo
    density = tiles.cell_density(best, res=9)
    world = spark.createDataFrame(
        [(0, "c0", 0, "WORLD", -180.0, 180.0, -90.0, 90.0)],
        "admin_id long, iso2 string, admin_level int, name string, "
        "bb_w double, bb_e double, bb_s double, bb_n double",
    ).withColumn(
        "rings",
        F.array(
            F.array(
                F.struct(F.col("bb_w").alias("x"), F.col("bb_s").alias("y")),
                F.struct(F.col("bb_e").alias("x"), F.col("bb_s").alias("y")),
                F.struct(F.col("bb_e").alias("x"), F.col("bb_n").alias("y")),
                F.struct(F.col("bb_w").alias("x"), F.col("bb_n").alias("y")),
                F.struct(F.col("bb_w").alias("x"), F.col("bb_s").alias("y")),
            )
        ),
    )
    got = rollups.zonal_stats(density, world, res=9).toPandas()
    dp = density.toPandas()
    assert len(got) == 1
    assert int(got.iloc[0]["n_cells"]) == len(dp)
    assert int(got.iloc[0]["n_images"]) == int(dp["n_images"].sum())
    # cell ids self-describe their resolution: a density table built at
    # a different res than the caller's must fail loudly, not decode
    # wrong centers silently
    with pytest.raises(Exception, match="resolution"):
        rollups.zonal_stats(density, world, res=8).toPandas()


def test_pip_high_vertex_polygon_chunked(spark):
    """A 10^4-vertex ring exercises the chunked ray-cast fallback; the
    regular N-gon is near-circular, so radius comparison with an
    apothem margin is an analytic oracle."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from batch_geocode_spark.operators import pip as PIP

    n_vert, R = 10_000, 10.0
    cx, cy = 20.0, 10.0
    ang = np.linspace(0, 2 * math.pi, n_vert + 1)
    ring = [
        {"x": float(cx + R * math.cos(a)), "y": float(cy + R * math.sin(a))}
        for a in ang
    ]
    polys = spark.createDataFrame(
        [(1, "cx", 0, "bigpoly", cx - R, cy - R, cx + R, cy + R, [ring])],
        "admin_id long, iso2 string, admin_level int, name string, "
        "bb_w double, bb_s double, bb_e double, bb_n double, "
        "rings array<array<struct<x:double,y:double>>>",
    )
    rng = np.random.default_rng(5)
    apothem = R * math.cos(math.pi / n_vert)
    pts = []
    want_in = set()
    for i in range(500):
        r = rng.uniform(0, 1.5 * R)
        a = rng.uniform(0, 2 * math.pi)
        x, y = cx + r * math.cos(a), cy + r * math.sin(a)
        if abs(r - R) < 1e-3:  # skip the boundary sliver
            continue
        pts.append((f"p{i}", float(y), float(x)))
        if r < apothem:
            want_in.add(f"p{i}")
        elif r < R:
            continue  # between apothem and circumradius: either is fine
    points = spark.createDataFrame(pts, "image_id string, best_lat double, best_long double")
    got = {
        r["pt_id"]
        for r in PIP.pip_join(points, polys, res=3).select("pt_id").collect()
    }
    # every analytic-inside point found; no analytic-outside point kept
    outside = {p for (p, y, x) in pts} - want_in - {
        f"p{i}" for i in range(500)
    }.union(set())
    assert want_in <= got
    definite_out = {
        p for (p, y, x) in pts
        if (x - cx) ** 2 + (y - cy) ** 2 > (R * 1.0001) ** 2
    }
    assert not (got & definite_out)
