"""Weighted-site DBSCAN (operators/cluster.py): hand-built fixture
exercising every role (core / border / noise), singleton-core clusters,
the antimeridian ring wrap, and the no-cartesian plan shape."""

import pytest
from pyspark.sql import functions as F

from batch_geocode_spark.operators import cluster as C

# res 4 → lat cell extent ~1250 km, lng cell 22.5°; eps 300 km fits
RES, EPS, MIN_PTS = 4, 300.0, 4


@pytest.fixture(scope="module")
def fixture_points(spark):
    # (pt_id, lat, lng) — co-located points share coordinates exactly
    rows = []

    def site(pt0, n, lat, lng):
        rows.extend((pt0 + i, lat, lng) for i in range(n))

    site(100, 3, 0.0, 0.0)  # a1: w=3, core (mass 5 with a2)
    site(200, 2, 0.0, 1.0)  # a2: w=2, 111 km from a1 → core
    site(10, 1, 0.0, 3.0)  # b1: w=1, 222 km from a2 (334 km from a1,
    #                          outside eps), mass 3 → border
    site(300, 1, 10.0, 10.0)  # n1: isolated, mass 1 → noise
    site(400, 3, 0.0, 179.9)  # c1 ┐ antimeridian pair, 22 km apart,
    site(500, 3, 0.0, -179.9)  # c2 ┘ adjacent only via the x wrap
    site(600, 5, -30.0, -30.0)  # d1: w=5 alone → singleton core
    return spark.createDataFrame(rows, "pt_id long, lat double, lng double")


@pytest.fixture(scope="module")
def assigned(fixture_points):
    return C.spatial_clusters(
        fixture_points, eps_km=EPS, min_pts=MIN_PTS, res=RES
    ).toPandas()


def test_weighted_sites(fixture_points):
    sites = C.weighted_sites(fixture_points).toPandas()
    assert len(sites) == 7
    by_id = sites.set_index("site_id")
    assert by_id.loc[100, "w"] == 3  # min pt_id at the coordinate
    assert by_id.loc[600, "w"] == 5


def test_roles(assigned):
    by_id = assigned.set_index("site_id")
    assert bool(by_id.loc[100, "is_core"]) and bool(by_id.loc[200, "is_core"])
    assert not bool(by_id.loc[10, "is_core"])  # border: mass 3 < 4
    assert 300 not in by_id.index  # noise dropped
    assert bool(by_id.loc[400, "is_core"]) and bool(by_id.loc[500, "is_core"])
    assert bool(by_id.loc[600, "is_core"])  # singleton core kept


def test_cluster_labels(assigned):
    by_id = assigned.set_index("site_id")["cluster"]
    # label = min CORE site id — the border site's smaller id (10) must
    # NOT become the label
    assert by_id[100] == 100 and by_id[200] == 100 and by_id[10] == 100
    assert by_id[400] == 400 and by_id[500] == 400  # wrap-linked pair
    assert by_id[600] == 600  # singleton


def test_summary(assigned, spark):
    sdf = spark.createDataFrame(assigned)
    summ = C.cluster_summary(sdf).toPandas().set_index("cluster")
    assert summ.loc[100, "n_points"] == 6  # 3 + 2 + 1 border
    assert summ.loc[100, "n_sites"] == 3
    assert summ.loc[100, "n_core_sites"] == 2
    assert summ.loc[400, "n_points"] == 6
    assert summ.loc[600, "n_points"] == 5
    # weighted centroid of cluster 100: lats all 0, lngs (0*3+1*2+2.5)/6
    assert summ.loc[100, "centroid_lat"] == 0.0
    assert summ.loc[100, "centroid_lng"] == round(5.0 / 6, 6)


def test_summary_antimeridian_centroid(assigned, spark):
    """The wrap-spanning cluster {+179.9, -179.9} (equal weights) must
    centre at ±180 via largest-gap rotation, not the misleading ~0 a
    plain longitude mean produces; non-wrap clusters keep the plain
    weighted mean exactly."""
    sdf = spark.createDataFrame(assigned)
    summ = C.cluster_summary(sdf).toPandas().set_index("cluster")
    assert abs(abs(summ.loc[400, "centroid_lng"]) - 180.0) < 1e-6
    assert summ.loc[400, "centroid_lat"] == 0.0
    # singleton cluster: centroid is the site itself
    assert summ.loc[600, "centroid_lng"] == -30.0


def test_no_cartesian_plan(fixture_points):
    plan = C.spatial_clusters(
        fixture_points, eps_km=EPS, min_pts=MIN_PTS, res=RES
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_res_guard(fixture_points):
    with pytest.raises(ValueError):
        C.eps_site_pairs(C.weighted_sites(fixture_points), 100.0, res=1)


def test_cluster_hulls_known_shapes(spark):
    """Square + interior point → 4-vertex CCW ring from the
    lexicographic (lng, lat) minimum; 2-site and 1-site clusters
    degrade to 2- and 1-vertex outlines."""
    rows = [
        # (cluster, lat, lng, w, is_core) — square with center
        (1, 0.0, 0.0), (1, 0.0, 1.0), (1, 1.0, 0.0), (1, 1.0, 1.0),
        (1, 0.5, 0.5),
        (2, 5.0, 5.0), (2, 5.0, 6.0),
        (3, 7.0, -9.0),
    ]
    sdf = spark.createDataFrame(
        [(c, lat, lng, 1, True) for (c, lat, lng) in rows],
        "cluster long, lat double, lng double, w long, is_core boolean",
    )
    got = (
        C.cluster_hulls(sdf)
        .toPandas()
        .sort_values(["cluster", "hull_idx"])
        .reset_index(drop=True)
    )
    sq = got[got["cluster"] == 1]
    # interior point dropped; CCW from (lng=0, lat=0): east along the
    # lower chain, then back west along the upper chain
    assert list(zip(sq["lng"], sq["lat"])) == [
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)
    ]
    assert set(sq["n_vertices"]) == {4}
    pair = got[got["cluster"] == 2]
    assert list(zip(pair["lng"], pair["lat"])) == [(5.0, 5.0), (6.0, 5.0)]
    single = got[got["cluster"] == 3]
    assert list(zip(single["lng"], single["lat"])) == [(-9.0, 7.0)]
    assert list(single["n_vertices"]) == [1]


@pytest.mark.parametrize("seed", range(3))
def test_hull_ring_property_vs_reference(seed):
    """Property test (pure Python, no Spark): the monotone-chain ring
    must (a) contain exactly the strict extreme points — every input
    point must be inside-or-on the hull, every ring vertex must NOT be
    expressible as interior to the others — and (b) walk CCW (shoelace
    area > 0 for non-degenerate hulls). Uses hypothesis if available,
    else a seeded random sweep."""
    import random

    from batch_geocode_spark.operators.cluster import hull_ring

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def inside_or_on(ring, p):
        # p is inside-or-on a CCW convex ring iff it is left-of-or-on
        # every directed edge
        m = len(ring)
        return all(
            cross(ring[i], ring[(i + 1) % m], p) >= -1e-9 for i in range(m)
        )

    rng = random.Random(seed)
    for trial in range(60):
        n = rng.randint(1, 25)
        # grid-snapped coordinates generate plenty of collinear and
        # duplicate degeneracies
        pts = [(rng.randint(-5, 5) * 1.0, rng.randint(-5, 5) * 1.0) for _ in range(n)]
        ring = hull_ring(pts)
        distinct = sorted(set(pts))
        assert set(ring) <= set(distinct)
        if len(ring) >= 3:
            # CCW orientation: positive shoelace area
            area = sum(
                ring[i][0] * ring[(i + 1) % len(ring)][1]
                - ring[(i + 1) % len(ring)][0] * ring[i][1]
                for i in range(len(ring))
            )
            assert area > 0, (pts, ring)
            # every input point is inside-or-on
            for p in distinct:
                assert inside_or_on(ring, p), (p, ring)
            # strictness: no three consecutive ring vertices are
            # collinear (edge-interior points must have been dropped)
            for i in range(len(ring)):
                a, b, c = ring[i - 1], ring[i], ring[(i + 1) % len(ring)]
                assert cross(a, b, c) != 0, (pts, ring)
        elif len(ring) == 2:
            a, b = ring
            assert all(cross(a, b, p) == 0 for p in distinct) or len(distinct) == 2
        else:
            assert len(distinct) == 1 and ring == distinct


def test_hull_metrics_known_square(spark, sf_dir):
    """g20 composition on a known unit square: shoelace area 1 deg²,
    perimeter = the four haversine edge lengths."""
    from batch_geocode_spark import entry_queries as EQ
    from batch_geocode_spark.functions.geo import np_haversine_km

    # monkeypatch the g19 stage with a fixed ring: unit square at the
    # equator, CCW from (0, 0)
    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]  # (lng, lat)
    hulls = spark.createDataFrame(
        [("c1", i, lat, lng, 4) for i, (lng, lat) in enumerate(ring)],
        "cluster string, hull_idx int, lat double, lng double, n_vertices int",
    )
    orig = EQ.g19_cluster_hulls
    EQ.g19_cluster_hulls = lambda s, d: hulls
    try:
        got = EQ.g20_hull_metrics(spark, sf_dir).toPandas()
    finally:
        EQ.g19_cluster_hulls = orig
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_vertices"] == 4
    assert abs(row["hull_area_deg2"] - 1.0) < 1e-9
    expect = sum(
        float(np_haversine_km(a[1], a[0], b[1], b[0]))
        for a, b in zip(ring, ring[1:] + ring[:1])
    )
    assert abs(row["perimeter_km"] - round(expect, 6)) < 1e-5
