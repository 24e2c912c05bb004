"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "images_per_sec": ...}

The flagship job (geocode_tile) is the BASELINE.json metric: end-to-end
broadcast gazetteer join + vet + composite-best + cell assignment +
per-cell density over the derived image+caption table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from batch_geocode_spark import entry_queries as EQ  # noqa: E402
from batch_geocode_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "g02_composite_best",
    "g04_tile_density",
    "g05_admin_pip",
    "g08_knn_within_image",
    "q01_pricing_summary",
    "q05_revenue_by_nation",
    "e01_cosine_topk",
    "e02_cosine_near_dup",
    "d05_minhash_lsh",
    "t02_quality_scores",
]


def run(sf_dir: str, cpus: str) -> dict:
    spark = get_spark(master=f"local[{cpus}]", app_name="bench")
    # warm the JVM (codegen, broadcast machinery, parquet footers) and the
    # Python UDF workers once so timings measure steady-state query cost
    EQ._views(spark, sf_dir)
    spark.table("orders").count()
    EQ.g03_cell_assign(spark, sf_dir).count()
    EQ.g05_admin_pip(spark, sf_dir).count()  # spins up the 32 Arrow workers

    # best-of-2 per query: this host occasionally stalls ~100s on GC /
    # external load; the min is the honest steady-state figure
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = EQ.QUERIES[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # flagship throughput: images/sec through geocode → cell → density
    # (best-of-2, same stall rationale as above)
    n_images = spark.sql(EQ.IMAGES_SQL).count()
    flagship_sec = None
    for _ in range(2):
        t0 = time.perf_counter()
        EQ.g04_tile_density(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        flagship_sec = dt if flagship_sec is None else min(flagship_sec, dt)
    spark.stop()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline suite wall time (flagship: geocoded images/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "n_images": n_images,
        "flagship_sec": round(flagship_sec, 3),
        "images_per_sec": round(n_images / flagship_sec, 1),
        "cpus": int(cpus),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    print(json.dumps(run(sf_dir, cpus)))
