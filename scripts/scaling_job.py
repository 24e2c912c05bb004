"""One scaling-run: flagship geocode→tile pipeline at a given core count.

Usage: python scripts/scaling_job.py <cores> [multiplier] [sf_dir]
Prints one JSON line {"cores", "n_images", "seconds", "images_per_sec"}.

The image table is the derived sf table exploded ×multiplier (distinct
image_ids) so the job is long enough to measure scaling cleanly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from batch_geocode_spark import entry_queries as EQ
from batch_geocode_spark.functions.cells import cell_encode
from batch_geocode_spark.operators import geocode as G
from batch_geocode_spark.operators import tiles as T
from batch_geocode_spark.session import get_spark


def main() -> None:
    cores = int(sys.argv[1])
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    spark = get_spark(master=f"local[{cores}]", app_name=f"scaling-{cores}")
    base = EQ._images(spark, sf_dir)
    images = (
        base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .withColumn("image_id", F.concat(F.col("image_id"), F.lit("_"), F.col("rep")))
        .drop("rep")
        .repartition(cores * 2)
    )
    gaz = EQ._gaz(spark, sf_dir)

    # warm-up at small size: JIT + broadcast machinery, untimed
    _, wb = G.geocode_images(base.limit(20000), gaz)
    T.cell_density(wb, res=EQ.TILE_RES).count()

    n_images = images.count()
    t0 = time.perf_counter()
    _, best = G.geocode_images(images, gaz)
    density = T.cell_density(best, res=EQ.TILE_RES)
    density.collect()
    sec = time.perf_counter() - t0
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "n_images": n_images,
                "seconds": round(sec, 3),
                "images_per_sec": round(n_images / sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
