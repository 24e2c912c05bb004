"""One scaling-run: the FULL end-to-end pipeline at a given core count —
decode + phash-validate every image payload (mapInPandas, numpy), then
broadcast-gazetteer geocode, then cell-density tiles. This is the
north_star job: at 100TB the image payload dominates, so an end-to-end
images/sec figure must include the pixel stage.

Usage: python scripts/scaling_job.py <cores> [n_images] [data_dir]
Prints one JSON line {"cores", "n_images", "seconds", "images_per_sec",
"phash_mismatches"}.

The input table is generated distributed ONCE into data_dir (tmpfs) and
reused by subsequent runs — both parallelism levels see identical input.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from batch_geocode_spark import datagen
from batch_geocode_spark.operators import geocode as G
from batch_geocode_spark.operators import multimodal as MM
from batch_geocode_spark.operators import tiles as T
from batch_geocode_spark.session import get_spark

TILE_RES = 9


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    data_dir = sys.argv[3] if len(sys.argv) > 3 else f"/dev/shm/scaling_images_{n}"

    spark = get_spark(master=f"local[{cores}]", app_name=f"scaling-{cores}")

    if not os.path.exists(os.path.join(data_dir, "_SUCCESS")):
        datagen.generate_images_distributed(spark, n).write.mode("overwrite").parquet(
            data_dir
        )
    images = spark.read.parquet(data_dir)
    gaz = datagen.gazetteer_to_spark(spark)

    # warm-up (JIT, Python workers, broadcast machinery) — untimed
    warm = spark.read.parquet(data_dir).limit(20000)
    MM.validate_images(warm).filter("NOT phash_match").count()
    _, wb = G.geocode_images(warm, gaz)
    T.cell_density(wb, res=TILE_RES).count()

    n_images = images.count()
    sec, bad = None, 0
    for _ in range(2):  # best-of-2: the host shows sporadic slowdowns
        t0 = time.perf_counter()
        bad = MM.validate_images(images).filter("NOT (decode_ok AND phash_match)").count()
        _, best = G.geocode_images(images, gaz)
        T.cell_density(best, res=TILE_RES).collect()
        dt = time.perf_counter() - t0
        sec = dt if sec is None else min(sec, dt)
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "n_images": n_images,
                "seconds": round(sec, 3),
                "images_per_sec": round(n_images / sec, 1),
                "phash_mismatches": bad,
            }
        )
    )


if __name__ == "__main__":
    main()
