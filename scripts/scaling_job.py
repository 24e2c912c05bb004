"""One scaling-run: the FULL end-to-end pipeline at a given cluster
size — decode + phash-validate every image payload (mapInPandas,
numpy), then broadcast-gazetteer geocode, then cell-density tiles. This
is the north_star job: at 100TB the image payload dominates, so an
end-to-end images/sec figure must include the pixel stage.

Usage: python scripts/scaling_job.py <cores> [n_images] [data_dir]
Prints one JSON line {"cores", "n_images", "seconds", "images_per_sec",
"phash_mismatches"}.

SCALING_MODE=threads (the default, matching scaling_bench.py) runs
local[cores] in a single JVM. SCALING_MODE=executors opts into cores/4
SEPARATE EXECUTOR JVMs of 4 cores each via Spark's local-cluster
manager — each executor brings its own JVM heap, GC, parquet reader,
Arrow IPC channel, and Python worker pool, exactly like cluster
executors do; measured strictly slower per core on this single host
(8 parquet readers + 8 GC pools + cross-JVM shuffle over one DRAM), so
threads mode is the reported evidence.

The input table is generated distributed ONCE into data_dir (tmpfs) and
reused by subsequent runs — both cluster sizes see identical input.
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
CORES_PER_EXECUTOR = 4


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    data_dir = sys.argv[3] if len(sys.argv) > 3 else f"/dev/shm/scaling_images_{n}"
    mode = os.environ.get("SCALING_MODE", "threads")

    # ad-hoc conf experiments: SCALING_EXTRA_CONF="k=v;k=v"
    extra_conf = dict(
        kv.split("=", 1)
        for kv in os.environ.get("SCALING_EXTRA_CONF", "").split(";")
        if "=" in kv
    )
    if mode == "executors":
        n_exec = max(1, cores // CORES_PER_EXECUTOR)
        master = f"local-cluster[{n_exec},{CORES_PER_EXECUTOR},4096]"
        # each executor must size its JVM pools (GC, JIT, netty) for ITS
        # 4 cores, not the 32 host CPUs — without ActiveProcessorCount
        # every executor spawns ~23 GC threads and the 8 JVMs
        # oversubscribe the box exactly the way real containerized
        # executors (cgroup cpu limits) never do
        extra_conf["spark.executor.extraJavaOptions"] = (
            "-XX:+UseParallelGC "
            f"-XX:ActiveProcessorCount={CORES_PER_EXECUTOR}"
        )
    else:
        master = f"local[{cores}]"
    spark = get_spark(
        master=master,
        app_name=f"scaling-{cores}",
        shuffle_partitions=cores,
        extra_conf=extra_conf,
    )

    if not os.path.exists(os.path.join(data_dir, "_SUCCESS")):
        datagen.generate_images_distributed(spark, n).write.mode("overwrite").parquet(
            data_dir
        )
    images = spark.read.parquet(data_dir)
    gaz = datagen.gazetteer_to_spark(spark)

    def pipeline_once(df):
        """ONE action for the whole pipeline: the integrity aggregate
        (decode + phash re-verify over every payload) and the per-cell
        density land in a single collect — the two branches run
        concurrently in one job instead of two serial jobs, so fixed
        per-job costs (scheduling, stage barriers, scan setup) are paid
        once. The integrity count rides along as a marker row
        (cell = -1)."""
        bad_row = (
            MM.validate_images(df)
            .filter("NOT (decode_ok AND phash_match)")
            .agg(F.count(F.lit(1)).alias("n_images"))
            .select(F.lit(-1).cast("long").alias("cell"), "n_images")
        )
        _, best = G.geocode_images(df, gaz)
        dens = T.cell_density(best, res=TILE_RES).select(
            "cell", F.col("n_images").cast("long").alias("n_images")
        )
        rows = dens.unionByName(bad_row).collect()
        return next(r["n_images"] for r in rows if r["cell"] == -1)

    # warm-up (JIT, Python workers, broadcast machinery) — untimed
    pipeline_once(spark.read.parquet(data_dir).limit(20000))

    n_images = images.count()
    sec, bad = None, 0
    for _ in range(2):  # best-of-2: the host shows sporadic slowdowns
        t0 = time.perf_counter()
        bad = pipeline_once(images)
        dt = time.perf_counter() - t0
        sec = dt if sec is None else min(sec, dt)
    # own process-tree CPU (python driver + live JVM gateway + pyspark
    # workers; reaped children via their parents' cutime) — lets
    # scaling_bench subtract our usage from the host-wide busy delta,
    # leaving EXTERNAL tenant CPU during the run: the self-proving
    # contamination metric (1-min load averages lag sub-minute bursts).
    # MUST read BEFORE spark.stop(): the JVM kills pyspark daemons
    # without reaping them, so after stop the daemons' CPU — the bulk
    # of the decode work — reparents to init, drops out of the tree,
    # and gets misattributed to the EXTERNAL tenant (rounds 2-4 showed
    # a phantom 5-10-core "storm" exactly proportional to our own
    # parallelism). Reading while every worker is alive attributes it
    # correctly; only the small stop-time CPU is lost (conservative).
    from batch_geocode_spark.loadmeter import tree_cpu_s

    cpu_s = tree_cpu_s()
    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "n_images": n_images,
                "seconds": round(sec, 3),
                "images_per_sec": round(n_images / sec, 1),
                "phash_mismatches": bad,
                "cpu_s": round(cpu_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
