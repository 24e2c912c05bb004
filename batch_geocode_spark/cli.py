"""Batch CLI — the engine's equivalent of the reference's entry point
``python -m geocode.batch_geocode -i in.csv -o out.csv -u GM,OSM -r 2
-b 15`` (reference: geocode/batch_geocode.py:113-187), re-expressed as
one Spark job:

    python -m batch_geocode_spark.cli \
        --input images.parquet --gazetteer gaz.parquet --output out_dir \
        --sources GM,OSM,GN,FG --results-per-source 2 --buffer 15 \
        --layout wide --tile-res 9

Differences by design: input/output are parquet tables (not CSV+encoding
sweep), geocoding is the broadcast gazetteer join (no web keys), output
commits through the snapshot layer (resumable; re-running an interrupted
job continues from the last committed snapshot).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="images parquet (input_hint schema)")
    p.add_argument("--gazetteer", required=True, help="gazetteer parquet")
    p.add_argument("--output", required=True, help="output snapshot-table directory")
    p.add_argument(
        "--sources",
        default="GM,OSM,GN,FG",
        help="comma-separated gazetteer sources to use (reference -u)",
    )
    p.add_argument("--results-per-source", type=int, default=2, help="reference -r")
    p.add_argument("--buffer", type=float, default=15.0, help="max buffer km (reference -b)")
    p.add_argument(
        "--layout",
        choices=["wide", "best", "candidates", "tiles"],
        default="wide",
        help="output shape: reference-parity wide CSV layout, best-only, long-form candidates, or tile density",
    )
    p.add_argument("--tile-res", type=int, default=9)
    p.add_argument("--master", default=None)
    p.add_argument("--n-buckets", type=int, default=32, help="snapshot partition buckets")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from batch_geocode_spark.operators import geocode as G
    from batch_geocode_spark.operators import rollups as R
    from batch_geocode_spark.operators import tiles as T
    from batch_geocode_spark.session import get_spark
    from batch_geocode_spark.snapshots import SnapshotTable, write_snapshotted

    spark = get_spark(master=args.master, app_name="batch_geocode_spark.cli")
    images = spark.read.parquet(args.input)
    sources = [s.strip() for s in args.sources.split(",") if s.strip()]
    gaz = spark.read.parquet(args.gazetteer).filter(F.col("source").isin(sources))

    vetted, best = G.geocode_images(
        images, gaz, n_results=args.results_per_source, max_buffer=args.buffer
    )
    if args.layout == "wide":
        # deterministic source×rank prefix grid — never discovered by a
        # distinct+collect over the (big) candidate table
        prefixes = G.wide_prefix_grid(sources, args.results_per_source)
        out, key = G.to_wide(images.drop("bytes"), vetted, best, prefixes=prefixes), "image_id"
    elif args.layout == "best":
        out, key = best, "image_id"
    elif args.layout == "candidates":
        out, key = vetted.drop("rings", "name_norm"), "image_id"
    else:
        out = T.cell_density(best, res=args.tile_res)
        key = "cell"

    table = SnapshotTable(args.output)
    snap = write_snapshotted(out, table, key_col=key, n_buckets=args.n_buckets)

    stats = {
        r["source"]: r["match_rate"]
        for r in R.match_rate_by_source(images, vetted).collect()
    }
    print(
        json.dumps(
            {
                "output": args.output,
                "snapshot_id": snap["snapshot_id"],
                "rows": snap["total_rows"],
                "match_rate_by_source": stats,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
