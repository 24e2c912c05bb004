"""Curation CLI — the end-to-end training-data job as one command:

    python -m batch_geocode_spark.curate_cli \
        --input documents.parquet --embeddings embeddings.parquet \
        --output curated_dir --eval-mod 7 --jaccard 0.5 --min-tokens 5

Runs eval split → exact dedup → MinHash near-dup clusters →
n-gram + semantic decontamination → quality filter → stratified
sample (operators/curation.py) and commits the result through the
snapshot layer; the manifest records per-stage row counts, so every
run leaves an auditable record of what each stage removed. Re-running
an interrupted job resumes from the last committed snapshot.

No counterpart in the reference repo; exists for the
training-data-pipeline mandate.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet (doc_id, text, lang, source)")
    p.add_argument("--embeddings", default=None, help="optional embeddings parquet (vec_id, embedding)")
    p.add_argument("--output", required=True, help="output snapshot-table directory")
    p.add_argument("--eval-mod", type=int, default=7, help="doc_id %% N == 0 -> held-out eval split")
    p.add_argument("--jaccard", type=float, default=0.5, help="MinHash near-dup threshold")
    p.add_argument("--semantic-threshold", type=float, default=0.45)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-stopword-ratio", type=float, default=0.5)
    p.add_argument("--default-fraction", type=float, default=0.1)
    p.add_argument(
        "--fractions",
        default="fr=1.0,en=0.5",
        help="per-language sample fractions, e.g. fr=1.0,en=0.5",
    )
    p.add_argument("--salt", default="r2", help="sampling salt (same salt => nested samples)")
    p.add_argument(
        "--max-band-df",
        type=int,
        default=None,
        help="hot-band cap for the LSH stage (template-heavy corpora)",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--n-buckets", type=int, default=32, help="snapshot partition buckets")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from batch_geocode_spark.operators import curation as C
    from batch_geocode_spark.session import get_spark
    from batch_geocode_spark.snapshots import SnapshotTable

    fractions = {}
    for part in args.fractions.split(","):
        if part.strip():
            k, v = part.split("=")
            fractions[k.strip()] = float(v)

    spark = get_spark(master=args.master, app_name="batch_geocode_spark.curate")
    docs = spark.read.parquet(args.input).repartition(
        spark.sparkContext.defaultParallelism
    )
    emb = spark.read.parquet(args.embeddings) if args.embeddings else None

    table = SnapshotTable(args.output)
    snap = C.curate_snapshotted(
        docs,
        table,
        embeddings=emb,
        n_buckets=args.n_buckets,
        eval_mod=args.eval_mod,
        jaccard_threshold=args.jaccard,
        semantic_threshold=args.semantic_threshold,
        min_tokens=args.min_tokens,
        max_stopword_ratio=args.max_stopword_ratio,
        fractions=fractions,
        default_fraction=args.default_fraction,
        salt=args.salt,
        max_band_df=args.max_band_df,
    )
    stages = snap["metrics"]["curation_stages"]
    print(
        json.dumps(
            {
                "output": args.output,
                "snapshot_id": snap["snapshot_id"],
                "rows": snap["total_rows"],
                "curation_stages": stages,
            }
        )
    )
    # human-readable audit table after the machine-parsable JSON line:
    # the manifest already records these, but the run itself should
    # show what each stage removed without anyone opening the manifest
    print("\ncuration stages (surviving rows):")
    prev = None
    for stage, n in stages.items():
        delta = "" if prev is None else f"  (-{prev - n:,})"
        print(f"  {stage:34s} {n:>12,}{delta}")
        prev = n
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
