"""Vetting pipeline: column split/merge + manual best-override overlay.

Reimplements the reference's vetting data flow as DataFrame ops:

- split_meta_geo: partition the wide table column-wise into meta columns
  and geocoding columns with a stable join key (reference:
  geocode/vet_geocode.py:52-66; the reference synthesizes ``__index =
  range(n)`` at vet_geocode.py:49 — here the key is the deterministic
  ``image_id``, required for resume, SURVEY.md §1.4).
- merge_vetted: meta ⋈ post-vet geo columns, left join (reference:
  geocode/vet_geocode.py:96-113).
- apply_vet_overlay: the human-in-the-loop 'markBest' override as an
  overlay table joined back by key — copies the chosen source's columns
  into best_* and annotates the name with ' (from {src})' (reference:
  app/templates/vet.html:131-147). The engine stage stays deterministic;
  manual choices live in data, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_geocode_spark.operators.geocode import SUFFIXES


def geo_columns(df: DataFrame) -> list[str]:
    """Columns carrying geocoding results: any {prefix}_{suffix}."""
    return [c for c in df.columns if any(c.endswith(f"_{s}") for s in SUFFIXES)]


def split_meta_geo(
    wide: DataFrame, key_col: str = "image_id", caption_col: str = "caption"
) -> tuple[DataFrame, DataFrame]:
    """(meta, geo): column-wise partition, both carrying the join key.
    The caption plays the reference's address-column role."""
    geo_cols = geo_columns(wide)
    geo = wide.select(key_col, caption_col, *geo_cols)
    meta = wide.select(*[c for c in wide.columns if c not in set(geo_cols)])
    return meta, geo


def merge_vetted(meta: DataFrame, geo_postvet: DataFrame, key_col: str = "image_id") -> DataFrame:
    """meta ⋈ post-vet geo (left join on the stable key)."""
    dup = [c for c in geo_postvet.columns if c in meta.columns and c != key_col]
    return meta.join(geo_postvet.drop(*dup), key_col, "left")


def apply_vet_overlay(
    wide: DataFrame, overlay: DataFrame, key_col: str = "image_id"
) -> DataFrame:
    """Apply manual best-choices: ``overlay(key, chosen_prefix)`` rows
    overwrite that row's best_* block from the chosen source's columns,
    with the reference's ' (from {src})' name annotation. Rows absent
    from the overlay keep their automatic composite best."""
    joined = wide.join(F.broadcast(overlay.select(key_col, "chosen_prefix")), key_col, "left")
    prefixes = sorted({c[: c.rindex("_")] for c in geo_columns(wide)} - {"best"})
    out_cols = []
    for c in wide.columns:
        if not c.startswith("best_"):
            out_cols.append(F.col(c))
            continue
        suffix = c[len("best_") :]
        expr = F.col(c)
        for p in prefixes:
            src_col = f"{p}_{suffix}"
            if src_col not in wide.columns:
                continue
            chosen = F.col("chosen_prefix") == p
            val = F.col(src_col)
            if suffix == "name":
                val = F.when(
                    val.isNotNull(), F.concat(val, F.lit(f" (from {p})"))
                ).otherwise(F.lit(p))
            expr = F.when(chosen, val).otherwise(expr)
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)
