"""Summary statistics (SURVEY.md A6) as plain Spark SQL aggregates.

Reference analog: README.md:2 promises "useful summary statistics";
realized in the vet UI as per-source result presence
(reference: app/templates/vet.html:98-122, 241-262).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_rate_by_source(images: DataFrame, vetted: DataFrame) -> DataFrame:
    """Per source: images with ≥1 surviving candidate / total images.

    The denominator is a 1-row aggregate broadcast-cross-joined into the
    per-source counts — ONE job, not a separate ``.count()`` action
    (which at 100 TB is a full extra scan per invocation)."""
    total = images.agg(F.count(F.lit(1)).alias("n_images"))
    return (
        vetted.groupBy("source")
        .agg(F.countDistinct("image_id").alias("n_matched"))
        .crossJoin(F.broadcast(total))
        .withColumn("match_rate", F.round(F.col("n_matched") / F.col("n_images"), 6))
        .orderBy("source")
    )


def admin_rollup(pip_matches: DataFrame) -> DataFrame:
    """Count of best matches per admin polygon (groupBy rollup over
    (iso2, admin_level, name))."""
    return (
        pip_matches.groupBy("iso2", "admin_level", "name")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("iso2", "admin_level", "name")
    )


def density_rollup(density: DataFrame, res: int, parent_res: int) -> DataFrame:
    """Hierarchical tile rollup: re-aggregate cell counts at a coarser
    resolution (cheap: parent id is arithmetic on the cell id)."""
    from batch_geocode_spark.functions.cells import cell_parent

    return (
        density.withColumn("parent", cell_parent(F.col("cell"), res, parent_res))
        .groupBy("parent")
        .agg(F.sum("n_images").alias("n_images"))
    )
