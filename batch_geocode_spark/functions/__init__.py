from batch_geocode_spark.functions import cells, geo  # noqa: F401
