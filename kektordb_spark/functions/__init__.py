from kektordb_spark.functions import decay, text, vector  # noqa: F401
