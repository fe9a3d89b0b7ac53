"""kektordb_spark — a PySpark-native analytics engine with the query
capabilities of kektordb (vector search + BM25 + hybrid fusion + time-decay
memory ranking + temporal property graph + epistemic/gardener analytics),
re-expressed as Spark DataFrame/SQL programs designed for 100 TB batch scale.

Reference behavior studied from /root/reference (sanonone/kektordb v0.6.0);
all implementations here are Spark-first, not ports.
"""

__version__ = "0.1.0"
