from tda596_lab02mapreduce_spark.operators.asof import asof_join

__all__ = ["asof_join"]
