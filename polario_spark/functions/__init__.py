from polario_spark.functions import text, vector

__all__ = ["text", "vector"]
