from polario_spark.functions import text, vector, zorder

__all__ = ["text", "vector", "zorder"]
