from polario_spark.streaming import events

__all__ = ["events"]
