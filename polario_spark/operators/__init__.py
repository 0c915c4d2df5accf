from polario_spark.operators import dedup, similarity, text_analysis, multimodal

__all__ = ["dedup", "similarity", "text_analysis", "multimodal"]
