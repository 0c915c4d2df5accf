from polario_spark.sources.tables import TABLES, load_table, register_all

__all__ = ["TABLES", "load_table", "register_all"]
