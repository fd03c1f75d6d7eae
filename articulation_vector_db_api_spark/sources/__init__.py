from .readers import SCHEMAS, load_table, table_names

__all__ = ["SCHEMAS", "load_table", "table_names"]
