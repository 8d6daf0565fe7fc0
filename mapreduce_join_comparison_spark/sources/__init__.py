from .io import TABLES, load_table, load_tables, read_positional_csv, write_table

__all__ = ["TABLES", "load_table", "load_tables", "read_positional_csv", "write_table"]
