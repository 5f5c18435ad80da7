from .batch import FIXTURE_TABLES, load_table, load_tables

__all__ = ["FIXTURE_TABLES", "load_table", "load_tables"]
