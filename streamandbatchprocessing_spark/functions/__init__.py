from .aggregates import dsum, davg, dround, pround, pround_sql

__all__ = ["dsum", "davg", "dround", "pround", "pround_sql"]
