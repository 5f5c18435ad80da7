from .aggregates import dsum, davg, dround

__all__ = ["dsum", "davg", "dround"]
