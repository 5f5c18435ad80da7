"""Correctness-query inventory.

Every operator the engine claims (SURVEY.md §2 + the LLM-data-pipeline
extensions) is registered here as a ``(spark, sf_dir) -> DataFrame``
callable plus — wherever SQL-expressible — an equivalent ANSI-SQL oracle
string that DuckDB runs on the same parquet. The driver's correctness
gate compares the two (row count + schema + order-insensitive value
hash), so every computed column is aliased identically on both sides.

Import side effects register queries into ``registry.QUERIES`` /
``registry.ORACLES``.
"""

from . import analyses  # noqa: F401
from . import relational_ext  # noqa: F401
from . import tpch  # noqa: F401
from . import tpch_sub  # noqa: F401
from . import dedup  # noqa: F401
from . import multimodal_q  # noqa: F401
from . import pipeline  # noqa: F401
from . import similarity  # noqa: F401
from . import textops  # noqa: F401
from . import streaming  # noqa: F401
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
