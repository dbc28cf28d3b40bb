"""Named-query registry — the correctness surface of the engine.

Every operator row in SURVEY.md §2 is realized as at least one named
query over the driver testdata, registered here together with (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver runs both sides at sf0.01 and hash-compares.

Conventions that make the hash comparison robust:
  - every computed column is aliased identically in Spark and SQL;
  - floating-point aggregates are rounded (4-6 dp) on BOTH sides;
  - timestamps/dates in outputs are formatted to strings;
  - BIGINT sums are cast explicitly in the oracle (DuckDB sums of
    BIGINT widen to HUGEINT otherwise).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    covers: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 row ids
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, covers: tuple[str, ...] | list[str] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, covers=tuple(covers), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    return REGISTRY
