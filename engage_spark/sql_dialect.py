"""SQLite/pandasql dialect shim (SURVEY.md §2.9 dialect deltas).

The reference's only SQL engine is pandasql → in-memory SQLite
(covid_simulator.py:63-69,359-372). A user switching to this engine
can keep those query strings: `sqldf(spark, sql, tables)` registers
the DataFrames as temp views and rewrites the SQLite-isms Spark
doesn't accept, then runs through spark.sql/Catalyst.

Handled deltas (the complete set the reference uses):
  ifnull(a, b)                → Spark supports natively (kept)
  julianday(a) <op> julianday(b) → datediff-based comparison
  a || b (string concat)      → concat(a, b)
  GROUP BY 1,2,...            → Spark supports ordinals natively (kept)

This is a string-level shim for the reference's dialect subset, not a
SQL parser. `||` inside quoted string literals is left untouched
(token-boundary guard); parenthesized expressions as concat operands
are out of scope (the reference only concatenates identifiers and
literals).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def translate_sqlite(sql: str) -> str:
    """Rewrite the SQLite constructs the reference uses into Spark SQL."""
    out = sql
    # julianday(a) > julianday(b)  →  datediff(a, b) > 0   (and friends)
    out = re.sub(
        r"julianday\(([^()]+)\)\s*(>=|<=|>|<|=)\s*julianday\(([^()]+)\)",
        r"datediff(\1, \3) \2 0",
        out,
        flags=re.IGNORECASE,
    )
    # remaining bare julianday(x) → days since epoch
    out = re.sub(
        r"julianday\(([^()]+)\)",
        r"(datediff(\1, DATE '1970-01-01') + 2440587.5)",
        out,
        flags=re.IGNORECASE,
    )
    # || string concatenation → one variadic concat() per chain.
    # Operands in the reference are identifiers or quoted literals
    # (never parenthesized expressions), so a token-chain match is safe.
    token = r"(?:'[^']*'|\"[^\"]*\"|[\w.]+)"
    # the lookbehind stops a match from starting mid-literal ('a||b')
    # or mid-identifier — a chain must begin at a fresh token boundary
    chain = re.compile(rf"(?<!['\"\w.])({token}(?:\s*\|\|\s*{token})+)")

    token_re = re.compile(token)

    def _fold(m: re.Match) -> str:
        # re-tokenize the chain rather than splitting on '||', which
        # would split inside quoted operands like ' || '
        parts = token_re.findall(m.group(1))
        return "concat(" + ", ".join(parts) + ")"

    return chain.sub(_fold, out)


def sqldf(spark: SparkSession, sql: str, tables: dict[str, DataFrame]) -> DataFrame:
    """pandasql.sqldf drop-in: run a SQLite-dialect query against named
    DataFrames. The pandas→SQLite→pandas copy round trip of the
    reference becomes view registration + one Catalyst plan."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return spark.sql(translate_sqlite(sql))
