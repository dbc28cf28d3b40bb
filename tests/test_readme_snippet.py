"""The README's 'corpus lifecycle, end to end' snippet, executed
VERBATIM — extracted from README.md at test time so the documentation
cannot drift from the code. Setup provides the names the snippet
assumes (spark, docs, delivery, corpus); every claim it demonstrates
is then spot-checked."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

README = "/root/repo/README.md"


def test_readme_lifecycle_snippet_runs_verbatim(spark, sf_dir, tmp_path):
    text = open(README).read()
    m = re.search(
        r"## The corpus lifecycle.*?```python\n(.*?)```", text, re.S
    )
    assert m, "README lifecycle snippet not found"
    snippet = m.group(1)

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars", "text"
    )
    docs = base.filter(F.col("doc_id") % 2 == 0)
    delivery = base.filter(F.col("doc_id") % 2 == 1).withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 1, F.lit(None))
        .otherwise(F.col("text")),
    )
    corpus = str(tmp_path / "corpus")
    ns = {
        "spark": spark,
        "docs": docs,
        "delivery": delivery,
        "corpus": corpus,
    }
    exec(compile(snippet, "README.md", "exec"), ns)  # noqa: S102

    # the snippet's claims hold
    assert ns["res"]["dropped_rows"] == delivery.filter(
        F.col("text").isNull()
    ).count()
    quar = spark.read.parquet(f"{corpus}_quarantine")
    assert quar.count() == ns["res"]["dropped_rows"]
    assert ns["v"] >= 1 and ns["n_live"] > 0
    # n_short was measured PRE-takedown: base + clean delivery
    pre = docs.unionByName(delivery.filter(F.col("text").isNotNull()))
    assert ns["n_short"] == pre.filter(
        (F.col("n_chars") >= 1) & (F.col("n_chars") <= 80)
    ).count()
    assert len(ns["mine"]) <= 2  # doc 7 may be odd-half or even-half
    from engage_spark.io import read_with_deletes

    assert (
        read_with_deletes(spark, corpus)
        .filter(F.col("doc_id") == 7)
        .count()
        == 0
    )
    # `yesterday` (the pre-takedown pinned version) still holds every
    # row the snapshot saw — time travel reads the retained files
    assert ns["yesterday"].count() == ns["n_live"]
