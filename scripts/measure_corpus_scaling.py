"""Measure corpus-operator scaling on a token-salted 10x documents
blow-up — the SCALE.md "corpus-layout operators" methodology, committed
as a reproducible script (round 5).

Blow-up: each extra copy of a document gets a copy-unique salt token
prepended to every line and a shifted doc_id, so copies are
shingle-disjoint from their source (no planted-duplicate explosion);
corpus growth is the only variable. The base corpus is the sf0.1
documents table replicated `base_mult` times first (a larger base
drowns the fixed per-stage overheads that dominate small runs).

Usage: python scripts/measure_corpus_scaling.py [sf_dir] [base_mult]
Prints one JSON line per measured operator:
{"op": ..., "t1": ..., "t10": ..., "growth": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def blow_up(docs, factor: int, id_stride: int):
    """factor copies; copy c > 0 salts every token-context by
    prepending a unique marker and shifts ids by c * id_stride."""
    parts = []
    for c in range(factor):
        if c == 0:
            parts.append(docs)
            continue
        salted = docs.select(
            (F.col("doc_id") + F.lit(c * id_stride)).alias("doc_id"),
            F.concat(F.lit(f"copysalt{c} "), F.col("text")).alias("text"),
            "source",
        )
        parts.append(salted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .appName("corpus-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark import api

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n_raw = raw.count()
    base_dir, big_dir = "/tmp/corpus_scale_1x", "/tmp/corpus_scale_10x"
    for d in (base_dir, big_dir):
        shutil.rmtree(d, ignore_errors=True)
    blow_up(raw, base_mult, 1_000_000).repartition(int(cpus)).write.parquet(base_dir)
    blow_up(raw, base_mult * 10, 1_000_000).repartition(int(cpus)).write.parquet(
        big_dir
    )
    base = spark.read.parquet(base_dir)
    big = spark.read.parquet(big_dir)

    ops = {
        "bigram_perplexity": lambda d: api.bigram_perplexity(d),
        "quality_decile_gate(ppl proxy: ws_tokens)": lambda d: (
            api.percentile_gate(
                api.token_stats(d).select("doc_id", "ws_tokens"),
                "ws_tokens",
            )
            .groupBy("bucket")
            .count()
        ),
        "sequence_packing sharded(8)": lambda d: api.sequence_packing(
            d, strata_col="source", budget=512, n_shards=8
        ),
        "token_encode (chunked reassembly)": lambda d: _token_encode(d),
        "tfidf_terms": lambda d: _tfidf_terms(d),
        "incremental_dedup": lambda d: _incremental_dedup(d),
        "mixture_materialize": lambda d: _mixture_materialize(d),
        "line_dedup (C4 corpus-line filter)": lambda d: _line_dedup(d),
    }

    def _line_dedup(d):
        # mirror x_line_dedup's plan (planted boilerplate + broadcast
        # blocklist + map-only array filter)
        header = "subscribe to our newsletter for daily updates"
        footer = "all rights reserved see legal notice for terms"
        planted = F.concat(
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit(header), F.lit("\n"))).otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit("\n"), F.lit(footer))).otherwise(F.lit("")),
        )
        base = d.select("doc_id", F.split(planted, "\n").alias("lines"))
        blk = (
            base.select(F.explode("lines").alias("line"))
            .groupBy("line").agg(F.count(F.lit(1)).alias("freq"))
            .filter(F.col("freq") >= 3)
            .agg(F.collect_list("line").alias("blocked"))
        )
        kept = F.filter("lines", lambda l: ~F.array_contains(F.col("blocked"), l))
        return base.crossJoin(F.broadcast(blk)).select(
            "doc_id",
            F.size("lines").cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.md5(F.concat_ws("\n", kept)).alias("cleaned_md5"),
        )

    def _incremental_dedup(d):
        # mirror x_incremental_dedup's plan
        from pyspark.sql import Window

        norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        f = d.select("doc_id", "source", F.md5(norm).alias("fingerprint"))
        old_fp = (
            f.filter(F.pmod("doc_id", F.lit(5)) != 0)
            .select("fingerprint").distinct()
        )
        batch = f.filter(F.pmod("doc_id", F.lit(5)) == 0)
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        firsts = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
        return firsts.join(old_fp, "fingerprint", "left_anti")

    def _mixture_materialize(d):
        from engage_spark.registry import load_all  # noqa: F401

        from engage_spark.queries.llm_curation import x_mixture_materialize  # noqa

        # reuse the facade-shaped plan over the arbitrary frame
        per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("tokens"))
        tot = per_src.agg(F.sum("tokens").alias("all_tokens"))
        scaled = per_src.crossJoin(F.broadcast(tot)).select(
            "source",
            (F.col("tokens") / F.col("all_tokens").cast("double")).alias("nat"),
            F.pow(F.col("tokens") / F.col("all_tokens").cast("double"), 0.7).alias("t_mass"),
        )
        norm2 = scaled.agg(F.sum("t_mass").alias("z"))
        factors = scaled.crossJoin(F.broadcast(norm2)).select(
            "source", ((F.col("t_mass") / F.col("z")) / F.col("nat")).alias("factor")
        )
        frac = F.col("factor") - F.floor("factor")
        draw = (
            F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("mix-v1"),
                F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
            / F.lit(float(1 << 32))
        )
        planned = (
            d.select("doc_id", "source").join(F.broadcast(factors), "source")
            .select("doc_id", "source",
                    (F.floor("factor") + F.when(draw < frac, 1).otherwise(0))
                    .cast("long").alias("n_copies"))
            .filter(F.col("n_copies") > 0)
        )
        return planned.select(
            "doc_id", "source",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias("copy_idx"),
        )

    def _token_encode(d):
        # mirror x_token_encode's plan over an arbitrary frame
        from pyspark.sql import Window

        from engage_spark.api import _ws_tokens, vocab_topk

        vocab = vocab_topk(d, k=100, exact_df=False)
        wv = Window.orderBy(F.desc("tf"), "token")
        vids = vocab.select("token", F.row_number().over(wv).alias("tid"))
        toks = d.select(
            "doc_id", F.posexplode(_ws_tokens("text")).alias("pos", "token")
        )
        enc = toks.join(F.broadcast(vids), "token", "left").select(
            "doc_id", "pos", F.coalesce("tid", F.lit(0)).cast("long").alias("tid")
        )
        per_chunk = (
            enc.repartition("doc_id")
            .withColumn("chunk", (F.col("pos") / 8192).cast("long"))
            .groupBy("doc_id", "chunk")
            .agg(
                F.count(F.lit(1)).alias("c_toks"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                        lambda s: s.tid.cast("string"),
                    ),
                    " ",
                ).alias("c_ids"),
            )
        )
        return per_chunk.groupBy("doc_id").agg(
            F.sum("c_toks").alias("n_toks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk", "c_ids"))),
                    lambda s: s.c_ids,
                ),
                " ",
            ).alias("ids"),
        )

    def _tfidf_terms(d):
        from pyspark.ml.feature import StopWordsRemover, Tokenizer

        toks = Tokenizer(inputCol="text", outputCol="words").transform(
            d.select("doc_id", "text")
        )
        filtered = StopWordsRemover(inputCol="words", outputCol="terms").transform(
            toks
        )
        return filtered.select(
            "doc_id", F.size("terms").cast("long").alias("n_terms")
        )

    # warm the Python worker pool once
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v):  # pragma: no cover
        return v * 1.0

    spark.range(0, int(cpus) * 4, 1, int(cpus)).select(
        _warm(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    def run(fn, df) -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn(df).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return round(best, 3)

    print(
        json.dumps(
            {"corpus_1x": n_raw * base_mult, "corpus_10x": n_raw * base_mult * 10}
        )
    )
    for name, fn in ops.items():
        t1 = run(fn, base)
        t10 = run(fn, big)
        print(
            json.dumps(
                {"op": name, "t1": t1, "t10": t10, "growth": round(t10 / t1, 2)}
            )
        )
    spark.stop()
    for d in (base_dir, big_dir):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
