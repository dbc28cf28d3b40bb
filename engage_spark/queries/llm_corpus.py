"""Corpus-statistics and training-data-layout operators (SURVEY.md §2.12).

No reference counterpart; these are the remaining passes a pre-training
corpus needs between curation (llm_curation) and batch construction
(x_sequence_packing): vocabulary statistics for tokenizer training,
BPE merge training + corpus segmentation, long-document chunking to a
context window, C4-style cross-document span dedup, deterministic
shard assignment for training-data delivery, vocabulary-id token
encoding, and bigram-LM perplexity scoring.

Scale notes (the 100 TB story):
  - Vocabulary counting is explode -> groupBy: the explode is map-side
    (no materialized token table), partial aggregation combines counts
    before the one shuffle on token, and the top-K is
    TakeOrderedAndProject (per-partition heaps, K rows per partition
    cross the wire — never the full vocabulary).
  - Chunking is map-only: sequence()+explode fan-out inside codegen,
    no shuffle, output partitioning inherits the scan.
  - Shard assignment is map-only hashing; the MANIFEST aggregates it
    into n_shards rows. Delivery itself (api.training_shards) uses
    repartition(shard) + sortWithinPartitions, never a single-task
    per-shard window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.queries.llm_dedup import _TOKS_DUCK
from engage_spark.registry import query

# ---------------------------------------------------------------------------
# Vocabulary top-K (tokenizer-training statistics)

_VOCAB_K = 100


@query(
    "x_vocab_topk",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS_DUCK}) AS token FROM documents
    )
    SELECT token,
           count(*)::BIGINT AS tf,
           count(DISTINCT doc_id)::BIGINT AS df
    FROM t GROUP BY token
    ORDER BY tf DESC, token
    LIMIT {_VOCAB_K}
    """,
    covers=["X4"],
)
def x_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 (_VOCAB_K) tokens by term frequency with
    document frequency — the first pass of tokenizer/BPE training and
    of stopword discovery.

    Plan: explode(tokens) is generated map-side inside codegen (the
    token stream is never materialized), partial aggregation combines
    (tf, partial-df) before the single shuffle on token, and the final
    top-K is TakeOrderedAndProject — each partition keeps a K-row heap,
    so only partitions*K rows reach the driver-side merge, not the full
    vocabulary. df uses count(DISTINCT doc_id), which Spark plans as a
    two-phase distinct-then-count aggregate on the same token key (one
    extra exchange of (token, doc_id) pairs — unavoidable for exact df;
    the approx_count_distinct variant drops it at scale). Ties at the
    K boundary are broken by token, so the cut is total-ordered and
    deterministic on any cluster layout."""
    from engage_spark.api import vocab_topk

    d = table(spark, sf_dir, "documents")
    return vocab_topk(d, k=_VOCAB_K)


# ---------------------------------------------------------------------------
# Long-document chunking (context-window preparation)

_CHUNK_SIZE = 64  # tokens per chunk
_CHUNK_STRIDE = 48  # start-to-start distance => 16-token overlap


@query(
    "x_doc_chunking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
    ), n AS (
        SELECT doc_id, toks, len(toks)::BIGINT AS n_toks FROM t
    ), c AS (
        SELECT doc_id, n_toks, toks,
               unnest(generate_series(
                   0,
                   greatest(
                       1,
                       ceil((n_toks - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0)::BIGINT + 1
                   ) - 1
               )) AS chunk_idx
        FROM n
    )
    SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
           len(toks[chunk_idx * {_CHUNK_STRIDE} + 1 :
                    chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}])::BIGINT
               AS n_chunk_toks,
           array_to_string(
               toks[chunk_idx * {_CHUNK_STRIDE} + 1 :
                    chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}], ' '
           ) AS chunk_text
    FROM c
    """,
    covers=["X4"],
)
def x_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping fixed-size token chunks
    (size 64, stride 48 => 16-token overlap) — how
    long documents are fitted to a model context window while keeping
    boundary context. Chunk starts are 0, stride, 2*stride, ...;
    n_chunks = max(1, ceil((n_toks - size) / stride) + 1), so every
    token is covered, a short doc yields exactly one chunk, and the
    last chunk may run short rather than spilling past the end.

    Plan: entirely map-side — tokenize, sequence(0, n_chunks-1) +
    explode fan-out, slice + array_join, all inside whole-stage
    codegen. No shuffle, no Python; output partitioning inherits the
    scan, so chunking 100 TB is a single pass at scan speed. The
    fan-out factor is bounded (~n_toks/stride per doc), and AQE can
    rebalance downstream if chunk sizes skew."""
    from engage_spark.api import chunk_documents

    d = table(spark, sf_dir, "documents")
    return chunk_documents(d, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


# ---------------------------------------------------------------------------
# Cross-document span dedup (C4-style)

_SPAN_TOKENS = 16


@query(
    "x_span_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
    ), n AS (
        SELECT doc_id, toks, len(toks)::BIGINT AS n_toks FROM t
    ), c AS (
        SELECT doc_id, toks,
               unnest(generate_series(
                   0,
                   greatest(
                       1,
                       ceil((n_toks - {_SPAN_TOKENS}) / {_SPAN_TOKENS}.0)::BIGINT + 1
                   ) - 1
               )) AS ci
        FROM n
    ), s AS (
        SELECT doc_id, ci,
               array_to_string(
                   toks[ci * {_SPAN_TOKENS} + 1 : ci * {_SPAN_TOKENS} + {_SPAN_TOKENS}],
                   ' '
               ) AS span
        FROM c
    ), f AS (
        SELECT doc_id, ci, span,
               row_number() OVER (PARTITION BY md5(span) ORDER BY doc_id, ci)
                   AS rn
        FROM s
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_spans,
           sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           coalesce(
               string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY ci), ''
           ) AS cleaned_text
    FROM f GROUP BY doc_id
    """,
    covers=["X1", "X2"],
)
def x_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document span dedup over `documents`:
    non-overlapping 16-token spans, first corpus-wide occurrence of
    each distinct span wins (ordered by doc_id, span index), documents
    reassembled from their surviving spans — exact dedup at
    SUB-document granularity, catching boilerplate repeated across
    otherwise-distinct pages that whole-doc fingerprints miss.

    Plan (api.span_dedup): span text never shuffles — the keep/drop
    decision moves only (doc_id, span_idx, md5) rows through one
    fingerprint window + one per-doc collect, and reassembly re-derives
    spans map-side after a single join back to the source text. The
    naive partition-by-span-text formulation (what the oracle does)
    would shuffle the full corpus text twice."""
    from engage_spark.api import span_dedup

    d = table(spark, sf_dir, "documents")
    return span_dedup(d, span_tokens=_SPAN_TOKENS)


# ---------------------------------------------------------------------------
# Deterministic training shards (delivery-order manifest)

_N_SHARDS = 16
_SHUF_SALT = "shuf-v1"  # bump to draw an independent shuffle


@query(
    "x_shard_manifest",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               md5('{_SHUF_SALT}:' || doc_id::VARCHAR) AS skey,
               len({_TOKS_DUCK})::BIGINT AS n_toks
        FROM documents
    ), s AS (
        SELECT doc_id, skey, n_toks,
               (('0x' || substr(skey, 1, 8))::BIGINT % {_N_SHARDS})::BIGINT
                   AS shard_id
        FROM k
    )
    SELECT shard_id,
           count(*)::BIGINT AS n_docs,
           sum(n_toks)::BIGINT AS n_tokens,
           min(skey) AS min_key,
           max(skey) AS max_key
    FROM s GROUP BY shard_id
    """,
    covers=["X4"],
)
def x_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data delivery, audited
    as a 16-row (_N_SHARDS) shard manifest. Each doc gets a shuffle key
    md5(salt:doc_id) and shard = (value of the key's first 8 hex chars)
    mod 16 — the exact scheme api.training_shards uses for delivery;
    reading shards in order, each sorted by key, visits the corpus in a
    fixed pseudo-random order — reproducible on any cluster layout
    (unlike rand() or repartition-order), resumable mid-epoch, and
    re-drawable by bumping the salt.

    Plan: key + shard are map-only codegen'd expressions; the manifest
    is one partial-agg'd shuffle on shard_id producing 16 rows. The
    DELIVERY op (api.training_shards) materializes
    repartition(n, shard) + sortWithinPartitions(key) — a distributed
    per-shard sort, NOT a row_number window over shard (which would
    funnel each shard through a single task at 100 TB)."""
    from engage_spark.api import _shard_key_cols, _ws_tokens

    d = table(spark, sf_dir, "documents")
    skey, shard = _shard_key_cols("doc_id", _SHUF_SALT, _N_SHARDS)
    k = d.select(
        "doc_id",
        skey.alias("skey"),
        shard.alias("shard_id"),
        F.size(_ws_tokens("text")).cast("long").alias("n_toks"),
    )
    return k.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.min("skey").alias("min_key"),
        F.max("skey").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# Token-id encoding (the tokenize step of training-data preparation)

_ENC_VOCAB_K = 100
_ENC_CHUNK = 8192  # tokens per reassembly chunk (bounds agg state)


@query(
    "x_token_encode",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
    ), tok AS (
        SELECT doc_id, unnest(toks) AS token FROM t
    ), vc AS (
        SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY token ORDER BY tf DESC, token LIMIT {_ENC_VOCAB_K}
    ), vid AS (
        SELECT token, row_number() OVER (ORDER BY tf DESC, token) AS tid
        FROM vc
    ), c AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks))) AS i
        FROM t
    ), e AS (
        SELECT c.doc_id, c.i, coalesce(v.tid, 0)::BIGINT AS tid
        FROM c LEFT JOIN vid v ON v.token = c.toks[c.i]
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_toks,
           sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_unk,
           string_agg(tid, ' ' ORDER BY i) AS ids
    FROM e GROUP BY doc_id
    """,
    covers=["X4"],
)
def x_token_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-id encoding — the tokenize step that turns curated
    text into the integer streams a trainer consumes: ids 1..K assigned
    by corpus frequency rank (the x_vocab_topk cut), 0 = UNK, each
    document emitted as its ordered id sequence plus UNK accounting.

    Plan: the K-row vocab gets ranked by one single-task window (K rows
    — trivial by construction) and BROADCASTS to the token join, so the
    corpus-side token stream never shuffles for the lookup. Reassembly
    is CHUNKED against adversarial giant documents: a flat
    groupBy(doc_id) collect_list would hold one buffer of the whole
    doc's tokens (a 10⁶-token doc ⇒ tens of MB in a single agg state),
    so tokens aggregate first per (doc_id, pos/_ENC_CHUNK) — state ≤
    _ENC_CHUNK structs — then chunks concatenate per doc_id, whose
    state is n_toks/_ENC_CHUNK strings totalling the bytes of the
    final ids string the op must emit anyway. Output is byte-identical
    to the flat form (oracle unchanged).

    The chunk guard costs NO extra exchange: one explicit
    repartition(doc_id) satisfies the ClusteredDistribution of BOTH
    aggregations (hash on a subset of the grouping keys), so the token
    stream crosses the wire once — pinned by the plan test. Worst-case
    concentration moves from agg state to partition bytes (a 10⁶-token
    doc is ~30 MB in one task's input — fine; the sort-based
    aggregation fallback streams its chunk groups). At real vocab
    sizes (50k-200k) the broadcast is a few MB — still the right
    plan."""
    from engage_spark.api import _ws_tokens, vocab_topk

    d = table(spark, sf_dir, "documents")
    # df is unused here (ranking is by tf, token) — approx df drops the
    # exact-distinct exchange per vocab_topk's own scale guidance
    vocab = vocab_topk(d, k=_ENC_VOCAB_K, exact_df=False)
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
        .withColumn("chunk", (F.col("pos") / _ENC_CHUNK).cast("long"))
        .groupBy("doc_id", "chunk")
        .agg(
            F.count(F.lit(1)).alias("c_toks"),
            F.sum((F.col("tid") == 0).cast("long")).alias("c_unk"),
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
        F.sum("c_unk").alias("n_unk"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk", "c_ids"))),
                lambda s: s.c_ids,
            ),
            " ",
        ).alias("ids"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity (KenLM/CCNet-style quality signal)

_PPL_K = 0.5  # add-k smoothing


@query(
    "x_bigram_perplexity",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS_DUCK} AS tk FROM documents
    ), p AS (
        SELECT doc_id,
               tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT doc_id, tk,
                     unnest(generate_series(1, len(tk) - 1)) AS i
              FROM t)
    ), bgc AS (
        SELECT w1, w2, count(*) AS c12 FROM p GROUP BY w1, w2
    ), ctx AS (
        SELECT w1, sum(c12) AS c1 FROM bgc GROUP BY w1
    ), voc AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(tk) AS tok FROM t)
    ), probs AS (
        SELECT b.w1, b.w2,
               ln((b.c12 + {_PPL_K}) / (c.c1 + {_PPL_K} * voc.v)) AS logp
        FROM bgc b JOIN ctx c ON b.w1 = c.w1, voc
    )
    SELECT p.doc_id,
           count(*)::BIGINT AS n_bigrams,
           round(avg(pr.logp) + 1e-9, 6) AS avg_logp,
           round(exp(-avg(pr.logp)) + 1e-9, 4) AS ppl
    FROM p JOIN probs pr ON p.w1 = pr.w1 AND p.w2 = pr.w2
    GROUP BY p.doc_id
    """,
    covers=["X4"],
)
def x_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram LM
    trained on the corpus itself — the KenLM/CCNet quality signal
    (high-ppl documents are boilerplate/gibberish/wrong-language
    candidates). Delegates to api.bigram_perplexity; see its docstring
    for the 100 TB plan (map-side bigram derivation, partial-agg'd
    count shuffles, broadcast V scalar, shuffle-join probability
    lookup, one groupBy(doc_id) score)."""
    from engage_spark.api import bigram_perplexity

    d = table(spark, sf_dir, "documents")
    return bigram_perplexity(d, id_col="doc_id", text_col="text", k=_PPL_K)


# ---------------------------------------------------------------------------
# BPE tokenizer training (merge learning)

_BPE_MERGES = 12


@query("x_bpe_merges", oracle=None, covers=["X4"])
def x_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge training over the documents corpus —
    the tokenizer-training pass itself (api.bpe_train; vocab_topk is
    its first-pass statistic). Output: the learned merge table
    (rank, left, right, pair_freq), fully deterministic (frequency
    ties break lexicographically).

    Scale: the corpus is touched ONCE (word-frequency count); the
    word table is then pruned — freq >= 2 (word_min_freq) plus a
    deterministic 500k-row top-N cap (TakeOrderedAndProject) — BEFORE
    the driver collect, so the collect is ≤ 500,000 rows by
    construction no matter the corpus size; the 12 merge rounds then
    run driver-side on that bounded table. Not SQL-expressible in one
    query (iterative), so rows-only under the driver; exactness is
    pinned by a pytest against an independent plain-Python BPE with
    identical pruning."""
    from engage_spark.api import bpe_train

    d = table(spark, sf_dir, "documents")
    return bpe_train(
        d, n_merges=_BPE_MERGES, min_freq=2,
        word_min_freq=2, max_vocab_words=500_000,
    )


@query("x_bpe_encode", oracle=None, covers=["X4"])
def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE over the corpus: learn 12 merges
    (x_bpe_merges' table) and segment every document with them,
    emitting per-doc (n_ws_tokens, n_bpe_tokens, bpe_per_word) — the
    tokenizer-evaluation statistic (how well the learned merges
    compress this corpus). Merges broadcast (K rows); segmentation is
    one Arrow-batched map pass with a per-worker word cache; no
    shuffle. Rows-only (the merge table is learned iteratively);
    exactness pinned by pytest vs an independent Python BPE."""
    from engage_spark.api import bpe_segment, bpe_train

    d = table(spark, sf_dir, "documents")
    merges = bpe_train(
        d, n_merges=_BPE_MERGES, min_freq=2,
        word_min_freq=2, max_vocab_words=500_000,
    )
    return bpe_segment(d, merges)


@query(
    "x_bpe_encode_wscount",
    # DuckDB twin of bpe_segment's n_ws_tokens column: the canonical
    # whitespace tokenizer (_ws_tokens / _TOKS_DUCK) with empty tokens
    # dropped — SQL-expressible even though the sibling n_bpe_tokens
    # column (iteratively learned merges) is not.
    oracle=r"""
    SELECT doc_id,
           len(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               t -> t != ''
           ))::BIGINT AS n_ws_tokens
    FROM documents
    """,
    covers=["X4"],
)
def x_bpe_encode_wscount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled projection of the x_bpe_encode pipeline: runs the
    SAME train-then-segment path (12 merges, pruned vocab) and emits
    its (doc_id, n_ws_tokens) columns, which ARE SQL-expressible —
    giving the BPE encode pipeline a hard driver signal on the columns
    an oracle can reach (n_bpe_tokens stays pytest-pinned in the
    rows-only x_bpe_encode twin). Same tokenizer-twin technique as
    x4_tfidf_terms."""
    from engage_spark.api import bpe_segment, bpe_train

    d = table(spark, sf_dir, "documents")
    merges = bpe_train(
        d, n_merges=_BPE_MERGES, min_freq=2,
        word_min_freq=2, max_vocab_words=500_000,
    )
    return bpe_segment(d, merges).select("doc_id", "n_ws_tokens")
