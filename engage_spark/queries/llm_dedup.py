"""Deduplication operators for LLM training-data pipelines (SURVEY.md §2.12 X1-X2).

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup over the `documents` / `embeddings` tables. Everything except
the (intrinsically pairwise) verify step is a map-side expression
pipeline built from Spark higher-order array functions + xxhash64 —
no Python UDFs, so signatures codegen and the only shuffles are the
LSH bucket join and the final pair dedup.

Scale notes (the 100 TB story):
  - MinHash/SimHash signatures are computed in one map stage; candidate
    generation is a groupBy on (band, band_key) whose fan-in is bounded
    by banding, not by corpus size. No all-pairs anywhere.
  - The all-pairs variants (`x_ngram_jaccard_pairs`, cosine near-dup)
    deliberately block on a key (lang / label) so the join is a
    bounded self-join — they exist as the oracle-checkable semantic
    ground truth for the LSH paths, not as the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engage_spark.io import spread_small_scan, table
from engage_spark.registry import query

# ---------------------------------------------------------------------------
# Shared shingling expressions (identical semantics Spark-side & DuckDB-side)

# word tokens, lowercased; `\\s` survives Spark's string-literal unescape
_TOKS_SPARK = r"split(lower(trim(text)), '\\s+')"
_TOKS_DUCK = r"string_split_regex(lower(trim(text)), '\s+')"


def _shingles_spark(n: int = 3, toks: str = _TOKS_SPARK) -> Column:
    """Distinct word n-gram shingles as an array<string> column.

    `toks` should reference a MATERIALIZED token-array column when the
    input is large: subexpressions inside a `transform` lambda are
    re-evaluated per element, so an inline split() here would tokenize
    the document once per shingle — O(tokens²) per document."""
    return F.expr(
        f"""
        CASE WHEN size({toks}) < {n} THEN array(concat_ws(' ', {toks}))
        ELSE array_distinct(transform(
            sequence(1, size({toks}) - {n - 1}),
            i -> concat_ws(' ', {", ".join(f"element_at({toks}, i + {j})" for j in range(n))})
        )) END
        """
    )


def _shingles_duck(n: int = 3) -> str:
    concat = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return f"""
        CASE WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
        ELSE list_distinct(list_transform(range(1, len(toks) - {n - 2}), i -> {concat}))
        END
    """


# ---------------------------------------------------------------------------
# X1 — exact dedup


@query(
    "x1_exact_dedup",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           min(doc_id)::BIGINT AS keeper_doc_id,
           count(*)::BIGINT AS n_copies
    FROM documents
    GROUP BY 1
    """,
    covers=["X1", "A10"],
)
def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a normalized-text fingerprint, keep
    the lowest doc_id. One shuffle on a 128-bit key; at 100 TB the
    partial aggregation collapses duplicates map-side before the
    exchange, so shuffle volume is ~one row per distinct document."""
    d = table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.select(F.md5(norm).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Hot-bucket short-circuit (shared by every LSH bucket self-join:
# MinHash, SimHash, embedding-LSH)

# Buckets larger than this emit STAR edges to their min-id member
# instead of all C(m,2) pairs. Rationale: banding bounds EXPECTED
# fan-in (the families target ~96-row occupancy), but a real crawl
# guarantees degenerate buckets — boilerplate/template pages that
# survive exact dedup (1-char diffs) share every band key, and one
# 10M-member bucket is a 10^13-pair task AQE cannot split (single join
# key). At the cap, C(256,2) ≈ 33k pairs per bucket is a trivial task;
# above it, members are near-certain duplicates of each other, and the
# star edges (min_id, member) preserve the connected components the
# clustering queries consume whenever within-bucket members verify
# against the hub — exactly the degenerate case that produces such
# buckets. The trade: a >cap bucket whose members B, C pass the verify
# pairwise but NOT against the hub loses the B—C edge (standard
# recall/robustness trade; documented in SCALE.md).
_HOT_BUCKET_CAP = 256


def _capped_bucket_pairs(
    buckets: DataFrame,
    key_cols: list[str],
    id_col: str,
    out_a: str,
    out_b: str,
    cap: int = _HOT_BUCKET_CAP,
) -> DataFrame:
    """Distinct candidate pairs (out_a < out_b) from bucket-membership
    rows (key_cols..., id_col), with the hot-bucket short-circuit: a
    bucket of size <= cap self-joins into all C(m,2) pairs; a LARGER
    bucket emits m-1 star edges to its min-id member — O(m), which is
    what lets the near-dup family survive a crawl's degenerate
    template buckets. One window over the bucket key computes size and
    hub in the same exchange the self-join shuffles on; the window
    state is count/min over ~24-byte rows, so even a 10M-member bucket
    streams through one task in ~240 MB.

    The sized frame feeds THREE consumers (self-join left/right +
    star) with no exchange reuse (3 WindowExec / 0 ReusedExchange), so
    in r15 it localCheckpointed here — the upstream then included the
    full feature map (text scan, shingling, signature UDF) and re-ran
    three times. r16 moved the checkpoint UP to the feature frame in
    every caller (the verify rejoin needs it there anyway), after
    which re-deriving keys+window from the checkpointed features three
    times is CHEAPER than this second materialization barrier
    (min-of-4 head-to-head, sized-ckpt on/off with features
    checkpointed: x2 sf1 2.94 -> 2.45 s, embed sf1 9.2 -> 7.5 s and
    far lower variance; sf0.1 within noise). Callers MUST keep their
    feature frame checkpointed or the three-pass recompute returns."""
    w = Window.partitionBy(*key_cols)
    sized = (
        buckets.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .withColumn("__hub", F.min(id_col).over(w))
    )
    small = sized.filter(F.col("__bsz") <= cap)
    left = small.select(*key_cols, F.col(id_col).alias(out_a))
    right = small.select(*key_cols, F.col(id_col).alias(out_b))
    pairs = (
        left.join(right, on=key_cols)
        .filter(F.col(out_a) < F.col(out_b))
        .select(out_a, out_b)
    )
    star = sized.filter(
        (F.col("__bsz") > cap) & (F.col(id_col) != F.col("__hub"))
    ).select(F.col("__hub").alias(out_a), F.col(id_col).alias(out_b))
    return pairs.unionByName(star).dropDuplicates([out_a, out_b])


def _jaccard_distinct(a: str, b: str) -> Column:
    """Exact Jaccard of two DISTINCT (duplicate-free, null-free) hash
    arrays, with |A∪B| by inclusion-exclusion instead of a second
    set build: both verify sides come out of array_distinct over
    non-null hashes, so size(array_union(a,b)) ==
    size(a)+size(b)-size(array_intersect(a,b)) holds identically and
    the division inputs — hence the rounded jaccard values — are
    bit-identical to the array_union form (parity-checked both ways
    at sf1 before landing; saves one hash-set pass per candidate
    pair)."""
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / (
        F.size(a) + F.size(b) - inter
    ).cast("double")


def _capped_pairs_sql(
    bucket_cte: str,
    key_cols: str,
    id_col: str,
    out_a: str,
    out_b: str,
    cap: int = _HOT_BUCKET_CAP,
) -> str:
    """The DuckDB twin of _capped_bucket_pairs as a CTE fragment:
    `bucket_cte` must expose (key_cols..., id_col); emits CTEs `bsz`
    and `cand(out_a, out_b)`. Keeping the cap IN the oracle means the
    hash check pins exactly what the capped plan computes — the twins
    stay green whether or not any bucket exceeds the cap."""
    keys = [k.strip() for k in key_cols.split(",")]
    on_ab = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    on_sa = " AND ".join(f"s.{k} = a.{k}" for k in keys)
    on_sb = " AND ".join(f"s.{k} = b.{k}" for k in keys)
    return f"""
    bsz AS (
      SELECT {key_cols}, count(*) AS sz, min({id_col}) AS hub
      FROM {bucket_cte} GROUP BY {key_cols}
    ),
    cand AS (
      SELECT DISTINCT {out_a}, {out_b} FROM (
        SELECT a.{id_col} AS {out_a}, b.{id_col} AS {out_b}
        FROM {bucket_cte} a
        JOIN {bucket_cte} b ON {on_ab} AND a.{id_col} < b.{id_col}
        JOIN bsz s ON {on_sa} AND s.sz <= {cap}
        UNION ALL
        SELECT s.hub AS {out_a}, b.{id_col} AS {out_b}
        FROM {bucket_cte} b
        JOIN bsz s ON {on_sb}
        WHERE s.sz > {cap} AND b.{id_col} != s.hub
      )
    )
    """


# ---------------------------------------------------------------------------
# X2 — MinHash + LSH banding

# 32 hash functions h_j(x) = (a_j * x + b_j) mod p over xxhash64 shingle
# hashes; 8 bands x 4 rows. Coefficients are fixed (generated once from
# a seeded RNG and inlined) so signatures are stable across runs/nodes.
_MERSENNE_P = (1 << 61) - 1
_N_HASHES = 32
_BAND_ROWS = 4


def _coefs() -> list[tuple[int, int]]:
    # xorshift-style deterministic sequence; no RNG import needed
    # a fits in 28 bits and shingle hashes are folded to 32 bits, so
    # a*h + b < 2^61 + 2^61 < 2^63 — no BIGINT overflow under ANSI mode.
    out, x = [], 0x9E3779B97F4A7C15
    for _ in range(_N_HASHES):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x % ((1 << 28) - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = x % _MERSENNE_P
        out.append((a, b))
    return out


_COEFS = _coefs()


def minhash_signature(hashes: Column) -> Column:
    """array<bigint> MinHash signature from an array<bigint> of 32-bit
    shingle hashes (pmod'd xxhash64).

    The arithmetic — min over shingles of (a_j*h + b_j) mod p for 32
    hash functions — is a single numpy broadcast per document, run as
    an Arrow-batched pandas UDF. The earlier all-JVM formulation (one
    higher-order aggregate() per hash function) evaluated 32·|shingles|
    interpreted expression nodes per row and was ~20x slower at sf0.1;
    higher-order functions don't enter whole-stage codegen, so numpy
    is the fast path here, not the slow one."""
    from pyspark.sql.pandas.functions import pandas_udf

    a_arr = np.array([a for a, _ in _COEFS], dtype=np.uint64)[:, None]
    b_arr = np.array([b for _, b in _COEFS], dtype=np.uint64)[:, None]

    @pandas_udf("array<long>")
    def _sig(col: pd.Series) -> pd.Series:
        # r16: one flattened pass per hash function + segment-min via
        # np.minimum.reduceat replaces the per-document Python loop —
        # BIT-IDENTICAL (the same uint64 wrap-around multiply/add, the
        # same % p, and integer min is order-independent), pinned by
        # test_llm_ops' vectorized-parity case. Per-hash temporaries
        # keep peak memory at one flat row per batch, not 32.
        vals = [np.asarray(h, dtype=np.uint64) for h in col]
        sizes = np.fromiter((v.size for v in vals), dtype=np.int64,
                            count=len(vals))
        if len(vals) == 0 or (sizes == 0).any():
            # degenerate rows (empty shingle arrays) keep the legacy
            # per-row behavior, including its error on empty input
            out = []
            for hv in vals:
                sig = ((a_arr * hv[None, :] + b_arr) % _MERSENNE_P).min(axis=1)
                out.append(sig.astype(np.int64))
            return pd.Series(out)
        flat = np.concatenate(vals)
        starts = np.zeros(len(vals), dtype=np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        sigs = np.empty((len(vals), _N_HASHES), dtype=np.int64)
        for j in range(_N_HASHES):
            hv = (a_arr[j, 0] * flat + b_arr[j, 0]) % _MERSENNE_P
            sigs[:, j] = np.minimum.reduceat(hv, starts).astype(np.int64)
        return pd.Series(list(sigs))

    return _sig(hashes)


def minhash_shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, __h) — the distinct 32-bit shingle-hash array per doc,
    the single representation every downstream MinHash stage consumes
    (factored round 9 so the persisted near-dup index shares it
    expression-for-expression with minhash_candidate_pairs)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .select("doc_id", F.expr(_TOKS_SPARK).alias("__toks"))
        .select("doc_id", _shingles_spark(n, "__toks").alias("__sh"))
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(__sh, s -> pmod(xxhash64(s), 4294967296)))"
            ).alias("__h"),
        )
    )


def minhash_band_rows(hashed: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — the exploded LSH banding rows from a
    minhash_shingle_hashes frame: 32-perm signature, 8 bands x 4 rows,
    one xxhash64 key per band. 24 bytes/row; the hash arrays never
    enter the banding shuffle."""
    sigs = hashed.select("doc_id", minhash_signature(F.col("__h")).alias("sig"))
    # r16: the band-key array compiles to ONE parsed SQL expression —
    # the Column formulation cost ~45 py4j round trips per build (the
    # lsh_bucket pathology r15 fixed in llm_similarity). Literal types
    # match exactly: a bare integer parses as INT like F.lit(bi) did,
    # so every xxhash64 seed/input — hence every band key — is
    # identical (pinned by the band-key parity test).
    keys = ", ".join(
        "xxhash64({}, {})".format(
            bi,
            ", ".join(
                f"element_at(sig, {bi * _BAND_ROWS + r + 1})"
                for r in range(_BAND_ROWS)
            ),
        )
        for bi in range(_N_HASHES // _BAND_ROWS)
    )
    return sigs.select(
        "doc_id",
        F.posexplode(F.expr(f"array({keys})")).alias("band", "band_key"),
    )


def minhash_candidate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, jaccard_threshold: float = 0.5,
    hot_bucket_cap: int = _HOT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    plan: map (shingle+sign) → explode 8 band keys → shuffle on
    (band, key) → self-join within SIZE-CAPPED buckets (buckets above
    `hot_bucket_cap` short-circuit to star edges — see
    _capped_bucket_pairs) → distinct pairs → verify.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # Everything downstream works on 32-bit shingle HASHES, never the
    # shingle strings: signatures are hash math anyway, and the verify
    # join then moves array<long> (8 B/shingle) instead of word trigrams
    # (~20-30 B each) — the strings never leave the first map stage.
    # Hash-Jaccard equals string-Jaccard except on 32-bit collisions
    # (P ~ |union|²/2³³ per pair — negligible); the string-exact ground
    # truth lives in x_ngram_jaccard_pairs, which is oracle-checked.
    #
    # r16: the hash frame feeds THREE consumers (banding + both verify
    # sides); without the checkpoint the tokenize+shingle+xxhash corpus
    # map re-ran per consumer — three full passes per query. One
    # executor-local materialization replaces two recomputes (guide
    # §5's localCheckpoint trade; head-to-head min-of-4 at sf0.1
    # 1.92 -> 1.27 s and sf1 3.96 -> 3.27 s; a candidate-cover
    # semi-join variant measured WORSE at sf1 — the ids barrier
    # serializes the map pass behind candidate generation).
    hashed = minhash_shingle_hashes(
        docs, id_col=id_col, text_col=text_col, n=n
    ).localCheckpoint(eager=False)

    # Shuffle hygiene at scale: the banding explode and the bucket
    # self-join move ONLY (doc_id, band, band_key) — 24 bytes/row —
    # never the hash arrays. Hashes rejoin just for the candidate
    # pairs that survive banding (orders of magnitude fewer than docs).
    bands = minhash_band_rows(hashed)

    cand = _capped_bucket_pairs(
        bands, ["band", "band_key"], "doc_id", "doc_a", "doc_b",
        cap=hot_bucket_cap,
    )
    sh_a = hashed.select(F.col("doc_id").alias("doc_a"), F.col("__h").alias("sh_a"))
    sh_b = hashed.select(F.col("doc_id").alias("doc_b"), F.col("__h").alias("sh_b"))
    jac = _jaccard_distinct("sh_a", "sh_b")
    return (
        cand.join(sh_a, on="doc_a")
        .join(sh_b, on="doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


@query("x2_minhash_lsh_dedup", oracle=None, covers=["X2"])
def x2_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over `documents` (trigram shingles,
    32 perms, 8x4 banding, Jaccard >= 0.5 verify). Not SQL-expressible
    (xxhash64 family) → rows-only driver check; exactness is covered by
    planted-duplicate pytest cases and the oracle-checked
    `x_ngram_jaccard_pairs` ground-truth query."""
    docs = spread_small_scan(spark, table(spark, sf_dir, "documents"))
    return minhash_candidate_pairs(docs)


# ---------------------------------------------------------------------------
# X2b — SimHash (64-bit, JVM bit ops)


def with_simhash64(
    docs: DataFrame,
    text_toks_expr: str = _TOKS_SPARK,
    token_hash_sql: str = "xxhash64(t)",
) -> DataFrame:
    """Add a 64-bit `simhash` column: per-token xxhash64 (JVM, codegen),
    then per-bit +1/-1 vote sums and sign-packing as one numpy broadcast
    per document in an Arrow-batched pandas UDF. No shuffle.

    The all-JVM formulation (a higher-order ``aggregate`` over 64 bit
    positions x tokens) evaluated 64·|tokens| *interpreted* expression
    nodes per row — higher-order lambdas never enter whole-stage codegen
    — and measured ~40x slower at sf0.01 (81s -> 2s for the registered
    query). Bit semantics are identical: logical bit b of the uint64
    token hash votes +1, else -1; bit set iff vote sum > 0; the packed
    uint64 is reinterpreted as int64 (bit 63 = sign), matching Spark's
    ``shiftleft(1L, 63)`` wrap-around."""
    from pyspark.sql.pandas.functions import pandas_udf

    bit_idx = np.arange(64, dtype=np.uint64)[None, :]

    @pandas_udf("long")
    def _simhash(th: pd.Series) -> pd.Series:
        out = np.empty(len(th), dtype=np.int64)
        for i, hashes in enumerate(th):
            hv = np.asarray(hashes, dtype=np.uint64)[:, None]
            # (tokens x 64) logical bits -> per-bit vote sum = 2*ones - n
            ones = ((hv >> bit_idx) & np.uint64(1)).sum(axis=0)
            votes_pos = (2 * ones) > len(hashes)
            packed = (np.uint64(1) << bit_idx[0][votes_pos]).sum(dtype=np.uint64)
            out[i] = np.uint64(packed).astype(np.int64)
        return pd.Series(out)

    return (
        docs.withColumn(
            "__th", F.expr(f"transform({text_toks_expr}, t -> {token_hash_sql})")
        )
        .withColumn("simhash", _simhash(F.col("__th")))
        .drop("__th")
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    token_hash_sql: str = "xxhash64(t)",
    hot_bucket_cap: int = _HOT_BUCKET_CAP,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit hash into 4x16-bit
    chunks (pigeonhole: hamming<=3 pairs share >=1 exact chunk; wider
    radii caught probabilistically), bucket-join within SIZE-CAPPED
    chunk buckets (oversized buckets short-circuit to star edges —
    _capped_bucket_pairs), verify with bit_count(a^b). The 8-byte
    simhash rejoins only for surviving candidate pairs, so the bucket
    shuffle carries (doc_id, chunk_idx, chunk) rows only.
    Returns (doc_a, doc_b, hamming)."""
    # three consumers (chunk banding + both verify sides) of a frame
    # whose upstream is the per-doc simhash pandas UDF: checkpoint the
    # 16-byte rows once instead of running the UDF corpus pass thrice
    sh = with_simhash64(docs, token_hash_sql=token_hash_sql).select(
        "doc_id", "simhash"
    ).localCheckpoint(eager=False)
    chunks = sh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * k)
                    .bitwiseAND(F.lit(0xFFFF))
                    .cast("int")
                    for k in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    cand = _capped_bucket_pairs(
        chunks, ["chunk_idx", "chunk"], "doc_id", "doc_a", "doc_b",
        cap=hot_bucket_cap,
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        cand.join(a, on="doc_a")
        .join(b, on="doc_b")
        .select("doc_a", "doc_b",
                F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


@query("x2b_simhash_dedup", oracle=None, covers=["X2"])
def x2b_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over `documents` (hamming <= 8 via 16-bit
    chunk banding). xxhash64-based → rows-only driver check + planted
    pytest cases."""
    docs = spread_small_scan(spark, table(spark, sf_dir, "documents"))
    return simhash_near_pairs(docs)


# The md5-hash twin of x2b: same voting/banding/verify pipeline, but
# the token hash is a 60-bit value DuckDB can also compute
# (('0x' || substr(md5(tk),1,15))::BIGINT), which makes the ENTIRE
# SimHash family hash-oracle-able — per-bit votes, sign packing,
# 16-bit-chunk pigeonhole banding, and the bit_count verify are all
# reproduced in SQL. 60-bit hashes leave bits 60-63 voting all -1
# (always unset), so the packed value stays int64-positive on both
# engines. xxhash64 stays the registered fast path (x2b): one codegen
# call per token vs md5 + hex parse (~2-3x the hash cost) — this twin
# exists to pin the family's semantics, the way x3d2 pins BRP.
_SIMHASH_MD5_TOKEN_SQL = "cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)"


@query(
    "x2b2_simhash_md5",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok
    ),
    bits AS (
      SELECT doc_id, b.b,
             sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM th, (SELECT unnest(range(0, 64)) AS b) b
      GROUP BY doc_id, b.b
    ),
    sh AS (
      SELECT doc_id,
             sum(CASE WHEN vote > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT
                 AS simhash
      FROM bits GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, c.i AS chunk_idx, (simhash >> (16 * c.i)) & 65535 AS chunk
      FROM sh, (SELECT unnest(range(0, 4)) AS i) c
    ),
    {_capped_pairs_sql("chunks", "chunk_idx, chunk", "doc_id", "doc_a", "doc_b")},
    pairs AS (
      SELECT c.doc_a, c.doc_b,
             bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 8
    """,
    covers=["X2"],
)
def x2b2_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the md5-60bit token hash — the
    oracle-checkable twin of x2b_simhash_dedup (identical voting,
    sign-packing, 16-bit-chunk pigeonhole banding, and bit_count
    verify; only the token hash function differs). The oracle
    reproduces the full pipeline INCLUDING the banding's lossiness
    (pairs at hamming 4-8 sharing no chunk are excluded on both
    sides), so the hash check pins exactly what the banded plan
    computes, not an idealized all-pairs variant."""
    docs = spread_small_scan(spark, table(spark, sf_dir, "documents"))
    return simhash_near_pairs(docs, token_hash_sql=_SIMHASH_MD5_TOKEN_SQL).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


# The md5-hash twin of x2: MinHash banding whose ENTIRE pipeline —
# shingle hashing, the 32-permutation signature, 8x4 banding, bucket
# join, and the exact hash-set-Jaccard verify — is reproducible in
# DuckDB SQL. Two deliberate differences from the xxhash fast path,
# both for SQL exactness: (1) shingle hashes are md5-32bit
# (('0x'||substr(md5,1,8))::BIGINT); (2) the permutation family uses
# OVERFLOW-FREE coefficients a,b < 2^31 over p = 2^61-1 (a*h+b < 2^63
# fits BIGINT exactly on both engines — the fast path's uint64
# wrap-around multiply has no DuckDB equivalent), and band keys are
# the plain '|'-joined signature tuples instead of an xxhash of them
# (hashing band keys only compresses bytes, never changes semantics).
# xxhash64 stays the registered fast path (x2); this twin pins the
# MinHash family the way x2b2 pins SimHash and the r6 oracles pin the
# hyperplane family — every hash family now has a hash-checked member.

_MH32_P = (1 << 61) - 1
_MH32_BAND_ROWS = 4
_MH32_BANDS = 8


def _mh32_coefs(k: int = 32) -> list[tuple[int, int]]:
    """Deterministic LCG-drawn permutation coefficients, a odd < 2^31,
    b < 2^31 — inlined as literals in the oracle SQL."""
    x = 0x2545F4914F6CDD1D
    out = []
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x >> 33) | 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = x >> 33
        out.append((a, b))
    return out


_MH32_COEFS = _mh32_coefs()
_MH32_SIG_SQL = ",\n           ".join(
    f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {_MH32_P})) AS s{j}"
    for j, (a, b) in enumerate(_MH32_COEFS)
)
_MH32_KEY_SQL = ",\n           ".join(
    "concat_ws('|', "
    + ", ".join(f"s{bi*_MH32_BAND_ROWS+r}" for r in range(_MH32_BAND_ROWS))
    + f") AS k{bi}"
    for bi in range(_MH32_BANDS)
)
_MH32_KEYS_LIST = "[" + ", ".join(f"k{bi}" for bi in range(_MH32_BANDS)) + "]"

_MH32_CTES = f"""t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id, {_shingles_duck(3)} AS sh FROM t),
    h AS (
      SELECT doc_id,
             list_distinct(list_transform(sh,
                 x -> ('0x' || substr(md5(x),1,8))::BIGINT)) AS hs
      FROM s
    ),
    sg AS (SELECT doc_id, hs, {_MH32_SIG_SQL} FROM h),
    bk AS (SELECT doc_id, hs, {_MH32_KEY_SQL} FROM sg),
    bands AS (
      SELECT doc_id, i - 1 AS band, {_MH32_KEYS_LIST}[i] AS key
      FROM bk, range(1, {_MH32_BANDS}+1) r(i)
    ),
    {_capped_pairs_sql("bands", "band, key", "doc_id", "doc_a", "doc_b")},
    v AS (
      SELECT c.doc_a, c.doc_b,
             round(len(list_intersect(ha.hs, hb.hs))
                   / len(list_distinct(ha.hs || hb.hs))::DOUBLE, 6) AS jaccard
      FROM cand c
      JOIN h ha ON ha.doc_id = c.doc_a
      JOIN h hb ON hb.doc_id = c.doc_b
    )"""

_MH32_PAIRS_SQL = f"""
    WITH {_MH32_CTES}
    SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.5
    """




def minhash_md5_pairs(
    d: DataFrame,
    jaccard_threshold: float = 0.5,
    hot_bucket_cap: int = _HOT_BUCKET_CAP,
) -> DataFrame:
    """The md5-family MinHash banding pipeline as a reusable edge
    source (consumed by x2d_minhash_md5 and the LSH-fed clustering
    twin). Bucket self-joins are size-capped (star edges above
    `hot_bucket_cap`, mirrored in the oracle by _capped_pairs_sql).
    Returns (doc_a, doc_b, jaccard), doc_a < doc_b."""
    cand, hashed = _mh32_cand(d, hot_bucket_cap)
    ha = hashed.select(F.col("doc_id").alias("doc_a"), F.col("__h").alias("ha"))
    hb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("__h").alias("hb"))
    jac = _jaccard_distinct("ha", "hb")
    return (
        cand.join(ha, on="doc_a")
        .join(hb, on="doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _mh32_cand(d: DataFrame, hot_bucket_cap: int = _HOT_BUCKET_CAP):
    """The md5-family banding pipeline up to (but not including) the
    verify: returns (capped candidate pairs, the per-doc shingle-hash
    frame). Split out so the recall report can count candidates and
    verified pairs separately while sharing one pipeline definition
    with minhash_md5_pairs."""
    hashed = (
        d.select("doc_id", F.expr(_TOKS_SPARK).alias("__toks"))
        .select("doc_id", _shingles_spark(3, "__toks").alias("__sh"))
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(__sh, "
                "s -> cast(conv(substr(md5(s),1,8),16,10) as bigint)))"
            ).alias("__h"),
        )
        # three consumers (signature branch + both verify sides in
        # minhash_md5_pairs, or + x2e's counts): one materialization
        # replaces two tokenize+shingle+md5 corpus recomputes (the
        # r16 checkpoint shape measured on the xxhash family)
        .localCheckpoint(eager=False)
    )
    sig_cols = [
        F.array_min(
            F.expr(f"transform(__h, h -> (h * {a}L + {b}L) % {_MH32_P}L)")
        ).alias(f"s{j}")
        for j, (a, b) in enumerate(_MH32_COEFS)
    ]
    sigs = hashed.select("doc_id", *sig_cols)
    band_keys = F.array(*[
        F.concat_ws("|", *[
            F.col(f"s{bi*_MH32_BAND_ROWS+r}").cast("string")
            for r in range(_MH32_BAND_ROWS)
        ])
        for bi in range(_MH32_BANDS)
    ])
    bands = sigs.select("doc_id", F.posexplode(band_keys).alias("band", "key"))
    cand = _capped_bucket_pairs(
        bands, ["band", "key"], "doc_id", "doc_a", "doc_b", cap=hot_bucket_cap
    )
    return cand, hashed


@query(
    "x2d_minhash_md5",
    oracle=_MH32_PAIRS_SQL,
    covers=["X2"],
)
def x2d_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with the md5-32bit hash family — the
    oracle-checkable twin of x2_minhash_lsh_dedup (identical shingling,
    banding shape, bucket join, and exact-Jaccard verify; only the hash
    functions differ — see the module comment above for why). The
    signature arithmetic runs as 32 JVM array_min/transform
    expressions: interpreted, which is fine at the oracle-checked
    scales this twin exists for; the xxhash fast path keeps the numpy
    signature kernel for corpus-scale throughput."""
    d = spread_small_scan(spark, table(spark, sf_dir, "documents"))
    return minhash_md5_pairs(d)


_LSH_RECALL_ORACLE = f"""
    WITH {_MH32_CTES},
    lsh AS (SELECT doc_a, doc_b FROM v WHERE jaccard >= 0.5),
    et AS (SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents),
    es AS (SELECT doc_id, lang, {_shingles_duck(3)} AS sh FROM et),
    exact AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM es a JOIN es b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))
              / len(list_distinct(a.sh || b.sh))::DOUBLE >= 0.5
    ),
    m AS (
      SELECT (SELECT count(*) FROM exact) AS n_exact,
             (SELECT count(*) FROM cand) AS n_candidates,
             (SELECT count(*) FROM lsh) AS n_verified,
             (SELECT count(*) FROM exact e JOIN lsh l
                 ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b) AS n_hit
    )
    SELECT n_exact::BIGINT AS n_exact,
           n_candidates::BIGINT AS n_candidates,
           n_verified::BIGINT AS n_verified,
           n_hit::BIGINT AS n_hit,
           round(n_hit / greatest(1, n_exact)::DOUBLE + 1e-9, 6) AS recall
    FROM m
    """


@query("x2e_lsh_recall_report", oracle=_LSH_RECALL_ORACLE, covers=["X2"])
def x2e_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality REPORT for the md5 MinHash-LSH pipeline: how
    many of the exact lang-blocked trigram-Jaccard >= 0.5 pairs (the
    x_ngram_jaccard_pairs ground truth) does the banding + capped
    bucket join + verify recover? One row: (n_exact, n_candidates,
    n_verified, n_hit, recall). This is the metric an operator watches
    when tuning bands/rows or the hot-bucket cap — prior rounds pinned
    recall with pytests; this makes it a hash-checked, driver-visible
    number. Scale shape: the exact side is the deliberately-blocked
    ground-truth join (oracle scale, not corpus scale); the LSH side
    is the production pipeline; the four counts are broadcast 1-row
    crossJoins."""
    from engage_spark.queries.llm_curation import _exact_trigram_edges

    d = spread_small_scan(spark, table(spark, sf_dir, "documents"))
    cand, hashed = _mh32_cand(d)
    ha = hashed.select(F.col("doc_id").alias("doc_a"), F.col("__h").alias("ha"))
    hb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("__h").alias("hb"))
    jac = F.size(F.array_intersect("ha", "hb")) / F.size(
        F.array_union("ha", "hb")
    ).cast("double")
    lsh = (
        cand.join(ha, on="doc_a")
        .join(hb, on="doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    exact = _exact_trigram_edges(table(spark, sf_dir, "documents")).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    res = (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(
            F.broadcast(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        )
        .crossJoin(
            F.broadcast(lsh.agg(F.count(F.lit(1)).alias("n_verified")))
        )
        .crossJoin(
            F.broadcast(
                exact.join(lsh, on=["doc_a", "doc_b"]).agg(
                    F.count(F.lit(1)).alias("n_hit")
                )
            )
        )
    )
    return res.select(
        "n_exact",
        "n_candidates",
        "n_verified",
        "n_hit",
        F.round(
            F.col("n_hit")
            / F.greatest(F.lit(1), F.col("n_exact")).cast("double")
            + F.lit(1e-9),
            6,
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# X2c — n-gram Jaccard ground truth (oracle-checked)


@query(
    "x_ngram_jaccard_pairs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents
    ), s AS (
        SELECT doc_id, lang, {_shingles_duck(3)} AS sh FROM t
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.sh, b.sh))
                 / len(list_distinct(a.sh || b.sh))::DOUBLE, 6) AS jaccard
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
          / len(list_distinct(a.sh || b.sh))::DOUBLE >= 0.02
    """,
    covers=["X2"],
)
def x_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard pairs within a lang block — the
    oracle-checkable ground truth for the MinHash path. The lang
    blocking keeps the self-join bounded; the scale path for unblocked
    corpora is x2_minhash_lsh_dedup."""
    d = table(spark, sf_dir, "documents")
    s = d.select("doc_id", "lang", F.expr(_TOKS_SPARK).alias("__toks")).select(
        "doc_id", "lang", _shingles_spark(3, "__toks").alias("sh")
    )
    a = s.select(F.col("doc_id").alias("doc_a"), "lang", F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), "lang", F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    return (
        a.join(b, on="lang")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", F.round(jac, 6))
        .filter(jac >= 0.02)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# X5 — embedding-cosine near-dup (oracle-checked, double math both sides)


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity of two array<float> columns in double
    precision. Zero-norm vectors score NULL (the denominator is
    null-guarded — under ANSI mode a bare division would THROW
    DIVIDE_BY_ZERO and kill the job on one degenerate row); mismatched
    lengths also yield NULL via zip_with null-padding. Either way a
    `>= threshold` filter drops the pair, matching cosine_arrow's NaN
    behavior."""
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    den = F.sqrt(dot(F.col(a), F.col(a))) * F.sqrt(dot(F.col(b), F.col(b)))
    return dot(F.col(a), F.col(b)) / F.when(den != 0, den)


_COS_DUCK = """
    list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))
"""


@query(
    "x_cosine_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_COS_DUCK}, 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS_DUCK} >= 0.35
    """,
    covers=["X2", "X3"],
)
def x_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within a label block, double-
    precision dot products on both engines. Blocked self-join = the
    semantic ground truth; the unblocked scale path is the LSH-bucketed
    ANN in llm_similarity."""
    e = table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), "label",
                 F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), "label",
                 F.col("embedding").alias("emb_b"))
    cos = cosine_expr("emb_a", "emb_b")
    return (
        a.join(b, on="label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(cos >= 0.35)
        .select("vec_a", "vec_b", "cosine")
    )


@query(
    "x1b_exact_dedup_keepers",
    oracle="""
    SELECT doc_id, source, lang FROM (
        SELECT doc_id, source, lang,
               row_number() OVER (
                   PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   ORDER BY doc_id
               ) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    covers=["X1", "A10"],
)
def x1b_exact_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself (not the stats): lowest-doc_id row
    per normalized-text fingerprint, full rows preserved — what a
    training pipeline actually feeds downstream. One window shuffle on
    the fingerprint; same plan as api.exact_dedup_keepers."""
    from engage_spark.api import exact_dedup_keepers

    d = table(spark, sf_dir, "documents")
    return exact_dedup_keepers(d, id_col="doc_id", text_col="text").select(
        "doc_id", "source", "lang"
    )


# ---------------------------------------------------------------------------
# Incremental-ingestion dedup (new batch vs existing fingerprint store)


@query(
    "x_incremental_dedup",
    oracle=r"""
    WITH f AS (
        SELECT doc_id, source,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
    ), old AS (
        SELECT DISTINCT fp FROM f WHERE doc_id % 5 <> 0
    ), batch AS (
        SELECT doc_id, source, fp FROM f WHERE doc_id % 5 = 0
    ), firsts AS (
        SELECT doc_id, source, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM batch
    )
    SELECT n.doc_id, n.source, n.fp AS fingerprint
    FROM firsts n
    WHERE n.rn = 1 AND NOT EXISTS (SELECT 1 FROM old o WHERE o.fp = n.fp)
    """,
    covers=["X1"],
)
def x_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup — the snapshot-update pattern of a
    production corpus: a NEW batch of documents (stand-in split:
    doc_id ≡ 0 mod 5) is admitted only if (a) its normalized
    fingerprint is absent from the EXISTING corpus (the other 80%) and
    (b) it is the first occurrence within the batch. Returns the
    accepted rows (doc_id, source, fingerprint).

    Scale: the existing corpus contributes only its FINGERPRINT SET —
    in production that is the persisted 16-byte-per-doc store written
    by the previous run, read without touching any text; here it is
    derived map-side from the same table. Admission is one window on
    the batch's fingerprints plus one LEFT ANTI join against the store
    (shuffles carry fingerprints, never text). Appending the accepted
    fingerprints back to the store closes the incremental loop."""
    d = table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    f = d.select("doc_id", "source", F.md5(norm).alias("fingerprint"))
    old = f.filter(F.pmod("doc_id", F.lit(5)) != 0).select("fingerprint").distinct()
    batch = f.filter(F.pmod("doc_id", F.lit(5)) == 0)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    firsts = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return firsts.join(old, "fingerprint", "left_anti").select(
        "doc_id", "source", "fingerprint"
    )


# ---------------------------------------------------------------------------
# N-gram novelty (corpus-diversity scoring)

_NOV_N = 8  # n-gram width, the decontamination/C4 span scale


@query(
    "x_ngram_novelty",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
    ), sh AS (
        SELECT doc_id, md5(s) AS fp
        FROM (SELECT doc_id, unnest({_shingles_duck(_NOV_N)}) AS s FROM t)
    ), f AS (
        SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS first_doc
        FROM sh
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_ngrams,
           sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
               AS n_novel,
           round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE + 1e-9, 6) AS novelty
    FROM f GROUP BY doc_id
    """,
    covers=["X1", "X4"],
)
def x_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the corpus-diversity signal: the
    fraction of a document's distinct 8-grams that it INTRODUCES to
    the corpus (owner = lowest doc_id). Low-novelty documents are
    boilerplate/near-dup candidates; the corpus-level novelty curve is
    the standard diminishing-returns diagnostic for scraping more of
    the same source. Returns (doc_id, n_ngrams, n_novel, novelty).

    Scale (the span-dedup shuffle-hygiene story): n-gram TEXT never
    shuffles — ownership is decided on (doc_id, md5) rows through one
    fingerprint window, then one groupBy(doc_id) reduces to three
    numbers per document. Shingling is map-side (array_distinct per
    doc caps the fan-out at distinct n-grams)."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.expr(_TOKS_SPARK).alias("__toks"))
    # md5 applies INSIDE the array transform (a generator can't nest
    # under an expression), so only 16-byte fingerprints ever explode
    sh = t.select(
        "doc_id",
        F.explode(
            F.transform(_shingles_spark(_NOV_N, "__toks"), F.md5)
        ).alias("fp"),
    )
    w = Window.partitionBy("fp")
    f = sh.withColumn("first_doc", F.min("doc_id").over(w))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return f.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(novel).alias("n_novel"),
        F.round(
            F.sum(novel) / F.count(F.lit(1)).cast("double") + F.lit(1e-9), 6
        ).alias("novelty"),
    )
