"""Similarity search + semantic dedup over embeddings (SURVEY.md §2.12
X3, plus SemDeDup on the X2 side).

Brute-force cosine top-k is the oracle-checked baseline; hyperplane-LSH
and IVF bucketed variants are the scale paths (bucket/list cardinality
bounds the join fan-out instead of corpus size) — both ALSO fully
oracle-checked since round 6 (their quantizers are deterministic).
Small candidate sets score through JVM higher-order expressions in
double precision; LARGE candidate sets (embed-LSH verify, SemDeDup pair
verify) go through the Arrow-vectorized cosine kernel — one numpy batch
product per Arrow batch, never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engage_spark.io import table
from engage_spark.queries.llm_dedup import _capped_pairs_sql, cosine_expr
from engage_spark.registry import query

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 5

_COS_DUCK = """
    list_sum(list_transform(range(1, len(q.embedding) + 1),
             i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE))))
"""


@query(
    "x3_topk_cosine_search",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_DUCK} AS cos,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_COS_DUCK} DESC, c.vec_id
               ) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id < {_N_QUERIES}
         AND c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cosine
    FROM scored WHERE rank <= {_TOP_K}
    """,
    covers=["X3"],
)
def x3_topk_cosine_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    the corpus, score JVM-side, partial top-k per partition, then a
    final rank over the reduced set. The corpus never shuffles; scoring
    is map-only, the per-partition reduce (mapInPandas, state bounded by
    queries x k) caps the exchange at partitions x queries x k rows —
    without it the window would shuffle one scored row per (corpus row x
    query), corpus-sized at 100 TB. The partial reduce uses the same
    total order (cos desc, neighbor_id asc) as the final rank, so the
    result is exactly the global top-k, not an approximation."""

    from engage_spark.api import topk_cosine_search

    e = table(spark, sf_dir, "embeddings")
    return topk_cosine_search(
        e,
        e.filter(F.col("vec_id") < _N_QUERIES),
        k=_TOP_K,
        id_col="vec_id",
        emb_col="embedding",
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)

_MAX_PLANES = 24
_N_PLANES = 8   # legacy fixed count (kept for _planes' default)
_DIM = 64
_SEARCH_OCC = 96  # target corpus rows per bucket (P auto-scales from n)


def _planes(n: int = _N_PLANES, dim: int = _DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG over a fixed seed;
    values in [-1, 1)). Inlined as literals so every executor agrees
    without a broadcast variable. The LCG runs sequentially, so
    _planes(m)[:k] == _planes(k) — a prefix of the max plane table is
    the same planes, which is what lets the plane COUNT scale with the
    corpus while the oracle inlines one fixed table."""
    x = 0x853C49E6748FEA9B
    out = []
    for _ in range(n):
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append((x >> 11) / float(1 << 52) - 1.0)
        out.append(row)
    return out


def search_planes_count(n_rows: int) -> int:
    """Sign-bit plane count for an n-vector corpus: P =
    clamp(ceil(log2(n / _SEARCH_OCC)), 4, _MAX_PLANES), i.e. 2^P
    buckets targeting ~_SEARCH_OCC rows per bucket — the same
    derive-params-from-corpus-size rule as lsh_banding_params /
    ivf_params / semdedup_params (round 6; a FIXED plane count probes a
    constant FRACTION of the corpus per query — linear per-query work,
    brute force in disguise at 100x). With P ~ log2(n) the HD<=2
    multiprobe set is 1 + P + C(P,2) buckets out of 2^P, so per-query
    candidates ~ P**2 * occupancy — polylog x constant, strongly
    sub-linear."""
    import math

    return max(4, min(_MAX_PLANES, math.ceil(math.log2(max(2, n_rows) / _SEARCH_OCC))))


def _hd2_flips(p: int) -> list[int]:
    """The hamming-distance<=2 multiprobe XOR masks over p planes."""
    return [0] + [1 << j for j in range(p)] + [
        (1 << i) | (1 << j) for i in range(p) for j in range(i + 1, p)
    ]


def _sql_double_array(vals) -> str:
    """SQL text of an array<double> literal. repr() round-trips every
    float exactly and the D suffix makes each element a DOUBLE literal,
    so the parsed values are bit-identical to the F.lit() columns this
    replaces."""
    return "array(" + ", ".join(f"{v!r}D" for v in vals) + ")"


def lsh_bucket(emb_col: str, n_planes: int = _N_PLANES) -> F.Column:
    """Sign-bit bucket id (0..2^n_planes-1) of an array<float> column,
    over the first n_planes rows of the shared plane table — pure JVM
    codegen expressions (one interpreted dot per plane), compiled to
    ONE parsed SQL expression: the per-plane F.array(*[F.lit(v)...])
    form paid ~65 py4j round trips per plane of pure driver time
    (~90 ms each, r15 optimization round — guide §5 driver fixed
    costs); the parsed literals and expression tree are identical, so
    every computed bucket id is unchanged (parity probe + the
    existing Arrow-kernel pin)."""
    q = f"`{emb_col}`"
    terms = []
    for j, plane in enumerate(_planes(_MAX_PLANES)[:n_planes]):
        arr = _sql_double_array(plane)
        dot = (
            f"aggregate(zip_with({q}, {arr}, "
            "(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return F.expr(" + ".join(["0"] + terms))


def lsh_bucket_arrow(emb_col: str, n_planes: int) -> F.Column:
    """The same sign-bit bucket as an Arrow-batched kernel: one
    (batch x dim) @ (dim x P) BLAS gemm per Arrow batch, then sign-bit
    packing — for plane counts where P interpreted aggregate/zip_with
    dots per row lose to a single matrix product (same trade as
    nd_band_keys_column). Kernel parity with the JVM path is
    pytest-pinned (a sign flip would need a dot within float-epsilon
    of 0.0, impossible on continuous data)."""
    from pyspark.sql.pandas.functions import pandas_udf

    mat = np.array(_planes(_MAX_PLANES)[:n_planes], dtype=np.float64).T
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("long")
    def _bucket(emb: pd.Series) -> pd.Series:
        if not len(emb):
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        bits = (m @ mat) > 0
        return pd.Series((bits @ weights).astype(np.int64))

    return _bucket(F.col(emb_col))


def lsh_bucket_auto(emb_col: str, n_planes: int) -> F.Column:
    """JVM expressions under the shared plane budget, Arrow gemm above
    it — the same auto-switch nd_band_keys_column applies (the driver
    corpora sit at P=4-5, so the oracle-checked path stays Python-free;
    corpus-scale P approaches _MAX_PLANES and takes the gemm)."""
    if n_planes <= _ND_JVM_PLANE_BUDGET_SEARCH:
        return lsh_bucket(emb_col, n_planes)
    return lsh_bucket_arrow(emb_col, n_planes)


_ND_JVM_PLANE_BUDGET_SEARCH = 16  # mirrors _ND_JVM_PLANE_BUDGET


# x3b's full oracle (added r6 — the "probe expansion isn't SQL" claim
# was wrong): the hyperplanes are deterministic literals, so the oracle
# inlines the SAME _MAX_PLANES x 64 plane table, derives the ACTIVE
# plane count P from count(*) exactly as search_planes_count does,
# recomputes every vector's sign-bit bucket over the first P planes,
# generates the identical HD<=2 multiprobe mask set from range(P), and
# ranks candidates by exact cosine. Bucket sign tests compare the same
# double-precision dots on both engines (boundary dot == 0.0 would be
# ambiguous, but cannot occur with continuous float data).
_X3B_PLANE_ROWS = ",\n".join(
    "({}, [{}])".format(j, ", ".join(repr(v) for v in row))
    for j, row in enumerate(_planes(_MAX_PLANES))
)


@query(
    "x3b_lsh_ann_search",
    oracle=f"""
    WITH t AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    prm AS (
      SELECT greatest(4, least({_MAX_PLANES},
                 ceil(log2(greatest(2, count(*)) / {_SEARCH_OCC}.0))::BIGINT))
                 AS np
      FROM t
    ),
    planes(j, p) AS (VALUES {_X3B_PLANE_ROWS}),
    b AS (
      SELECT t.vec_id,
             sum(CASE WHEN list_sum(list_transform(range(1, len(t.e)+1),
                          i -> t.e[i] * planes.p[i])) > 0
                      THEN 1 << planes.j ELSE 0 END)::BIGINT AS bucket
      FROM t, planes, prm WHERE planes.j < prm.np
      GROUP BY t.vec_id
    ),
    pidx AS (SELECT unnest(range(0, np)) AS i FROM prm),
    flips AS (
      SELECT 0 AS flip
      UNION ALL
      SELECT 1 << i FROM pidx
      UNION ALL
      SELECT (1 << a.i) | (1 << b.i) FROM pidx a, pidx b WHERE a.i < b.i
    ),
    q AS (
      SELECT b.vec_id AS query_id, t.e AS qe, xor(b.bucket, f.flip) AS bucket
      FROM b JOIN t ON t.vec_id = b.vec_id, flips f
      WHERE b.vec_id < {_N_QUERIES}
    ),
    c AS (
      SELECT b.vec_id AS neighbor_id, t.e AS ce, b.bucket
      FROM b JOIN t ON t.vec_id = b.vec_id
    ),
    cand AS (
      SELECT q.query_id, c.neighbor_id,
             list_sum(list_transform(range(1, len(q.qe)+1),
                                     i -> q.qe[i]*c.ce[i]))
             / (sqrt(list_sum(list_transform(q.qe, x->x*x)))
                * sqrt(list_sum(list_transform(c.ce, x->x*x)))) AS cos
      FROM q JOIN c ON q.bucket = c.bucket AND c.neighbor_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, rank::BIGINT AS rank,
           round(cos, 6) AS cosine
    FROM ranked WHERE rank <= {_TOP_K}
    """,
    covers=["X3"],
)
def x3b_lsh_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: corpus and queries hash to
    sign-bit buckets over P planes, where P derives from the corpus row
    count (search_planes_count: 2^P buckets at ~96-row target
    occupancy — a fixed P probes a constant corpus fraction per query,
    which is linear work in disguise); candidates are corpus vectors in
    the query's bucket or any bucket at hamming distance <= 2
    (multiprobe: 1 + P + C(P,2) buckets of 2^P — per-query candidates
    ~ P² x occupancy, polylog), then exact cosine rank within
    candidates. FULL DuckDB oracle (upgraded r6): the plane table is a
    deterministic literal and P is recomputed from count(*), so the
    twin reproduces buckets, probe expansion, and ranking end-to-end;
    the recall-vs-brute-force pytest remains as the semantic bound."""
    e = table(spark, sf_dir, "embeddings")
    n_planes = search_planes_count(_corpus_rows(sf_dir))
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        lsh_bucket_auto("embedding", n_planes).alias("bucket"),
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        lsh_bucket_auto("embedding", n_planes).alias("qbucket"),
    )
    flips = _hd2_flips(n_planes)
    probes = q.select(
        "query_id",
        "q_emb",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in flips])
        ).alias("bucket"),
    )
    cand = probes.join(corpus, on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        cand.withColumn("cos", cosine_expr("q_emb", "c_emb"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (coarse-quantizer scale path)

_DIM_CACHE: dict[str, int] = {}


def _parquet_parts(path: str) -> list[str]:
    """The part files of `path`, which may be a single parquet file or a
    Spark-written dataset DIRECTORY (same directory handling as
    io._nano_ts_fields; a lone file returns itself)."""
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def _embedding_dim(sf_dir: str) -> int:
    """Embedding dimensionality (the list<float> schema carries no
    length). Spark-native since round 7 — a one-row LIMIT 1 probe
    (`size(embedding)`), which works on ANY Hadoop-FS URI (s3a://,
    gs://, hdfs://), where the previous pyarrow footer peek assumed a
    driver-local path. Cached per sf_dir; in production this would be
    a catalog/config constant. Falls back to the pyarrow local peek
    only when called without an active SparkSession (the scaling
    scripts call it before building one)."""
    if sf_dir not in _DIM_CACHE:
        spark = SparkSession.getActiveSession()
        if spark is not None:
            _DIM_CACHE[sf_dir] = (
                spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .select(F.size("embedding").alias("d"))
                .head()
                .d
            )
        else:
            import pyarrow.parquet as pq

            part = _parquet_parts(f"{sf_dir}/embeddings.parquet")[0]
            pf = pq.ParquetFile(part)
            batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
            _DIM_CACHE[sf_dir] = len(batch.column(0)[0])
    return _DIM_CACHE[sf_dir]


def ivf_params(n_rows: int) -> tuple[int, int, int]:
    """(nlist, nprobe, seed_stride) for an n-vector corpus — the FAISS
    IVF sizing rule, derived from corpus size like lsh_banding_params /
    semdedup_params (round 6; the first cut used the 10-label quantizer
    as a FIXED nlist, which probes a constant FRACTION of the corpus —
    linear per-query work, brute force in disguise at 100x):
      nlist  = ceil(sqrt(n)) (floor 4) -> occupancy ~ sqrt(n);
      nprobe = ceil(1.5 * log2(nlist)) (floor 4) -> candidates per
               query ~ 1.5 * log2(sqrt(n)) * sqrt(n), strongly
               sub-linear. The 1.5 factor is the round-9 recall knob,
               chosen by measurement on the synthetic worst case (near-
               random vectors): recall@5 vs brute force 0.64 -> 0.74 at
               sf0.001 and 0.68 -> 0.76 at sf0.01 (a SECOND Lloyd step
               at the old nprobe was measured first and went BACKWARD,
               0.68 -> 0.62 at sf0.01 — on near-random data the means
               drift toward the global mean, so probing more lists
               beats refining the quantizer again);
      seeds  = corpus vectors with vec_id % seed_stride == 0
               (deterministic random-sampling init — literally k-means
               init; production replaces seeds with trained k-means
               centroids, same plan shape).
    Broadcast budget: nlist*dim doubles ~ sqrt(n)*512 B — trivially
    broadcastable at any realistic n."""
    import math

    nlist = max(4, math.ceil(math.sqrt(n_rows)))
    nprobe = max(4, math.ceil(1.5 * math.log2(nlist)))
    return nlist, nprobe, max(1, n_rows // nlist)


def _elementwise_mean(
    df: DataFrame, group_cols: list[str], vec_col: str, out_col: str = "c"
) -> DataFrame:
    """Per-group elementwise mean of an array column as ONE aggregate
    expression regardless of dimensionality: posexplode -> avg keyed on
    (group, pos) -> re-assemble ordered by pos. The explode happens
    map-side and partial-aggregates before the exchange, so the shuffle
    carries only k x dim scalar rows. The alternative — `dim` separate
    F.avg(vec[i]) expressions — generates thousands of aggregates at
    production dims (768-4096), blowing past Janino's 64 KB codegen
    method limit into interpreted fallback. Means rounded 6dp (+1e-9
    nudge) to pin cross-engine float-sum order, matching the oracles."""
    return (
        df.select(*group_cols, F.posexplode(vec_col).alias("__pos", "__v"))
        .groupBy(*group_cols, "__pos")
        .agg(F.round(F.avg("__v") + F.lit(1e-9), 6).alias("__cv"))
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(F.struct("__pos", "__cv"))).alias("__pc"))
        .select(
            *group_cols, F.expr("transform(__pc, s -> s.__cv)").alias(out_col)
        )
    )


def _ivf_centroid_avg_sql(dim: int) -> str:
    """The Lloyd-step centroid update as SQL: the per-list elementwise
    MEAN of the assigned vectors, each element rounded to 6dp (the only
    float-order-sensitive quantity in the refinement; rounding makes
    the refined centroid table bit-identical across engines)."""
    return ", ".join(
        f"round(avg(e[{i}]) + 1e-9, 6)" for i in range(1, dim + 1)
    )


@query(
    "x3c_ivf_ann_search",
    # Full oracle (added r6; Lloyd refinement r7): the coarse quantizer
    # is deterministic — hash-stride seed centroids (vec_id % stride ==
    # 0, stride derived from count(*) exactly as ivf_params derives it)
    # REFINED by one k-means step (assign all vectors to their nearest
    # seed, recenter each list on the elementwise mean, rounded 6dp on
    # both sides), cosine-ranked list assignment (ties toward the
    # smaller list id on both sides) — so the twin recomputes seeding,
    # the Lloyd step, list assignment, the nprobe probe set, and the
    # exact cosine ranking end-to-end.
    oracle=f"""
    WITH t AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    p AS (
      SELECT greatest(4, ceil(sqrt(count(*)))::BIGINT) AS nlist,
             greatest(4, ceil(1.5 * log2(greatest(4, ceil(sqrt(count(*)))::BIGINT)))::BIGINT)
                 AS nprobe,
             greatest(1, count(*) // greatest(4, ceil(sqrt(count(*)))::BIGINT))
                 AS stride
      FROM t
    ),
    cent0 AS (
      SELECT t.vec_id AS seed_id, t.e AS c
      FROM t, p WHERE t.vec_id % p.stride = 0
    ),
    asg0 AS (
      SELECT vec_id, e, seed_id, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
      FROM (
        SELECT t.vec_id, t.e, cent0.seed_id,
               list_sum(list_transform(range(1, {_DIM}+1), i -> t.e[i]*cent0.c[i]))
               / ((CASE WHEN sqrt(list_sum(list_transform(t.e, x->x*x))) = 0
                        THEN 1.0 ELSE sqrt(list_sum(list_transform(t.e, x->x*x))) END)
                  * (CASE WHEN sqrt(list_sum(list_transform(cent0.c, x->x*x))) = 0
                          THEN 1.0
                          ELSE sqrt(list_sum(list_transform(cent0.c, x->x*x))) END))
                   AS cos
        FROM t, cent0
      )
    ),
    cent AS (
      SELECT seed_id, [{_ivf_centroid_avg_sql(_DIM)}] AS c
      FROM asg0 WHERE rn = 1 GROUP BY seed_id
    ),
    asg AS (
      SELECT vec_id, e, seed_id, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
      FROM (
        SELECT t.vec_id, t.e, cent.seed_id,
               list_sum(list_transform(range(1, {_DIM}+1), i -> t.e[i]*cent.c[i]))
               / ((CASE WHEN sqrt(list_sum(list_transform(t.e, x->x*x))) = 0
                        THEN 1.0 ELSE sqrt(list_sum(list_transform(t.e, x->x*x))) END)
                  * (CASE WHEN sqrt(list_sum(list_transform(cent.c, x->x*x))) = 0
                          THEN 1.0
                          ELSE sqrt(list_sum(list_transform(cent.c, x->x*x))) END))
                   AS cos
        FROM t, cent
      )
    ),
    corpus AS (
      SELECT vec_id AS neighbor_id, e AS ce, seed_id AS list_id
      FROM asg WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, e AS qe, seed_id AS list_id
      FROM asg, p WHERE rn <= p.nprobe AND vec_id < {_N_QUERIES}
    ),
    cand AS (
      SELECT pr.query_id, c.neighbor_id,
             list_sum(list_transform(range(1, len(pr.qe)+1),
                                     i -> pr.qe[i]*c.ce[i]))
             / (sqrt(list_sum(list_transform(pr.qe, x->x*x)))
                * sqrt(list_sum(list_transform(c.ce, x->x*x)))) AS cos
      FROM probes pr JOIN corpus c ON pr.list_id = c.list_id
      WHERE c.neighbor_id != pr.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, rank::BIGINT AS rank,
           round(cos, 6) AS cosine
    FROM ranked WHERE rank <= {_TOP_K}
    """,
    covers=["X3"],
)
def x3c_ivf_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: hash-stride seed vectors act as the k-means INIT
    (see ivf_params for the FAISS sizing rule — nlist, nprobe, AND the
    seed stride all derive from the corpus row count, so per-query
    candidate volume is ~ log2(sqrt(n))*sqrt(n), strongly sub-linear,
    instead of the constant corpus FRACTION a fixed quantizer probes),
    refined by ONE deterministic Lloyd step (round 7): assign every
    vector to its nearest seed, recenter each list on the elementwise
    mean. The refinement costs one extra corpus pass (an Arrow gemm)
    plus a k x dim partial agg — and moves the quantizer from arbitrary
    hash seeds toward actual density centers, which is what raises
    recall on clustered data (measured on the synthetic worst case:
    sf0.001 0.58 -> 0.64, sf0.01 0.44 -> 0.68; the round-9 nprobe bump
    — ivf_params — lifts those to 0.74 / 0.76). Every corpus vector
    lives in its nearest-centroid list; each query probes only its
    nprobe closest lists before exact cosine ranking. The centroid
    table is tiny (sqrt(n) x dim) and broadcasts; assignment is one
    Arrow gemm per batch. FULL DuckDB oracle — seeding, the Lloyd step
    (means rounded 6dp both sides), and ranking are all deterministic,
    so the twin recomputes everything from count(*)."""
    from pyspark.sql.pandas.functions import pandas_udf

    e = table(spark, sf_dir, "embeddings")
    _, nprobe, stride = ivf_params(_corpus_rows(sf_dir))

    def nearest_lists(bc, emb_col: str, n: int) -> F.Column:
        """array of the n nearest centroid ids by cosine; ties break by
        ascending id (ids pre-sorted, argsort is stable)."""

        @pandas_udf("array<long>")
        def _nearest(emb: pd.Series) -> pd.Series:
            ids, mat, cn = bc.value
            m = np.stack([np.asarray(v, dtype=np.float64) for v in emb]) \
                if len(emb) else np.zeros((0, mat.shape[1]))
            vn = np.sqrt((m * m).sum(axis=1))
            vn[vn == 0] = 1.0
            cos = (m @ mat.T) / np.outer(vn, cn)
            order = np.argsort(-cos, axis=1, kind="stable")[:, :n]
            return pd.Series(list(ids[order]))

        return _nearest(F.col(emb_col))

    def broadcast_cents(cents: list) -> object:
        c_ids = np.array([sid for sid, _ in cents], dtype=np.int64)
        c_mat = np.array([c for _, c in cents], dtype=np.float64)
        c_norm = np.sqrt((c_mat ** 2).sum(axis=1))
        c_norm[c_norm == 0] = 1.0
        return spark.sparkContext.broadcast((c_ids, c_mat, c_norm))

    # bounded collect: nlist ~ sqrt(n) seed rows (budget in ivf_params)
    bc0 = broadcast_cents(sorted(
        (r.vec_id, r.embedding)
        for r in e.filter(F.col("vec_id") % stride == 0)
        .select("vec_id", "embedding").collect()
    ))
    # one Lloyd step: nearest-seed assignment (Arrow gemm over the
    # corpus), then per-list elementwise means via _elementwise_mean —
    # one aggregate expression at any dim, partial-aggregated map-side.
    # Collect is bounded: nlist rows of dim doubles.
    refined = _elementwise_mean(
        e.select(
            nearest_lists(bc0, "embedding", 1)[0].alias("list0"), "embedding"
        ),
        ["list0"],
        "embedding",
    )
    bc = broadcast_cents(sorted(
        (r["list0"], list(r["c"])) for r in refined.collect()
    ))

    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        nearest_lists(bc, "embedding", 1)[0].alias("list_id"),
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(nearest_lists(bc, "embedding", nprobe)).alias("list_id"),
    )
    cand = q.join(corpus, on="list_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        cand.withColumn("cos", cosine_expr("q_emb", "c_emb"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ; Jegou, Douze, Schmid, "Product Quantization
# for Nearest Neighbor Search", TPAMI 2011) — the compressed-domain ANN
# family every production vector store runs at scale: each vector's M
# subvectors quantize independently against a small per-subspace
# codebook, so 64 float32 dims (256 B) become M=8 codes (8 B with a
# 16-entry codebook) — a 32x compression, and search scans CODES, not
# floats. At 100 TB of raw embeddings the ADC scan reads ~3 TB.

_PQ_M = 8                    # subspaces
_PQ_SUBDIM = _DIM // _PQ_M   # dims per subspace
_PQ_KSUB = 32                # target codebook size (5-bit codes)
_PQ_RERANK = 50              # ADC shortlist size fed to the exact re-rank


def pq_params(n_rows: int) -> int:
    """seed_stride for the PQ codebooks: corpus vectors with
    vec_id % stride == 0 supply the per-subspace centroid INIT
    (deterministic sampling, refined by one Lloyd step — same pattern
    as ivf_params/x3c; production replaces it with full per-subspace
    k-means, same plan shape). UNLIKE the banding/IVF parameters, the
    codebook size _PQ_KSUB is FIXED by design: it sets bits-per-code
    (quantization fidelity, a storage/accuracy trade), not probe
    volume — corpus growth changes which vectors seed the codebook,
    never how much work a query does per scanned code."""
    return max(1, n_rows // _PQ_KSUB)


def _pq_l2_sql(a: str, b: str, subdim: int = _PQ_SUBDIM) -> str:
    """Squared-L2 of two subvectors as an explicit left-associated
    8-term SQL sum — the same sequential add order as the numpy encode
    kernel and the driver-side query-distance table, so all three
    compute bit-identical doubles from identical inputs."""
    return " + ".join(
        f"({a}[{j}] - {b}[{j}]) * ({a}[{j}] - {b}[{j}])"
        for j in range(1, subdim + 1)
    )


_PQ_CENT_AVG = ", ".join(
    f"round(avg(vs[{i}]) + 1e-9, 6)" for i in range(1, _PQ_SUBDIM + 1)
)

_PQ_COMMON_SQL = f"""
    t0 AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e0
      FROM embeddings
    ),
    t AS (
      SELECT vec_id,
             list_transform(e0, x -> x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END))
                 AS e
      FROM (SELECT vec_id, e0,
                   sqrt(list_sum(list_transform(e0, x -> x * x))) AS nrm
            FROM t0)
    ),
    p AS (
      SELECT greatest(1, count(*) // {_PQ_KSUB}) AS stride FROM t
    ),
    sub AS (
      SELECT vec_id, r.m::INTEGER AS m,
             list_slice(e, r.m * {_PQ_SUBDIM} + 1,
                        r.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS vs
      FROM t, range({_PQ_M}) r(m)
    ),
    cent0 AS (
      SELECT s.vec_id AS cid, s.m, s.vs AS cs
      FROM sub s, p WHERE s.vec_id % p.stride = 0
    ),
    scored0 AS (
      SELECT s.vec_id, s.m, s.vs, c.cid,
             row_number() OVER (
                 PARTITION BY s.vec_id, s.m
                 ORDER BY {_pq_l2_sql('s.vs', 'c.cs')}, c.cid) AS rn
      FROM sub s JOIN cent0 c ON s.m = c.m
    ),
    cent AS (
      SELECT cid, m, [{_PQ_CENT_AVG}] AS cs
      FROM scored0 WHERE rn = 1 GROUP BY cid, m
    ),
    scored AS (
      SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (
                 PARTITION BY s.vec_id, s.m
                 ORDER BY {_pq_l2_sql('s.vs', 'c.cs')}, c.cid) AS rn
      FROM sub s JOIN cent c ON s.m = c.m
    ),
    codes AS (SELECT vec_id, m, cid FROM scored WHERE rn = 1)
"""


def _pq_normalize(v: np.ndarray) -> np.ndarray:
    """L2-normalize rows (zero-norm rows pass through): on the unit
    sphere, squared-L2 ranking IS cosine ranking (cos = 1 - d^2/2), so
    PQ-ADC approximates the same metric the exact search uses."""
    nrm = np.sqrt((v * v).sum(axis=1))
    nrm[nrm == 0] = 1.0
    return v / nrm[:, None]


def _pq_subdist_seq(vs: np.ndarray, cs: np.ndarray) -> np.ndarray:
    """Sequential-order squared L2 between a (B, SUBDIM) block and one
    centroid subvector — t = (v0-c0)^2; t += (vj-cj)^2 — matching
    _pq_l2_sql's left-associated sum bit for bit."""
    t = (vs[:, 0] - cs[0]) * (vs[:, 0] - cs[0])
    for j in range(1, vs.shape[1]):
        t = t + (vs[:, j] - cs[j]) * (vs[:, j] - cs[j])
    return t


def _pq_encode_batches(
    cb: dict,
    emit_sub: bool = False,
    normalize: bool = True,
    extra_cols: tuple[str, ...] = (),
):
    """mapInPandas generator factory: one Arrow batch in, the M code
    rows per vector out (all M rows of a vector stay in one output
    batch, so the downstream per-(query, vector) ADC sum combines
    map-side). cb maps m -> (sorted ids, (K_m, SUBDIM) matrix); argmin
    ties resolve to the FIRST minimum = smallest cid, mirroring the
    oracle's ORDER BY d, cid. emit_sub=True additionally carries the
    encoded subvector (the Lloyd-step input). normalize=False skips
    the unit-sphere projection — required when the input is a RESIDUAL
    (x3f), which must quantize as-is. extra_cols are tiled through to
    the output (e.g. the coarse list id, keeping codes and list
    assignment in the same row without a corpus-sized rejoin)."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            )
            if normalize:
                v = _pq_normalize(v)
            B = len(pdf)
            sd = v.shape[1] // _PQ_M  # subspace width follows the data
            ms, cids, subs = [], [], []
            for m in range(_PQ_M):
                ids_m, mat_m = cb[m]
                vs = v[:, m * sd:(m + 1) * sd]
                d = np.empty((B, len(ids_m)))
                for kk in range(len(ids_m)):
                    d[:, kk] = _pq_subdist_seq(vs, mat_m[kk])
                idx = np.argmin(d, axis=1)
                ms.append(np.full(B, m, dtype="int32"))
                cids.append(ids_m[idx])
                if emit_sub:
                    subs.append(vs)
            out = {
                "vec_id": np.tile(pdf["vec_id"].to_numpy(), _PQ_M),
                **{
                    c: np.tile(pdf[c].to_numpy(), _PQ_M) for c in extra_cols
                },
                "m": np.concatenate(ms),
                "cid": np.concatenate(cids),
            }
            if emit_sub:
                out["vs"] = list(np.concatenate(subs, axis=0))
            yield pd.DataFrame(out)

    return gen


def _pq_codebooks(
    spark: SparkSession,
    e: DataFrame,
    n_rows: int,
    normalize: bool = True,
    seed_source: DataFrame | None = None,
    seed_rows: list | None = None,
) -> dict:
    """Build the per-subspace codebooks: hash-stride seed subvectors
    (bounded collect, ~_PQ_KSUB rows) refined by ONE Lloyd step — the
    corpus assigns to its nearest seed per subspace (Arrow pass), each
    occupied cell recenters on the elementwise mean rounded to 6dp
    (the only float-order-sensitive quantity; rounding pins the
    codebook bit-identically across engines). e must carry
    (vec_id, embedding). normalize=False trains on the vectors AS-IS —
    the residual-PQ path (x3f), where the input already lives in
    residual space and a unit-sphere projection would corrupt it.
    seed_source, when given, supplies the seed rows instead of e —
    for inputs that are themselves a full-corpus computation (x3f's
    residual frame), the caller passes a pre-filtered variant so the
    ~K-row seed collect doesn't trigger a full corpus pass (the
    mapInPandas boundary blocks the id-filter pushdown). seed_rows
    (r16) goes one further: the caller already HOLDS the ~K seed
    (vec_id, embedding) pairs driver-side — no seed job at all.
    Returns {m: (sorted cid array, (K_m, SUBDIM) float64 matrix)}."""
    stride = pq_params(n_rows)
    if seed_rows is not None:
        seeds = sorted(
            (int(i), v) for i, v in seed_rows if int(i) % stride == 0
        )
    else:
        src = seed_source if seed_source is not None else e
        seeds = sorted(
            (r.vec_id, r.embedding)
            for r in src.filter(F.col("vec_id") % stride == 0)
            .select("vec_id", "embedding").collect()
        )
    if not seeds:
        raise ValueError(
            "PQ codebook seeding found no vectors (empty corpus, or no "
            "id is a multiple of the stride) — nothing to quantize against"
        )
    s_ids = np.array([cid for cid, _ in seeds], dtype=np.int64)
    s_mat = np.array([c for _, c in seeds], dtype=np.float64)
    if normalize:
        s_mat = _pq_normalize(s_mat)
    dim = s_mat.shape[1]
    if dim % _PQ_M:
        raise ValueError(
            f"embedding dim {dim} is not divisible by the {_PQ_M} PQ subspaces"
        )
    sd = dim // _PQ_M  # subspace width follows the data, not a constant
    cb0 = {m: (s_ids, s_mat[:, m * sd:(m + 1) * sd]) for m in range(_PQ_M)}
    refined = _elementwise_mean(
        e.select("vec_id", "embedding").mapInPandas(
            _pq_encode_batches(cb0, emit_sub=True, normalize=normalize),
            "vec_id long, m int, cid long, vs array<double>",
        ),
        ["m", "cid"],
        "vs",
        out_col="cs",
    ).collect()  # bounded: at most M x K_SUB rows of subdim doubles
    cb: dict = {}
    for m in range(_PQ_M):
        rows = sorted((r.cid, r.cs) for r in refined if r.m == m)
        cb[m] = (
            np.array([cid for cid, _ in rows], dtype=np.int64),
            np.array([cs for _, cs in rows], dtype=np.float64),
        )
    return cb


@query(
    "x3e_pq_encode",
    oracle=f"""
    WITH {_PQ_COMMON_SQL}
    SELECT vec_id, m, cid FROM codes
    """,
    covers=["X3"],
)
def x3e_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ENCODE: every corpus vector (L2-normalized — on the unit
    sphere squared-L2 ranking IS cosine ranking) -> M=8 codebook ids,
    one per 8-dim subspace, nearest refined centroid by squared L2 with
    ties to the smaller id. The code table is the compressed search
    structure the ADC scan reads instead of raw floats: 64 float32
    dims (256 B) -> 8 codes (8 B byte-aligned), a 32x reduction — at
    100 TB of raw embeddings the scan side shrinks to ~3 TB. Plan:
    codebooks build from a bounded seed collect + one Lloyd pass
    (_pq_codebooks), then encode is map-only — one Arrow kernel per
    batch, nothing corpus-sized shuffles. FULL DuckDB oracle: seeding
    derives from count(*), the Lloyd means round to 6dp on both sides,
    and both engines evaluate the same left-associated 8-term distance
    sums. Delegates to api.pq_encode (the public facade)."""
    from engage_spark.api import pq_encode

    e = table(spark, sf_dir, "embeddings")
    return pq_encode(e, n_rows=_corpus_rows(sf_dir))


@query(
    "x3e2_pq_adc_search",
    oracle=f"""
    WITH {_PQ_COMMON_SQL},
    qd AS (
      SELECT s.vec_id AS query_id, c.m, c.cid,
             {_pq_l2_sql('s.vs', 'c.cs')} AS dq
      FROM sub s JOIN cent c ON s.m = c.m WHERE s.vec_id < {_N_QUERIES}
    ),
    adc AS (
      SELECT qd.query_id, codes.vec_id AS neighbor_id,
             round(sum(qd.dq) + 1e-9, 6) AS approx
      FROM codes JOIN qd ON codes.m = qd.m AND codes.cid = qd.cid
      WHERE codes.vec_id != qd.query_id
      GROUP BY qd.query_id, codes.vec_id
    ),
    shortlist AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx, neighbor_id) AS srank
      FROM adc
    ),
    rerank AS (
      SELECT sl.query_id, sl.neighbor_id,
             {_COS_DUCK} AS cos,
             row_number() OVER (
                 PARTITION BY sl.query_id
                 ORDER BY {_COS_DUCK} DESC, sl.neighbor_id) AS rank
      FROM shortlist sl
      JOIN t0 q ON q.vec_id = sl.query_id
      JOIN t0 c ON c.vec_id = sl.neighbor_id
      WHERE sl.srank <= {_PQ_RERANK}
    )
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cosine
    FROM rerank WHERE rank <= {_TOP_K}
    """.replace("q.embedding", "q.e0").replace("c.embedding", "c.e0"),
    covers=["X3"],
)
def x3e2_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ SEARCH: asymmetric distance computation (ADC) shortlist +
    exact re-rank — the production IVF-PQ query shape. Each query
    precomputes its distance to every codebook entry (a 10 x 8 x ~32
    lookup table, built driver-side with the same sequential sums and
    broadcast); the approximate distance to a corpus vector is the SUM
    of M table lookups on its codes, so the corpus-sized scan touches
    8-byte codes, never raw floats. The ADC top-{_PQ_RERANK} per query
    then re-ranks by EXACT cosine — only queries x {_PQ_RERANK} raw
    vectors are ever fetched (measured recall@5 vs exact on worst-case
    random vectors: 0.80 at sf0.001, 0.74 at sf0.01; pure-ADC ranking
    gives ~0.2).

    Plan shape: the code table's M rows per vector sit in one
    partition (_pq_encode_batches), so the per-(query, vector) ADC sum
    combines map-side; a partition-local top-C reduce (state = queries
    x C) caps the ranking exchange at partitions x queries x C rows —
    the same bounded-exchange pattern as topk_cosine_search — and the
    re-rank joins the corpus by id for the shortlist only. FULL DuckDB
    oracle end to end (codes + Lloyd codebooks + lookup table +
    shortlist + re-rank). Delegates to api.pq_topk_search (the public
    facade)."""
    from engage_spark.api import pq_topk_search

    e = table(spark, sf_dir, "embeddings")
    return pq_topk_search(
        e,
        e.filter(F.col("vec_id") < _N_QUERIES),
        k=_TOP_K,
        rerank=_PQ_RERANK,
        n_rows=_corpus_rows(sf_dir),
    )


# ---------------------------------------------------------------------------
# IVF-PQ with residual encoding (x3f) — the production composition of
# the two families above (FAISS's IndexIVFPQ; Jegou et al. 2011 §IV):
# a coarse quantizer routes every vector to one of nlist inverted
# lists, and PQ encodes the RESIDUAL u - c(list) instead of the vector
# itself. Residuals concentrate near 0 with far less variance than raw
# vectors, so the same codebook budget quantizes them with much lower
# error — more recall per byte than flat PQ — while search visits only
# the nprobe probed lists (sub-linear, vs flat PQ's full code scan).


def _ivfpq_coarse_kmeans(spark: SparkSession, e: DataFrame, n_rows: int):
    """TRUE k-means coarse quantizer (r14, VERDICT r13 #7): MLlib
    KMeans fit on a deterministic hash-stride SAMPLE of the
    unit-normalized corpus (~50 vectors per target list, so the fit is
    O(sqrt(n)) rows at any corpus size), centers returned through the
    same (c_ids, c_mat, nprobe) contract as the seeded path — the
    downstream broadcast/assignment/residual machinery is untouched.
    Production text embeddings CLUSTER; the stride-seed + one-Lloyd
    default is measured-adequate on the synthetic testdata, but
    k-means|| init plus 20 Lloyd iterations tracks real density modes
    better (recall comparison in SCALE.md §Quantizer choice).
    Deterministic for a fixed corpus: fixed seed, fixed init, sample
    fixed by the stride rule — but NOT DuckDB-expressible (iterative
    fit), so the registered x3c/x3f queries keep the seeded default."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nlist, nprobe, _ = ivf_params(n_rows)
    samp_stride = max(1, n_rows // (nlist * 50))
    norm = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x * x
    ))
    unit = F.transform(
        "embedding",
        lambda x: x / F.when(norm == F.lit(0.0), F.lit(1.0)).otherwise(norm),
    )
    samp = (
        e.filter(F.col("vec_id") % samp_stride == 0)
        .select(array_to_vector(unit).alias("features"))
    )
    model = KMeans(
        k=nlist, seed=7, maxIter=20, initMode="k-means||", tol=1e-6
    ).fit(samp)
    c_mat = np.array(
        [np.asarray(c) for c in model.clusterCenters()], dtype=np.float64
    )
    c_ids = np.arange(len(c_mat), dtype=np.int64)
    return c_ids, c_mat, nprobe


def _ivfpq_coarse(
    spark: SparkSession, e: DataFrame, n_rows: int,
    quantizer: str = "seeded",
    seeds: list | None = None,
):
    """Coarse quantizer for the residual-PQ path: hash-stride seeds on
    the UNIT-SPHERE corpus refined by one Lloyd step (the x3c pattern,
    but in normalized space and under squared-L2 — the metric the
    residual ADC decomposes). Returns (sorted list ids, (nlist, dim)
    centroid matrix, nprobe). Both collects are bounded at nlist rows;
    the assignment pass is one Arrow gemm-shaped kernel; the means go
    through _elementwise_mean (one aggregate at any dim), rounded 6dp
    so both engines hold bit-identical centroids.
    quantizer="kmeans" swaps in the MLlib fit (_ivfpq_coarse_kmeans);
    the default stays the DuckDB-oracle-able seeded path. `seeds`
    (r16): pre-collected (vec_id, embedding) seed rows — the caller
    merged this collect into another seed scan (one job, not two);
    must be exactly the sorted vec_id % stride == 0 set."""
    if quantizer == "kmeans":
        return _ivfpq_coarse_kmeans(spark, e, n_rows)
    if quantizer != "seeded":
        raise ValueError(
            f"unknown quantizer {quantizer!r}: 'seeded' or 'kmeans'"
        )
    nlist, nprobe, stride = ivf_params(n_rows)
    if seeds is None:
        seeds = sorted(
            (r.vec_id, r.embedding)
            for r in e.filter(F.col("vec_id") % stride == 0)
            .select("vec_id", "embedding").collect()
        )
    if not seeds:
        raise ValueError("IVF-PQ coarse seeding found no vectors")
    s_ids = np.array([i for i, _ in seeds], dtype=np.int64)
    s_mat = _pq_normalize(np.array([v for _, v in seeds], dtype=np.float64))
    bc = spark.sparkContext.broadcast((s_ids, s_mat))

    def assign0(batches):
        ids, mat = bc.value
        sq = (mat * mat).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            u = _pq_normalize(np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            ))
            # gemm form of ||u-c||^2 (minus the constant ||u||^2): a
            # BLAS product, not a (B, nlist, dim) broadcast intermediate
            # — at nlist ~ sqrt(200k) the naive form allocates ~23 GB
            # per 10k-row batch and was measured 10x slower
            d = sq[None, :] - 2.0 * (u @ mat.T)
            # argmin takes the FIRST minimum; ids are sorted ascending,
            # so ties resolve to the smallest lid = ORDER BY d, lid
            yield pd.DataFrame(
                {"lid0": ids[np.argmin(d, axis=1)], "u": list(u)}
            )

    refined = _elementwise_mean(
        e.select("vec_id", "embedding").mapInPandas(
            assign0, "lid0 long, u array<double>"
        ),
        ["lid0"],
        "u",
    )
    rows = sorted((r["lid0"], list(r["c"])) for r in refined.collect())
    c_ids = np.array([i for i, _ in rows], dtype=np.int64)
    c_mat = np.array([c for _, c in rows], dtype=np.float64)
    return c_ids, c_mat, nprobe


def _ivfpq_residual_batches(bc):
    """mapInPandas factory: (vec_id, embedding) -> (vec_id, lid,
    embedding=residual). One Arrow pass: normalize, nearest refined
    centroid by squared-L2 (ties to the smaller lid via sorted ids +
    first-min argmin), subtract. The residual column reuses the name
    `embedding` so the PQ kernels apply unchanged (normalize=False)."""

    def gen(batches):
        ids, mat = bc.value
        sq = (mat * mat).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            u = _pq_normalize(np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            ))
            d = sq[None, :] - 2.0 * (u @ mat.T)  # gemm, see assign0
            idx = np.argmin(d, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "lid": ids[idx],
                "embedding": list(u - mat[idx]),
            })

    return gen


def _ivfpq_seed_residual_rows(rows: list, c_mat):
    """Driver-side twin of `_ivfpq_residual_batches` for the BOUNDED
    PQ seed set (r16): the seed rows are already on the driver from
    the merged seed collect, and every operation here is row-wise
    (normalize, gemm row-dot vs the 6dp-ROUNDED centroids, first-min
    argmin, subtract) in the same float64 order as the kernel — so
    running it in driver numpy instead of scheduling a dedicated
    mapInPandas job yields the same residuals (parity-pinned by
    test_llm_ops on real embeddings; x3f/x5b stay hash-checked end to
    end). Returns sorted [(vec_id, residual ndarray)]."""
    rows = sorted(rows)
    u = _pq_normalize(
        np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    )
    sq = (c_mat * c_mat).sum(axis=1)
    d = sq[None, :] - 2.0 * (u @ c_mat.T)
    idx = np.argmin(d, axis=1)
    res = u - c_mat[idx]
    return [(rows[i][0], res[i]) for i in range(len(rows))]


def _full_l2_sql(a: str, b: str, dim: int = _DIM) -> str:
    """Full-dimension squared-L2 between two list columns (oracle side
    of the coarse assignment)."""
    return (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


# The x3f oracle recomputes the ENTIRE pipeline from count(*): unit
# normalization, coarse seeding (vec_id % cstride), one coarse Lloyd
# step (per-dim means rounded 6dp), squared-L2 list assignment (ties
# to the smaller lid), residuals against the rounded centroids,
# residual-PQ seeding (vec_id % pqstride) + one Lloyd step (subspace
# means rounded 6dp), code assignment (sequential-sum L2, ties to the
# smaller cid), per-(query, probed-list) lookup tables, the ADC sum
# over probed lists only (rounded 6dp before ordering), the
# top-{_PQ_RERANK} shortlist, and the exact-cosine re-rank. All float
# aggregation points round at 6dp with the +1e-9 nudge on BOTH sides;
# unrounded distance ORDERINGS (coarse/code argmins, computed
# pairwise-sum by numpy vs sequential list_sum by DuckDB) agree except
# on exact float ties between DISTINCT centroids — probability ~0 on
# continuous data, same caveat as x3c.
def _x3f_ctes(n_queries: int) -> str:
    """The full deterministic IVF-PQ oracle CTE chain, ending at
    `rerank` (query_id, neighbor_id, cos, rank). Shared by the x3f
    oracle and the hybrid x5b composition (extensions.py) — the whole
    coarse-quantize / residual-PQ / ADC / exact-rerank pipeline is one
    reusable SQL fragment, parameterized on the query-id cutoff."""
    return f"""t0 AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e0
      FROM embeddings
    ),
    t AS (
      SELECT vec_id,
             list_transform(e0, x -> x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END))
                 AS e
      FROM (SELECT vec_id, e0,
                   sqrt(list_sum(list_transform(e0, x -> x * x))) AS nrm
            FROM t0)
    ),
    cp AS (
      SELECT greatest(4, ceil(sqrt(count(*)))::BIGINT) AS nlist,
             greatest(4, ceil(1.5 * log2(greatest(4, ceil(sqrt(count(*)))::BIGINT)))::BIGINT)
                 AS nprobe,
             greatest(1, count(*) // greatest(4, ceil(sqrt(count(*)))::BIGINT))
                 AS cstride,
             greatest(1, count(*) // {_PQ_KSUB}) AS pqstride
      FROM t
    ),
    cc0 AS (
      SELECT t.vec_id AS lid, t.e AS c FROM t, cp WHERE t.vec_id % cp.cstride = 0
    ),
    ca0 AS (
      SELECT vec_id, e, lid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, lid) AS rn
      FROM (
        SELECT t.vec_id, t.e, cc0.lid, {_full_l2_sql('t.e', 'cc0.c')} AS d
        FROM t, cc0
      )
    ),
    cc AS (
      SELECT lid, [{_ivf_centroid_avg_sql(_DIM)}] AS c
      FROM ca0 WHERE rn = 1 GROUP BY lid
    ),
    ca AS (
      SELECT vec_id, e, lid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d, lid) AS rn
      FROM (
        SELECT t.vec_id, t.e, cc.lid, {_full_l2_sql('t.e', 'cc.c')} AS d
        FROM t, cc
      )
    ),
    corp AS (
      SELECT ca.vec_id, ca.lid,
             list_transform(range(1, {_DIM} + 1), i -> ca.e[i] - cc.c[i]) AS r
      FROM ca JOIN cc ON ca.lid = cc.lid WHERE ca.rn = 1
    ),
    rsub AS (
      SELECT vec_id, lid, rr.m::INTEGER AS m,
             list_slice(r, rr.m * {_PQ_SUBDIM} + 1,
                        rr.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS vs
      FROM corp, range({_PQ_M}) rr(m)
    ),
    rc0 AS (
      SELECT s.vec_id AS cid, s.m, s.vs AS cs
      FROM rsub s, cp WHERE s.vec_id % cp.pqstride = 0
    ),
    rs0 AS (
      SELECT s.vec_id, s.m, s.vs, c.cid, row_number() OVER (
          PARTITION BY s.vec_id, s.m
          ORDER BY {_pq_l2_sql('s.vs', 'c.cs')}, c.cid) AS rn
      FROM rsub s JOIN rc0 c ON s.m = c.m
    ),
    rc AS (
      SELECT cid, m, [{_PQ_CENT_AVG}] AS cs
      FROM rs0 WHERE rn = 1 GROUP BY cid, m
    ),
    rs AS (
      SELECT s.vec_id, s.lid, s.m, c.cid, row_number() OVER (
          PARTITION BY s.vec_id, s.m
          ORDER BY {_pq_l2_sql('s.vs', 'c.cs')}, c.cid) AS rn
      FROM rsub s JOIN rc c ON s.m = c.m
    ),
    rcodes AS (SELECT vec_id, lid, m, cid FROM rs WHERE rn = 1),
    probes AS (
      SELECT ca.vec_id AS query_id, ca.lid
      FROM ca, cp WHERE ca.vec_id < {n_queries} AND ca.rn <= cp.nprobe
    ),
    qres AS (
      SELECT p.query_id, p.lid,
             list_transform(range(1, {_DIM} + 1), i -> t.e[i] - cc.c[i]) AS qr
      FROM probes p
      JOIN t ON t.vec_id = p.query_id
      JOIN cc ON cc.lid = p.lid
    ),
    qsub AS (
      SELECT query_id, lid, rr.m::INTEGER AS m,
             list_slice(qr, rr.m * {_PQ_SUBDIM} + 1,
                        rr.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS vs
      FROM qres, range({_PQ_M}) rr(m)
    ),
    qd AS (
      SELECT q.query_id, q.lid, q.m, c.cid,
             {_pq_l2_sql('q.vs', 'c.cs')} AS dq
      FROM qsub q JOIN rc c ON q.m = c.m
    ),
    adc AS (
      SELECT qd.query_id, x.vec_id AS neighbor_id,
             round(sum(qd.dq) + 1e-9, 6) AS approx
      FROM rcodes x
      JOIN qd ON qd.lid = x.lid AND qd.m = x.m AND qd.cid = x.cid
      WHERE x.vec_id != qd.query_id
      GROUP BY qd.query_id, x.vec_id
    ),
    shortlist AS (
      SELECT query_id, neighbor_id, row_number() OVER (
          PARTITION BY query_id ORDER BY approx, neighbor_id) AS srank
      FROM adc
    ),
    rerank AS (
      SELECT sl.query_id, sl.neighbor_id,
             list_sum(list_transform(range(1, len(q.e0) + 1),
                                     i -> q.e0[i] * c.e0[i]))
             / (sqrt(list_sum(list_transform(q.e0, x -> x * x)))
                * sqrt(list_sum(list_transform(c.e0, x -> x * x)))) AS cos,
             row_number() OVER (
                 PARTITION BY sl.query_id
                 ORDER BY list_sum(list_transform(range(1, len(q.e0) + 1),
                                                  i -> q.e0[i] * c.e0[i]))
                          / (sqrt(list_sum(list_transform(q.e0, x -> x * x)))
                             * sqrt(list_sum(list_transform(c.e0, x -> x * x))))
                          DESC, sl.neighbor_id) AS rank
      FROM shortlist sl
      JOIN t0 q ON q.vec_id = sl.query_id
      JOIN t0 c ON c.vec_id = sl.neighbor_id
      WHERE sl.srank <= {_PQ_RERANK}
    )"""


_X3F_ORACLE = f"""
    WITH {_x3f_ctes(_N_QUERIES)}
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cosine
    FROM rerank WHERE rank <= {_TOP_K}
"""


@query("x3f_ivfpq_residual_search", oracle=_X3F_ORACLE, covers=["X3"])
def x3f_ivfpq_residual_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE IVF-PQ: coarse quantizer + PQ over RESIDUALS — the
    production ANN shape (FAISS IndexIVFPQ). vs flat PQ (x3e2):
    residuals u - c(list) have far less variance than raw vectors, so
    the same {_PQ_KSUB}-entry codebooks quantize them with lower
    error; vs IVF (x3c): the probed lists scan 8-byte codes instead of
    raw floats. Search = per-query lookup tables against the PROBED
    lists only (queries x nprobe x M x K rows, broadcast), ADC sum
    combined map-side, partition-local top-C, exact re-rank of the
    top-{_PQ_RERANK}. Sub-linear probes AND compressed scan — the
    100 TB configuration. FULL DuckDB oracle end to end (see
    _X3F_ORACLE comment). Delegates to api.ivfpq_topk_search."""
    from engage_spark.api import ivfpq_topk_search

    e = table(spark, sf_dir, "embeddings")
    return ivfpq_topk_search(
        e,
        e.filter(F.col("vec_id") < _N_QUERIES),
        k=_TOP_K,
        rerank=_PQ_RERANK,
        n_rows=_corpus_rows(sf_dir),
    )


# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
# cluster embeddings around centroids, then prune within-cluster pairs
# whose cosine exceeds a threshold — the embedding-space complement of
# the lexical MinHash/SimHash family, catching paraphrases and
# translations that share no n-grams.

_SEMD_COS = 0.35   # within-cluster prune threshold (matches _ND_COS)
_SEMD_OCC = 96     # target rows per cluster (k auto-scales from n)


def semdedup_params(n_rows: int) -> tuple[int, int]:
    """(k, seed_stride) for n corpus vectors: k = ceil(n / _SEMD_OCC)
    clusters (floor 4) keeps per-cluster occupancy CONSTANT as the
    corpus grows — the SemDeDup tractability claim is sum_k(n_k**2) =
    k * occ**2 = n * occ pair candidates, linear in n — and the
    centroids are the corpus vectors whose vec_id is a multiple of
    seed_stride = n // k (deterministic, reproducible on any cluster
    layout, same rule the DuckDB oracle applies). The same
    derive-params-from-corpus-size pattern as lsh_banding_params:
    a FIXED k is the occupancy**2 blow-up the LSH family had before
    round 5. The assignment is TWO-LEVEL (r11, api.semdedup_prune):
    only the ~sqrt(k) coarse seeds broadcast; the k centroids meet
    corpus vectors through a cogrouped per-cell gemm — driver memory
    O(sqrt(k)) at any corpus size."""
    import math

    k = max(4, math.ceil(n_rows / _SEMD_OCC))
    return k, max(1, n_rows // k)


@query(
    "x_semdedup_prune",
    # Full-value oracle for the TWO-LEVEL assignment (r11): the seed
    # rule (vec_id % stride == 0) and coarse rule (vec_id %
    # (stride*s2) == 0, s2 = floor(sqrt(k)) — matches Python isqrt for
    # any realistic k) derive from count(*) exactly as semdedup_params
    # does; centroids coarse-assign by cosine argmax (coarse seeds PIN
    # to their own cell), vectors coarse-assign the same way, the fine
    # assignment ranks only the vector's cell's centroids. Every argmax
    # breaks ties toward the smaller id on both sides. EXISTS
    # smaller-id within-cluster partner above the threshold -> pruned.
    oracle=f"""
    WITH t AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    params AS (
      SELECT stride, greatest(1, CAST(floor(sqrt(k)) AS BIGINT)) AS s2
      FROM (
        SELECT greatest(4, ceil(count(*) / {_SEMD_OCC}.0)::BIGINT) AS k,
               greatest(1, count(*) //
                   greatest(4, ceil(count(*) / {_SEMD_OCC}.0)::BIGINT)) AS stride
        FROM t
      )
    ),
    coarse AS (
      SELECT t.vec_id AS gid, t.e AS gc
      FROM t, params WHERE t.vec_id % (params.stride * params.s2) = 0
    ),
    cent0 AS (
      SELECT t.vec_id AS cid, t.e AS c
      FROM t, params WHERE t.vec_id % params.stride = 0
    ),
    cent AS (
      SELECT cid, c,
             CASE WHEN cid % (params.stride * params.s2) = 0
                  THEN cid ELSE gid END AS gid
      FROM (
        SELECT cid, c, gid, row_number() OVER (
            PARTITION BY cid ORDER BY cos DESC, gid) AS rn
        FROM (
          SELECT cent0.cid, cent0.c, coarse.gid,
                 list_sum(list_transform(range(1, {_DIM}+1),
                                         i -> cent0.c[i]*coarse.gc[i]))
                 / (sqrt(list_sum(list_transform(cent0.c, x->x*x)))
                    * sqrt(list_sum(list_transform(coarse.gc, x->x*x)))) AS cos
          FROM cent0, coarse
        )
      ), params WHERE rn = 1
    ),
    vca AS (
      SELECT vec_id, e, gid
      FROM (
        SELECT vec_id, e, gid, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, gid) AS rn
        FROM (
          SELECT t.vec_id, t.e, coarse.gid,
                 list_sum(list_transform(range(1, {_DIM}+1),
                                         i -> t.e[i]*coarse.gc[i]))
                 / (sqrt(list_sum(list_transform(t.e, x->x*x)))
                    * sqrt(list_sum(list_transform(coarse.gc, x->x*x)))) AS cos
          FROM t, coarse
        )
      ) WHERE rn = 1
    ),
    asg AS (
      SELECT vec_id, e, cluster_id, cos, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cluster_id) AS rn
      FROM (
        SELECT v.vec_id, v.e, cent.cid AS cluster_id,
               list_sum(list_transform(range(1, {_DIM}+1),
                                       i -> v.e[i]*cent.c[i]))
               / (sqrt(list_sum(list_transform(v.e, x->x*x)))
                  * sqrt(list_sum(list_transform(cent.c, x->x*x)))) AS cos
        FROM vca v JOIN cent ON cent.gid = v.gid
      )
    ),
    a AS (SELECT vec_id, e, cluster_id, cos FROM asg WHERE rn = 1),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM a b JOIN a s ON s.cluster_id = b.cluster_id AND s.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, {_DIM}+1), i -> s.e[i]*b.e[i]))
            / (sqrt(list_sum(list_transform(s.e, x->x*x)))
               * sqrt(list_sum(list_transform(b.e, x->x*x)))) >= {_SEMD_COS}
    )
    SELECT a.vec_id, a.cluster_id, round(a.cos + 1e-9, 6) AS cos_c,
           CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS is_kept
    FROM a LEFT JOIN dup d ON d.vec_id = a.vec_id
    """,
    covers=["X2", "X3"],
)
def x_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic near-dup pruning: assign every embedding to
    its nearest centroid, then within each cluster drop any vector
    that has a SMALLER-id partner at cosine >= 0.35 — keep-first
    semantic dedup. Output: (vec_id, cluster_id = seed vec_id, cos_c
    to the centroid, is_kept). Delegates to api.semdedup_prune (the
    arbitrary-DataFrame facade) with the corpus row count read from
    the parquet footer.

    Scale design (the SemDeDup point): clustering is what makes
    semantic dedup tractable — pair generation is a self-join on
    cluster_id, never all-pairs — and k AUTO-SCALES from the corpus
    row count (semdedup_params: k = n/96, hash-stride seed centroids)
    so per-cluster occupancy, and therefore pair volume per row, stays
    CONSTANT as the corpus grows; a fixed k (the first cut of this
    operator used the 10-label quantizer) re-grows occupancy linearly
    and the pair join quadratically — the r6 bench measured 11.98 s
    vs 1.3 s at sf0.1. Plan (r11 two-level): only the ~sqrt(k) COARSE
    seeds collect+broadcast (driver memory O(sqrt(k)) — the r10 k-row
    collect was the engine's one flagged scale ceiling); centroids and
    vectors coarse-assign in one Arrow pass each, then a cogrouped
    per-(cell, salt) Arrow gemm ranks each vector against only its
    cell's ~sqrt(k) centroids (n*sqrt(k) dots, was n*k), materialized
    ONCE (localCheckpoint) for its three consumers; the pair verify is
    the Arrow-vectorized cosine; the corpus shuffles once on
    (coarse_id, salt), once on cluster_id, once on vec_id. See
    scripts/measure_semdedup_scaling.py and SCALE.md §semdedup."""
    from engage_spark.api import semdedup_prune

    e = table(spark, sf_dir, "embeddings")
    return semdedup_prune(
        e, id_col="vec_id", emb_col="embedding",
        threshold=_SEMD_COS, n_rows=_corpus_rows(sf_dir),
    )


# ---------------------------------------------------------------------------
# Embedding compression: int8 scalar quantization (the standard storage
# / memory-bandwidth lever for vector search at corpus scale — a 64-dim
# float32 embedding shrinks 4x; IVF/LSH probing then scans int8).


@query(
    "x_embed_quantize",
    oracle="""
    WITH t AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, e,
               greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127.0
                   AS scale
        FROM t
    ),
    q AS (
        SELECT vec_id, e, scale,
               list_transform(e, x -> round(x / scale)::INT) AS qv
        FROM s
    ),
    d AS (
        SELECT vec_id, e, scale, qv,
               list_transform(qv, v -> v * scale) AS dq
        FROM q
    )
    SELECT vec_id,
           round(scale + 1e-9, 6) AS scale,
           list_sum(qv)::BIGINT AS q_sum,
           list_sum(list_transform(qv, v -> abs(v)))::BIGINT AS q_l1,
           round(list_max(list_transform(range(1, len(e) + 1),
                                         i -> abs(e[i] - dq[i]))) + 1e-9, 6)
               AS max_abs_err,
           round(list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * dq[i]))
                 / (sqrt(list_sum(list_transform(e, x -> x * x)))
                    * sqrt(list_sum(list_transform(dq, x -> x * x)))) + 1e-9, 6)
               AS cos_q
    FROM d
    """,
    covers=["X3"],
)
def x_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column with exact
    integer checksums (q_sum, q_l1) and reconstruction metrics
    (max_abs_err <= scale/2 by construction, cosine vs the original).

    Map-only codegen'd higher-order expressions — no shuffle, no
    Python; at 100 TB this runs at scan speed and the quantized
    arrays feed the ANN paths (x3b/x3c) at 1/4 the memory bandwidth.
    The dequantized array is materialized as a column ONCE and both
    metrics read it, so Spark and the oracle share the identical
    floating-point evaluation order (a*(v*scale), summed left to
    right) — bit-equal doubles, not just close ones."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    s = e.select(
        "vec_id",
        "e",
        (
            F.greatest(
                F.array_max(F.transform("e", lambda x: F.abs(x))), F.lit(1e-30)
            )
            / 127.0
        ).alias("scale"),
    )
    q = s.select(
        "vec_id",
        "e",
        "scale",
        F.expr("transform(e, x -> cast(round(x / scale) as int))").alias("qv"),
    )
    d = q.select(
        "vec_id",
        "e",
        "scale",
        "qv",
        F.expr("transform(qv, v -> v * scale)").alias("dq"),
    )
    dot = F.expr("aggregate(zip_with(e, dq, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x)")
    norm_e = F.sqrt(F.expr("aggregate(transform(e, x -> x * x), 0.0D, (acc, x) -> acc + x)"))
    norm_d = F.sqrt(F.expr("aggregate(transform(dq, x -> x * x), 0.0D, (acc, x) -> acc + x)"))
    return d.select(
        "vec_id",
        F.round(F.col("scale") + 1e-9, 6).alias("scale"),
        F.expr("aggregate(qv, 0L, (acc, v) -> acc + v)").alias("q_sum"),
        F.expr("aggregate(qv, 0L, (acc, v) -> acc + abs(v))").alias("q_l1"),
        F.round(
            F.array_max(F.expr("zip_with(e, dq, (a, b) -> abs(a - b))")) + 1e-9, 6
        ).alias("max_abs_err"),
        F.round(dot / (norm_e * norm_d) + 1e-9, 6).alias("cos_q"),
    )


# ---------------------------------------------------------------------------
# Embedding near-dup pairs, LSH-banded (the unblocked scale path that
# complements the label-blocked exact ground truth x_cosine_neardup_pairs)

_ND_BANDS = 4  # independent hash tables (floor; see lsh_banding_params)
_ND_ROWS = 4  # hyperplanes per table (floor; 16-bucket keys per band)
_ND_COS = 0.35  # verify threshold, matching the exact ground truth
_ND_TARGET_OCCUPANCY = 96  # target rows per bucket per band


def lsh_banding_params(n_rows: int) -> tuple[int, int]:
    """(bands, rows) sized to the corpus: rows = log2(n / target
    occupancy) clamped to the calibrated floor, bands raised alongside
    to buy back recall. Per-bucket candidate volume is occupancy² and
    occupancy = n / 2^rows, so FIXED rows go quadratic as the corpus
    grows (measured 7.8× wall-clock at 10× data with rows=4); each
    extra plane halves occupancy and quarters per-bucket pairs. The
    key-hashing stage itself costs O(n · bands · rows · dim), so bands
    trails rows by 2 rather than growing 1:1 — the measured total-cost
    minimum on a 10× blow-up (scripts/measure_lsh_scaling.py: (6,8)
    1.9×, (6,7) 2.8×, fixed (4,4) 7.8×; SCALE.md). Calibration: the
    recall-pytest domain (n ≤ ~1000) stays at the measured (4, 4).
    Deterministic: a pure function of the count, so the same corpus
    bands identically on any cluster layout."""
    import math

    rows = max(
        _ND_ROWS, round(math.log2(max(n_rows, 1) / _ND_TARGET_OCCUPANCY))
    )
    bands = max(_ND_BANDS, rows - 2)
    return bands, rows


_NROWS_CACHE: dict[str, int] = {}


def _corpus_rows(sf_dir: str) -> int:
    """Embeddings-table row count, used to size LSH/IVF/SemDeDup
    parameters. Spark-native since round 7 — a `count()` job, which on
    parquet reduces to row-group metadata (no column is materialized)
    and works on ANY Hadoop-FS URI, where the previous pyarrow footer
    read assumed a driver-local path. Cached per sf_dir; in production
    this is a catalog statistic. Falls back to the pyarrow local peek
    only when called without an active SparkSession."""
    if sf_dir not in _NROWS_CACHE:
        spark = SparkSession.getActiveSession()
        if spark is not None:
            _NROWS_CACHE[sf_dir] = spark.read.parquet(
                f"{sf_dir}/embeddings.parquet"
            ).count()
        else:
            import pyarrow.parquet as pq

            _NROWS_CACHE[sf_dir] = sum(
                pq.ParquetFile(part).metadata.num_rows
                for part in _parquet_parts(f"{sf_dir}/embeddings.parquet")
            )
    return _NROWS_CACHE[sf_dir]


def _nd_band_keys(
    emb_col: str, bands: int = _ND_BANDS, rows: int = _ND_ROWS, dim: int = _DIM
) -> list[F.Column]:
    """One bucket key per band: the sign-bit pattern of that band's
    hyperplanes. A pair collides if ANY band key matches — the
    multi-table (banding) form of hyperplane LSH, the cosine analogue
    of MinHash banding: P(candidate) = 1 - (1 - p^rows)^bands with
    p = 1 - theta/pi.

    SIZING RULE (the 100 TB story): candidate volume per band is
    ~ sum over buckets of occupancy², and occupancy = n / 2^rows, so
    at FIXED rows the candidate count grows QUADRATICALLY with corpus
    size — measured 7.8x wall-clock for a 10x density-preserving
    corpus at rows=4. `rows` must grow with log2(n) — each extra plane
    halves bucket occupancy and quarters per-bucket pair count — with
    `bands` raised alongside to buy back the recall the sharper
    buckets cost: at 10x, (bands=6, rows=7) measures 1.6x wall-clock
    (SCALE.md). The 4x4 default fits the driver-testdata scale the
    registered query and its recall pytest are calibrated to.

    `dim` must match the embedding dimensionality: zip_with null-pads
    the shorter array, and without the coalesce below a single null
    would poison the whole dot product, collapsing every vector into
    bucket 0 of every band — a silent full cross product. The coalesce
    makes a dim mismatch degrade to hashing the common prefix of
    dimensions (still a valid LSH; the exact-cosine verify keeps
    precision exact) instead of degenerating."""
    planes = _planes(bands * rows, dim)
    q = f"`{emb_col}`"
    keys = []
    # each band key compiles to ONE parsed SQL expression — the
    # F.array(*[F.lit(v)...]) form paid ~65 py4j round trips per plane
    # (r15 optimization round, same rewrite as lsh_bucket; literals and
    # tree identical, null-coalesce semantics preserved)
    for b in range(bands):
        terms = []
        for r in range(rows):
            arr = _sql_double_array(planes[b * rows + r])
            dot = (
                f"aggregate(zip_with({q}, {arr}, "
                "(a, pv) -> CAST(a AS DOUBLE) * pv), 0.0D, "
                "(acc, v) -> acc + coalesce(v, 0.0D))"
            )
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << r} ELSE 0 END)")
        keys.append(F.expr(" + ".join(["0"] + terms)))
    return keys


def cosine_arrow(a_col: str, b_col: str):
    """Arrow-vectorized cosine of two array<float> columns — one numpy
    batch product per Arrow batch instead of per-element interpreted
    aggregate/zip_with. Measured ~2x end-to-end on the embed-LSH
    verify stage at sf0.1 (5.5s -> 2.9s, identical rounded output);
    use it where the cosine runs over a LARGE candidate set. A pair
    with mismatched lengths scores NaN (cosine_expr's zip_with
    null-poisoning yields NULL) — either way a >= threshold verify
    drops it; zero-norm vectors score NaN on both paths."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        if n == 0:
            return pd.Series([], dtype="float64")
        la = np.fromiter((len(v) for v in a), dtype=np.int64, count=n)
        lb = np.fromiter((len(v) for v in b), dtype=np.int64, count=n)
        if (la == la[0]).all() and (lb == la[0]).all():
            m_a = np.stack([np.asarray(v, dtype=np.float64) for v in a])
            m_b = np.stack([np.asarray(v, dtype=np.float64) for v in b])
            num = (m_a * m_b).sum(1)
            den = np.sqrt((m_a * m_a).sum(1)) * np.sqrt((m_b * m_b).sum(1))
            with np.errstate(divide="ignore", invalid="ignore"):
                return pd.Series(num / den)
        out = np.empty(n)
        for i, (x, y) in enumerate(zip(a, b)):
            if len(x) != len(y):
                out[i] = np.nan
                continue
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            den = np.sqrt((xv * xv).sum()) * np.sqrt((yv * yv).sum())
            out[i] = (xv * yv).sum() / den if den else np.nan
        return pd.Series(out)

    return _cos(a_col, b_col)


# below this many planes per vector the all-JVM expression path keeps
# the plan Python-free at negligible cost; at the (4,4)=16-plane floor
# and above, one Arrow-batched BLAS gemm per batch measured ~2x faster
# end-to-end (same-session A/B at 1x and 10x corpus)
_ND_JVM_PLANE_BUDGET = 16


def nd_band_keys_column(df, emb_col: str, bands: int, rows: int, dim: int):
    """array<int> Column of per-band bucket keys, choosing the physical
    kernel by total plane count:

    - bands*rows < _ND_JVM_PLANE_BUDGET: pure JVM codegen expressions
      (`_nd_band_keys`) — no Python workers in the plan, for
      small custom configs where the interpreted cost is negligible.
    - at the calibrated floor (4x4) and larger: a vectorized
      pandas_udf computing ALL keys per Arrow batch as ONE matrix
      product ((batch x dim) @ (dim x bands*rows) BLAS gemm, then
      sign-bit packing) — the per-plane interpreted aggregate/zip_with
      cost grows O(bands*rows*dim) per row and loses ~2x even at the
      floor config, more once banding scales with log2(n).

    Key parity between the two kernels is exact for non-boundary dot
    products and pinned by test (sign flips need |dot| at float64
    summation-order noise, ~1e-16 — and a flipped near-zero plane bit
    only moves a CANDIDATE between buckets; the exact-cosine verify
    keeps emitted pairs correct either way). Dim mismatches degrade to
    prefix-dimension hashing in both kernels."""
    if bands * rows < _ND_JVM_PLANE_BUDGET:
        return F.array(*_nd_band_keys(emb_col, bands, rows, dim))

    from pyspark.sql.pandas.functions import pandas_udf

    planes = np.array(_planes(bands * rows, dim), dtype=np.float64)
    weights = (1 << np.arange(rows)).astype(np.int64)
    bc = df.sparkSession.sparkContext.broadcast((planes, weights))

    @pandas_udf("array<int>")
    def _band_keys(emb: pd.Series) -> pd.Series:
        mat_planes, wts = bc.value
        m = np.stack([np.asarray(v, dtype=np.float64)[:dim] for v in emb])
        if m.shape[1] < dim:  # short vectors: prefix-hash like zip_with
            m = np.pad(m, ((0, 0), (0, dim - m.shape[1])))
        signs = (m @ mat_planes.T) > 0
        keys = signs.reshape(len(m), bands, rows) @ wts
        return pd.Series([k.astype(np.int32) for k in keys])

    return _band_keys(emb_col)


# x_embed_lsh_neardup_pairs' full oracle (added r6 — the flagship
# near-dup operator's hash family turned out to be SQL-expressible
# after all, with the x3b techniques): the banding planes are the same
# prefix-stable LCG literal table, and lsh_banding_params is a pure
# function of the corpus row count, so the twin derives (bands, rows)
# from count(*), recomputes every per-band sign-bit key over the
# inlined plane table, bucket-joins per band, dedupes candidate pairs,
# and applies the same round-then-threshold exact-cosine verify.
# ORACLE DOMAIN: the inlined table carries 48 planes = enough for
# bands*rows at any corpus below ~35k vectors (rows=8, bands=6);
# driver (500) and pytest (50) scales sit far inside. The Spark side
# is unlimited (planes generate on demand). Round 9: the bucket
# self-join is size-capped on BOTH sides (_capped_pairs_sql twin of
# _capped_bucket_pairs — star edges above the cap), closing the last
# uncapped member of the near-dup family. Python round() is
# banker's vs DuckDB's half-away-from-zero — they differ only when
# log2(n/96) lands EXACTLY on .5, which no integer n produces.
_ND_ORACLE_PLANES = 48
_ND_PLANE_ROWS = ",\n".join(
    "({}, [{}])".format(j, ", ".join(repr(v) for v in row))
    for j, row in enumerate(_planes(_ND_ORACLE_PLANES))
)


@query(
    "x_embed_lsh_neardup_pairs",
    oracle=f"""
    WITH t AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    prm AS (
      SELECT greatest({_ND_ROWS}, round(log2(count(*) / {_ND_TARGET_OCCUPANCY}.0))::BIGINT)
                 AS rws,
             greatest({_ND_BANDS},
                 greatest({_ND_ROWS}, round(log2(count(*) / {_ND_TARGET_OCCUPANCY}.0))::BIGINT) - 2)
                 AS bnds
      FROM t
    ),
    planes(j, p) AS (VALUES {_ND_PLANE_ROWS}),
    keys AS (
      SELECT t.vec_id, (planes.j // prm.rws) AS band,
             sum(CASE WHEN list_sum(list_transform(range(1, len(t.e)+1),
                          i -> t.e[i]*planes.p[i])) > 0
                      THEN 1 << (planes.j % prm.rws) ELSE 0 END)::BIGINT AS key
      FROM t, planes, prm
      WHERE planes.j < prm.bnds * prm.rws
      GROUP BY t.vec_id, (planes.j // prm.rws)
    ),
    {_capped_pairs_sql("keys", "band, key", "vec_id", "vec_a", "vec_b")},
    scored AS (
      SELECT c.vec_a, c.vec_b,
             round(list_sum(list_transform(range(1, len(ea.e)+1),
                                           i -> ea.e[i]*eb.e[i]))
                   / (sqrt(list_sum(list_transform(ea.e, x->x*x)))
                      * sqrt(list_sum(list_transform(eb.e, x->x*x)))), 6)
                 AS cosine
      FROM cand c
      JOIN t ea ON ea.vec_id = c.vec_a
      JOIN t eb ON eb.vec_id = c.vec_b
    )
    SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {_ND_COS}
    """,
    covers=["X2", "X3"],
)
def x_embed_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs WITHOUT a blocking key: banded
    hyperplane LSH generates candidates, exact cosine verifies at the
    same 0.35 threshold as the ground-truth query. The banding shuffle
    carries only (vec_id, band, key) — the embedding arrays never
    leave the first map stage and rejoin only for surviving
    candidates, exactly the MinHash-LSH shuffle-hygiene story
    (llm_dedup.minhash_candidate_pairs).

    Banding AUTO-SCALES with the corpus (lsh_banding_params over the
    parquet-footer row count): per-bucket candidate volume is
    occupancy², so the fixed 4×4 that fits test scale measured 7.8×
    wall-clock at 10× data, vs 1.6× once rows grows with log2(n)
    (SCALE.md). At the recall-pytest scale the derived params equal
    the calibrated (4, 4). Recall vs the exact pairs is asserted in
    pytest; FULL DuckDB oracle since r6 (the hash family IS
    SQL-expressible — see the oracle comment; banding params derive
    from count(*) on both sides, candidate sets and rounded cosines
    match exactly at both driver scales)."""
    from engage_spark.api import embed_lsh_near_dup_pairs

    e = table(spark, sf_dir, "embeddings")
    bands, rows = lsh_banding_params(_corpus_rows(sf_dir))
    return embed_lsh_near_dup_pairs(
        e, id_col="vec_id", emb_col="embedding", threshold=_ND_COS,
        bands=bands, rows=rows, dim=_DIM,
    )


# ---------------------------------------------------------------------------
# Embedding-corpus statistics profile (pipeline monitoring: embedding
# DRIFT — a model/version change upstream shifts norms and per-dim
# means long before any downstream metric moves)


@query(
    "x_embed_profile",
    oracle=f"""
    WITH t AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e,
             sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                 AS nrm
      FROM embeddings
    )
    SELECT count(*)::BIGINT AS n_vectors,
           min(len(e))::BIGINT AS dim_min,
           max(len(e))::BIGINT AS dim_max,
           round(avg(nrm) + 1e-9, 6) AS norm_mean,
           round(min(nrm) + 1e-9, 6) AS norm_min,
           round(max(nrm) + 1e-9, 6) AS norm_max,
           round(avg(e[1]) + 1e-9, 6) AS dim0_mean,
           round(avg(e[{_DIM}]) + 1e-9, 6) AS dim_last_mean,
           round(avg(list_sum(e) / len(e)) + 1e-9, 6) AS component_mean,
           sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_norm
    FROM t
    """,
    covers=["X3", "A5"],
)
def x_embed_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus statistics profile — the drift monitor an
    embedding pipeline runs per shipment (an upstream model swap or a
    broken normalization shifts norms/means before any downstream
    dedup/search metric reacts): vector count, dim bounds (a ragged
    dim is a corrupt shipment), norm mean/min/max, first/last-dim and
    overall component means, and the zero-norm count (dead vectors
    poison cosine). One map-only pass — every statistic is a JVM
    higher-order expression over the array, partial-aggregated into a
    single output row; nothing corpus-sized shuffles."""
    e = table(spark, sf_dir, "embeddings")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(ed, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    t = e.select(
        ed.alias("e"),
        nrm.alias("nrm"),
        F.size("embedding").alias("d"),
    )
    comp_mean = F.aggregate("e", F.lit(0.0), lambda a, x: a + x) / F.col("d")
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.min("d").cast("long").alias("dim_min"),
        F.max("d").cast("long").alias("dim_max"),
        F.round(F.avg("nrm") + F.lit(1e-9), 6).alias("norm_mean"),
        F.round(F.min("nrm") + F.lit(1e-9), 6).alias("norm_min"),
        F.round(F.max("nrm") + F.lit(1e-9), 6).alias("norm_max"),
        F.round(F.avg(F.col("e")[0]) + F.lit(1e-9), 6).alias("dim0_mean"),
        F.round(F.avg(F.col("e")[_DIM - 1]) + F.lit(1e-9), 6).alias("dim_last_mean"),
        F.round(F.avg(comp_mean) + F.lit(1e-9), 6).alias("component_mean"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_norm"),
    )
