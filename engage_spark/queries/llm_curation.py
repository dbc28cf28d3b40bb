"""Corpus-curation operators for LLM training-data pipelines (SURVEY.md §2.12).

No reference counterpart (the reference is a COVID pipeline); these are
the cluster-scale curation passes a pre-training corpus needs beyond
pairwise dedup (llm_dedup): near-dup *clustering* via connected
components, PII redaction, deterministic hash-based stratified
sampling, mixture/token-budget planning (natural, temperature-scaled,
and materialized into resampled corpora), percentile quality gating,
sequence packing (flat and shard-parallel), and length histograms.

Scale notes (the 100 TB story):
  - Connected components is iterative min-label propagation — each
    round is one shuffle on node id, O(diameter) rounds (near-dup
    clusters are shallow; 3-5 rounds in practice). Lineage is cut with
    iter_checkpoint per round so the plan doesn't grow unboundedly
    (executor-local by default; the reliable-checkpoint conf writes
    rounds to a checkpoint dir so 100 TB runs survive executor loss).
  - Sampling/redaction/histograms are map-only expression pipelines —
    no shuffle, whole-stage codegen, no Python in the path.
  - The sampler is HASH-deterministic (md5 threshold), not rand():
    re-running on the same corpus selects the same rows on any cluster
    layout — reproducible training mixes, resumable jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engage_spark.checkpointing import iter_checkpoint
from engage_spark.io import spread_small_scan, table
from engage_spark.queries.llm_dedup import _shingles_duck, _shingles_spark, _TOKS_DUCK, _TOKS_SPARK
from engage_spark.queries.llm_text import _LANG_MARKERS, _STOPWORDS, _sql_list
from engage_spark.registry import query

# ---------------------------------------------------------------------------
# Connected components (near-dup clustering)


def connected_components(
    nodes: DataFrame, edges: DataFrame, node_col: str = "node",
    src: str = "src", dst: str = "dst", max_iter: int = 25,
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """Min-label propagation connected components.

    nodes: one column `node_col`; edges: (`src`, `dst`) undirected.
    Returns (node, component) where component = min node id reachable.

    Each iteration: join labels onto symmetric edges, take the min
    neighbor label, keep the smaller of (own, neighbor-min). Stops when
    no label changes. One shuffle per round keyed on node id; rounds =
    graph diameter. For billion-edge graphs swap in the large-star/
    small-star variant (same contract); for dedup clusters (shallow,
    star-like around a keeper) plain propagation converges in a few
    rounds, so it is the default.

    Per-round lineage cuts go through iter_checkpoint:
    reliable_checkpoint=True (or the spark.engage_spark.checkpoint.
    reliable conf) writes each round to the configured checkpoint dir
    so a multi-hour 100 TB run survives executor loss; the default
    localCheckpoint is executor-local (faster, not fault-tolerant).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = iter_checkpoint(sym.distinct(), reliable_checkpoint)

    labels = iter_checkpoint(
        nodes.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("component")
        ),
        reliable_checkpoint,
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        # one materializing job per round: the checkpointed frame carries
        # the new label AND a per-row changed flag, so convergence
        # detection is a cheap scan of the checkpoint instead of a second
        # join of old vs new labels (which doubled the per-round cost)
        new_comp = F.least(F.col("component"), F.coalesce("nbr_min", "component"))
        staged = iter_checkpoint(
            labels.join(nbr_min, labels.node == nbr_min.a, "left").select(
                "node",
                new_comp.alias("new_component"),
                (new_comp < F.col("component")).cast("int").alias("__chg"),
            ),
            reliable_checkpoint,
        )
        changed = staged.agg(F.sum("__chg")).first()[0] or 0
        labels = staged.select("node", F.col("new_component").alias("component"))
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components: {max_iter} iterations exhausted with "
            f"{changed} labels still changing — components may be "
            "under-merged (graph diameter exceeds max_iter). Raise "
            "max_iter or switch to large-star/small-star.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def connected_components_star(
    nodes: DataFrame, edges: DataFrame, node_col: str = "node",
    src: str = "src", dst: str = "dst", max_iter: int = 50,
    reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """Alternating large-star / small-star connected components — the
    O(log² n)-round algorithm for graphs whose diameter defeats plain
    label propagation (public algorithm: Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014).

    Both operations are one groupBy per round over the edge list:
      - large-star: for each node u, connect every strictly-larger
        neighbor to m = min(u, neighbors(u));
      - small-star: connect every neighbor <= u (and u) to m.
    Each round strictly shrinks the sum of parent pointers; convergence
    = the edge multiset is a star forest (every edge (min-root, node)).
    State is the edge list itself — no per-node label table — and every
    round is shuffle-on-node-id, so the 100 TB story matches the
    propagation variant's while the round count drops from O(diameter)
    to O(log² n). Returns (node, component) like connected_components.
    """
    e = iter_checkpoint(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        reliable_checkpoint,
    )

    def large_star(e: DataFrame) -> DataFrame:
        # operate on the SYMMETRIZED neighborhood of each u; emit
        # (v, min(N(u) ∪ {u})) for every strictly larger neighbor v
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        nbr = sym.groupBy("a").agg(F.min("b").alias("mn"))
        m = F.least(F.col("a"), F.col("mn"))
        return (
            sym.join(nbr, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), m.alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient every edge high->low, group the smaller neighbors;
        # connect them AND u itself to the minimum
        o = e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).filter(F.col("a") != F.col("b"))
        nbr = o.groupBy("a").agg(F.min("b").alias("mn"))
        joined = o.join(nbr, "a")
        out = joined.select(F.col("b").alias("a"), F.col("mn").alias("b")).union(
            joined.select("a", F.col("mn").alias("b"))
        )
        return out.filter(F.col("a") != F.col("b")).distinct()

    prev_sig = None
    for _ in range(max_iter):
        e = iter_checkpoint(small_star(large_star(e)), reliable_checkpoint)
        # fixed point: the edge multiset stops changing once every edge
        # is (node -> component root); (count, sum) is a cheap signature
        # and sum(a+b) strictly decreases while any merge remains
        cur = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("a") + F.col("b")), F.lit(0)).alias("s"),
        ).first()
        sig = (cur["n"], cur["s"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        import warnings

        warnings.warn(
            f"connected_components_star: {max_iter} rounds exhausted before "
            "the edge list stabilized — components may be under-merged.",
            RuntimeWarning,
            stacklevel=2,
        )
    # star forest: every remaining edge is (node -> its component root)
    roots = e.groupBy("a").agg(F.min("b").alias("component")).select(
        F.col("a").alias("node"), "component"
    )
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(roots, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )


_CC_EDGE_THRESHOLD = 0.5

# shared by x_dedup_components (min-label propagation) and
# x_dedup_components_star (large/small-star): both run on the SAME
# exact trigram-Jaccard edge set and must produce the SAME components,
# so one recursive-CTE transitive closure oracles both algorithms.
_CC_EXACT_ORACLE = f"""
    WITH RECURSIVE
    t AS (SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {_shingles_duck(3)} AS sh FROM t),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))
              / len(list_distinct(a.sh || b.sh))::DOUBLE >= {_CC_EDGE_THRESHOLD}
    ),
    sym AS (SELECT doc_a s, doc_b d FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
    walk(node, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.node, e.d FROM walk w JOIN sym e ON e.s = w.reach
    )
    SELECT node AS doc_id, min(reach)::BIGINT AS component_id,
           CASE WHEN node = min(reach) THEN 1 ELSE 0 END AS is_keeper
    FROM walk GROUP BY node
    """


def _exact_trigram_edges(d: DataFrame) -> DataFrame:
    """Lang-blocked exact trigram-Jaccard >= threshold edge set — the
    ground-truth edges both clustering-algorithm queries consume."""
    sdf = d.select("doc_id", "lang", F.expr(_TOKS_SPARK).alias("__toks")).select(
        "doc_id", "lang", _shingles_spark(3, "__toks").alias("sh")
    )
    a = sdf.select(F.col("doc_id").alias("doc_a"), "lang", F.col("sh").alias("sh_a"))
    b = sdf.select(F.col("doc_id").alias("doc_b"), "lang", F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    return (
        a.join(b, on="lang")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(jac >= _CC_EDGE_THRESHOLD)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )


@query("x_dedup_components", oracle=_CC_EXACT_ORACLE, covers=["X2"])
def x_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: trigram-Jaccard >= 0.5 pairs (lang-blocked,
    same ground truth as x_ngram_jaccard_pairs) become edges; connected
    components assigns every document a cluster id = min doc_id
    reachable; `is_keeper` marks the canonical survivor per cluster.
    This is the dedup decision step the pairwise queries feed at scale
    (there the edges come from MinHash-LSH instead of the exact join).
    Oracle = DuckDB recursive CTE transitive closure."""
    d = table(spark, sf_dir, "documents")
    edges = _exact_trigram_edges(d)
    comp = connected_components(d.select("doc_id"), edges, node_col="doc_id")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        F.when(F.col("node") == F.col("component"), 1).otherwise(0).alias("is_keeper"),
    )


_KEEP_BEST_ORACLE = f"""
    WITH RECURSIVE
    t AS (SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {_shingles_duck(3)} AS sh FROM t),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))
              / len(list_distinct(a.sh || b.sh))::DOUBLE >= {_CC_EDGE_THRESHOLD}
    ),
    sym AS (SELECT doc_a s, doc_b d FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
    walk(node, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.node, e.d FROM walk w JOIN sym e ON e.s = w.reach
    ),
    comp AS (
        SELECT node AS doc_id, min(reach)::BIGINT AS component_id
        FROM walk GROUP BY node
    ),
    q0 AS (SELECT doc_id, n_chars, {_TOKS_DUCK} AS qtoks FROM documents),
    qual AS (
        SELECT doc_id,
               round(len(list_filter(qtoks,
                         x -> list_contains([{_sql_list(_STOPWORDS)}], x)))
                     / len(qtoks)::DOUBLE, 6) AS stopword_ratio,
               CASE WHEN n_chars BETWEEN 100 AND 20000
                     AND len(list_filter(qtoks,
                             x -> list_contains([{_sql_list(_STOPWORDS)}], x)))
                         / len(qtoks)::DOUBLE >= 0.01
                    THEN 1 ELSE 0 END AS quality_keep
        FROM q0
    ),
    rankedq AS (
        SELECT c.doc_id, c.component_id,
               row_number() OVER (
                   PARTITION BY c.component_id
                   ORDER BY q.quality_keep DESC, q.stopword_ratio DESC,
                            c.doc_id
               ) AS rn
        FROM comp c JOIN qual q USING (doc_id)
    ),
    keep AS (SELECT component_id, doc_id AS keeper_id FROM rankedq WHERE rn = 1)
    SELECT r.doc_id, r.component_id, k.keeper_id,
           CASE WHEN r.doc_id = k.keeper_id THEN 1 ELSE 0 END AS is_keeper
    FROM rankedq r JOIN keep k USING (component_id)
    """


@query("x_dedup_keep_best", oracle=_KEEP_BEST_ORACLE, covers=["X2", "X4"])
def x_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE dedup retention: the same near-dup components as
    x_dedup_components, but the survivor per cluster is the document
    that wins on the quality heuristics (quality_keep gate first, then
    stopword_ratio — the natural-prose signal — with doc_id as the
    deterministic tie-break), not the arbitrary min-id. This is the
    retention policy curation pipelines actually want: when a re-crawl
    collects both a boilerplate-wrapped and a clean copy of a page,
    keep the clean one. Scale shape: the per-component window and the
    keeper join share the component_id hash partitioning (one exchange
    serves both), and component sizes are bounded upstream by the LSH
    star-cap in the production edge path. Oracle = transitive-closure
    CTE + the shared quality expressions + the same argmax window."""
    from engage_spark.queries.llm_text import quality_select

    d = table(spark, sf_dir, "documents")
    edges = _exact_trigram_edges(d)
    comp = connected_components(d.select("doc_id"), edges, node_col="doc_id").select(
        F.col("node").alias("doc_id"), F.col("component").alias("component_id")
    )
    q = quality_select(d).select("doc_id", "quality_keep", "stopword_ratio")
    j = comp.join(q, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("quality_keep"), F.desc("stopword_ratio"), F.col("doc_id")
    )
    ranked = j.withColumn("__rn", F.row_number().over(w))
    keepers = ranked.filter(F.col("__rn") == 1).select(
        "component_id", F.col("doc_id").alias("keeper_id")
    )
    return ranked.join(keepers, "component_id").select(
        "doc_id",
        "component_id",
        "keeper_id",
        F.when(F.col("doc_id") == F.col("keeper_id"), 1)
        .otherwise(0)
        .alias("is_keeper"),
    )


@query(
    "x_cluster_safe_split",
    # same recursive-CTE transitive closure as _CC_EXACT_ORACLE, with
    # the md5-threshold split applied to the COMPONENT id (thresholds
    # are the 8-hex cutoffs of 5% / 10% of 2^32 — the hash_sample
    # convention; md5 hex is lowercase in both engines)
    oracle=f"""
    WITH RECURSIVE
    t AS (SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {_shingles_duck(3)} AS sh FROM t),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))
              / len(list_distinct(a.sh || b.sh))::DOUBLE >= {_CC_EDGE_THRESHOLD}
    ),
    sym AS (SELECT doc_a s, doc_b d FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
    walk(node, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.node, e.d FROM walk w JOIN sym e ON e.s = w.reach
    ),
    comp AS (
        SELECT node AS doc_id, min(reach)::BIGINT AS component_id
        FROM walk GROUP BY node
    )
    SELECT doc_id, component_id,
           CASE WHEN substr(md5('split-v1:' || component_id::VARCHAR), 1, 8)
                     < '0ccccccc' THEN 'test'
                WHEN substr(md5('split-v1:' || component_id::VARCHAR), 1, 8)
                     < '19999999' THEN 'val'
                ELSE 'train' END AS split
    FROM comp
    """,
    covers=["X2", "M7"],
)
def x_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split (api.cluster_safe_split): the
    split is a pure md5-threshold function of each document's near-dup
    COMPONENT id (trigram-Jaccard >= 0.5 components, the
    x_dedup_components ground truth), so paraphrases and re-crawls of
    one document always share a split — a row-level hash split
    scatters near-duplicate clusters across train AND test, leaking
    held-out content into training. 90/5/5 by component; deterministic
    on any cluster layout, nested-sample discipline as hash_sample.
    This registered form runs on the exact-edge ground truth (oracle-
    checkable); at corpus scale feed api.cluster_safe_split the
    MinHash-LSH edge set instead (api.minhash_near_dup_pairs — the
    x_dedup_components_lsh path, banded, never all-pairs)."""
    from engage_spark.api import cluster_safe_split

    d = table(spark, sf_dir, "documents")
    return cluster_safe_split(
        d.select("doc_id"), _exact_trigram_edges(d), id_col="doc_id"
    )


# LSH-fed clustering (upgraded r6 from rows-only): the edge set is the
# md5-family MinHash banding pipeline — itself fully SQL-expressible
# (llm_dedup._MH32_PAIRS_SQL, the x2d oracle) — so the twin composes
# that pair SELECT as a CTE and runs the same recursive transitive
# closure over it (attached at module end, after the llm_dedup
# import). This oracles the REAL LSH-fed pipeline including the
# banding's recall misses, not an idealized exact-edge stand-in.
@query("x_dedup_components_lsh", oracle=None, covers=["X2"])
def x_dedup_components_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for near-dup clustering: edges come from
    MinHash-LSH banding (bucketed, never all-pairs) instead of the
    exact lang-blocked O(n²) join that backs the exact-edge queries.
    Same decision contract: (doc_id, component_id, is_keeper). At
    100 TB the exact join is quadratic within a lang block (`en` ≈
    most of a crawl); this variant's edge cost is bounded by banding
    fan-in. Since r6 the edges use the md5 hash family
    (llm_dedup.minhash_md5_pairs) so the WHOLE pipeline — banding,
    verify, closure — carries a full DuckDB oracle; the xxhash fast
    path remains available via api.minhash_near_dup_pairs for
    corpus-scale hashing throughput."""
    from engage_spark.queries.llm_dedup import minhash_md5_pairs

    d = table(spark, sf_dir, "documents")
    edges = minhash_md5_pairs(
        d, jaccard_threshold=_CC_EDGE_THRESHOLD
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(d.select("doc_id"), edges, node_col="doc_id")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        F.when(F.col("node") == F.col("component"), 1).otherwise(0).alias("is_keeper"),
    )


@query("x_dedup_components_star", oracle=_CC_EXACT_ORACLE, covers=["X2"])
def x_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering via large-star/small-star — the variant
    whose round count is O(log² n) instead of O(graph diameter), for
    corpora whose duplicate graphs chain (forum quotes, boilerplate
    mutations) rather than cluster star-shaped. Runs on the SAME exact
    trigram-Jaccard edges as x_dedup_components (upgraded r6 from
    rows-only-on-LSH-edges): components are edge-set + algorithm
    functions, so both algorithm queries share ONE recursive-CTE
    oracle and the STAR ALGORITHM itself now has a hard hash check
    (previously only pytest parity on planted/path/random graphs —
    those remain). The LSH-fed scale path stays registered as
    x_dedup_components_lsh."""
    d = table(spark, sf_dir, "documents")
    edges = _exact_trigram_edges(d)
    comp = connected_components_star(d.select("doc_id"), edges, node_col="doc_id")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        F.when(F.col("node") == F.col("component"), 1).otherwise(0).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# PII redaction

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"

# The corpus is synthetic word salad with no PII, so both sides plant
# deterministic PII on every third document before redacting — the
# operator is exercised on real matches, and the oracle plants the
# identical bytes.
_PLANT_DUCK = """
    CASE WHEN doc_id % 3 = 0
         THEN text || ' contact user' || doc_id::VARCHAR
              || '@example.com from 10.' || (doc_id % 200)::VARCHAR
              || '.0.' || (doc_id % 250)::VARCHAR
         ELSE text END
"""


@query(
    "x_pii_redact",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_PLANT_DUCK} AS text FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(text, '{_IP_RE}'))::BIGINT AS n_ips,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
    FROM t
    """,
    covers=["X4"],
)
def x_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and mask emails and IPv4 addresses with
    regex (RE2-compatible patterns so Spark's Java regex and DuckDB's
    RE2 agree). Map-only, codegen'd; at 100 TB this is a pure scan →
    project stage. Output carries md5 of the redacted text so the hash
    compare covers the full rewritten payload."""
    d = table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 250).cast("string"),
        ),
    ).otherwise(F.col("text"))
    t = d.select("doc_id", planted.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_IP_RE), 0))
        .cast("long")
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# C4-style corpus-frequency line dedup ("remove any line that occurs
# >= 3 times in the corpus" — the boilerplate filter C4/FineWeb run
# before span dedup). The synthetic corpus has no newlines, so both
# sides plant deterministic boilerplate (the x_pii_redact technique):
# a header line on every doc_id % 4 == 0 and a footer on % 3 == 0 —
# corpus frequencies far above the threshold — so the operator is
# exercised on real matches and the oracle plants identical bytes.

_LINE_FREQ_MIN = 3
_LINE_HEADER = "subscribe to our newsletter for daily updates"
_LINE_FOOTER = "all rights reserved see legal notice for terms"


@query(
    "x_line_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 4 = 0 THEN '{_LINE_HEADER}' || chr(10)
                   ELSE '' END)
             || text
             || (CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_LINE_FOOTER}'
                      ELSE '' END) AS pt
      FROM documents
    ),
    base AS (SELECT doc_id, string_split(pt, chr(10)) AS lines FROM t),
    lf AS (
      SELECT line, count(*) AS freq
      FROM (SELECT unnest(lines) AS line FROM base) GROUP BY line
    ),
    blocked AS (SELECT list(line) AS bl FROM lf WHERE freq >= {_LINE_FREQ_MIN}),
    o AS (
      SELECT doc_id, len(lines)::BIGINT AS n_lines,
             list_filter(lines, l -> NOT list_contains(bl, l)) AS kept
      FROM base, blocked
    )
    SELECT doc_id, n_lines, len(kept)::BIGINT AS n_kept,
           md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5
    FROM o
    """,
    covers=["X1", "X4"],
)
def x_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency line dedup: split every document into lines,
    count each distinct line's corpus frequency, strip lines occurring
    >= 3 times (web boilerplate: navigation, cookie banners,
    legal footers), and emit per-doc (n_lines, n_kept, cleaned_md5 of
    the reassembled text) — the C4 boilerplate filter that runs before
    span-level dedup.

    Scale design: the only corpus-sized shuffle is the line-frequency
    count, which partial-aggregates map-side (distinct boilerplate
    lines, not corpus rows, cross the exchange). The blocklist (lines
    at freq >= 3) reduces to ONE collect_list row that joins
    back by BROADCAST, and removal + reassembly is a map-only
    higher-order array filter — document text never shuffles, and no
    explode of the corpus ever reaches an exchange. The blocklist is
    bounded by distinct-boilerplate cardinality; for a corpus whose
    blocklist outgrows a broadcast (hundreds of millions of distinct
    repeated lines), the fallback is the explode + anti-join form —
    same result, one more corpus-sized shuffle."""
    d = table(spark, sf_dir, "documents")
    planted = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit(_LINE_HEADER), F.lit("\n")))
        .otherwise(F.lit("")),
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("\n"), F.lit(_LINE_FOOTER)))
        .otherwise(F.lit("")),
    )
    base = d.select("doc_id", F.split(planted, "\n").alias("lines"))
    blocklist = (
        base.select(F.explode("lines").alias("line"))
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= _LINE_FREQ_MIN)
        .agg(F.collect_list("line").alias("blocked"))
    )
    kept = F.filter("lines", lambda l: ~F.array_contains(F.col("blocked"), l))
    return base.crossJoin(F.broadcast(blocklist)).select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(F.concat_ws("\n", kept)).alias("cleaned_md5"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash-based stratified sampling

# Keep a row iff the first 8 hex chars of md5(doc_id) fall below the
# stratum's threshold — identical selection on any engine, any cluster.
_RATE_THRESH = {0.5: "80000000", 0.125: "20000000"}


@query(
    "x_hash_sample_stratified",
    oracle="""
    SELECT source, count(*)::BIGINT AS n_total,
           sum(CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) <
                    CASE WHEN substr(source, 4)::INT % 2 = 0
                         THEN '80000000' ELSE '20000000' END
               THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM documents GROUP BY source
    """,
    covers=["X4"],
)
def x_hash_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: even-numbered sources keep
    50%, odd keep 12.5%, selected by an md5-threshold on doc_id rather
    than rand() — the sample is reproducible across runs, engines, and
    cluster layouts (unlike sampleBy, whose selection depends on rng
    seeding per partition). Map-side expression + one partial-agg
    shuffle on source."""
    d = table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    thresh = F.when(src_num % 2 == 0, _RATE_THRESH[0.5]).otherwise(
        _RATE_THRESH[0.125]
    )
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thresh
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Mixture / token-budget planning


@query(
    "x_mixture_plan",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               CAST(sum(len({_TOKS_DUCK})) AS BIGINT) AS tokens,
               (substr(source, 4)::INT % 4) + 1 AS weight
        FROM documents GROUP BY source
    ), tot AS (SELECT sum(tokens) AS all_tokens, sum(weight) AS all_w FROM per_src)
    SELECT source, tokens, weight,
           round(weight / all_w::DOUBLE, 6) AS share,
           CAST(round(all_tokens * weight / all_w::DOUBLE, 0) AS BIGINT)
               AS planned_tokens
    FROM per_src, tot
    """,
    covers=["X4"],
)
def x_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: per-source token counts joined with
    mixture weights → each source's share of the total token budget.
    The totals come from a single-row aggregate broadcast-cross-joined
    back (no window-over-all-rows shuffle); per-source tokenization is
    map-side."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.expr(_TOKS_SPARK))).cast("long").alias("tokens"),
        F.first((F.substring("source", 4, 10).cast("int") % 4) + 1).alias("weight"),
    )
    tot = per_src.agg(
        F.sum("tokens").alias("all_tokens"), F.sum("weight").alias("all_w")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        "weight",
        F.round(F.col("weight") / F.col("all_w").cast("double"), 6).alias("share"),
        F.round(
            F.col("all_tokens") * F.col("weight") / F.col("all_w").cast("double"), 0
        )
        .cast("long")
        .alias("planned_tokens"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap)

_DECON_N = 8  # n-gram width; 8-13 words is the usual decontamination range
_EVAL_MOD = 97  # doc_id % 97 == 0 -> the held-out "benchmark" slice (~1%)
# The corpus is synthetic word salad with no natural 8-gram overlap, so
# both sides plant one canonical sentence on every 31st document — the
# overlap path gets exercised on real hits (planted eval doc 0 puts the
# sentence's n-grams into the benchmark set), and the oracle plants the
# identical bytes.
_DECON_SENT = (
    "the quick benchmark sentence planted for decontamination parity checks here"
)
_DECON_PLANT_DUCK = f"""
    CASE WHEN doc_id % 31 = 0 THEN text || ' {_DECON_SENT}' ELSE text END
"""


@query(
    "x_decontaminate",
    oracle=f"""
    WITH p AS (SELECT doc_id, {_DECON_PLANT_DUCK} AS text FROM documents),
    t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM p),
    s AS (SELECT doc_id, {_shingles_duck(_DECON_N)} AS sh FROM t),
    eval_ng AS (
        SELECT DISTINCT unnest(sh) AS ng FROM s WHERE doc_id % {_EVAL_MOD} = 0
    ),
    train AS (
        SELECT doc_id, unnest(sh) AS ng FROM s WHERE doc_id % {_EVAL_MOD} != 0
    ),
    hits AS (
        SELECT train.doc_id, count(*)::BIGINT AS n_hits
        FROM train JOIN eval_ng USING (ng) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_eval_ngram_hits,
           CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {_EVAL_MOD} != 0
    """,
    covers=["X4", "X1"],
)
def x_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word {_DECON_N}-gram with a held-out eval slice (doc_id %
    {_EVAL_MOD} == 0 stands in for the benchmark set). The eval n-gram
    set is tiny relative to the corpus (benchmarks always are), so it
    BROADCASTS and the train side stays map-local: explode n-grams →
    broadcast-hash join → per-doc partial-agg count. The train corpus
    itself never shuffles — the only exchange is the per-doc hit count
    (one row per contaminated doc). No reference counterpart; standard
    pre-training hygiene at 100 TB."""
    d = spread_small_scan(spark, table(spark, sf_dir, "documents"))
    planted = F.when(
        F.col("doc_id") % 31 == 0,
        F.concat(F.col("text"), F.lit(" " + _DECON_SENT)),
    ).otherwise(F.col("text"))
    sh = d.select(
        "doc_id", planted.alias("text")
    ).select(
        "doc_id", F.expr(_TOKS_SPARK).alias("__toks")
    ).select("doc_id", _shingles_spark(_DECON_N, "__toks").alias("sh"))
    eval_ng = (
        sh.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select(F.explode("sh").alias("ng"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
    train_ng = train.select("doc_id", F.explode("sh").alias("ng"))
    hits = (
        train_ng.join(F.broadcast(eval_ng), on="ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select("doc_id")
        .join(hits, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_eval_ngram_hits"),
            F.when(F.coalesce("n_hits", F.lit(0)) > 0, 1).otherwise(0).alias(
                "contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Length / token histograms


@query(
    "x_length_histogram",
    oracle="""
    SELECT (n_chars // 100)::BIGINT AS bucket,
           count(*)::BIGINT AS n_docs,
           min(n_chars)::BIGINT AS min_chars,
           max(n_chars)::BIGINT AS max_chars
    FROM documents GROUP BY 1
    """,
    covers=["X4", "A5"],
)
def x_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram (100-char buckets): the standard first
    look at a new crawl dump. Partial aggregation collapses each
    mapper's rows to one row per bucket before the exchange, so shuffle
    volume is O(buckets), not O(docs)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy(
        F.expr("n_chars div 100").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# End-to-end curation funnel: the composition story. One query chains the
# hygiene passes a pre-training corpus goes through — language ID ->
# quality gate -> exact dedup -> deterministic sample — and reports the
# per-stage attrition (docs + tokens surviving each stage).

_SAMPLE_THRESH = "80000000"  # md5-prefix < this = keep ~50%


@query(
    "x_curation_pipeline",
    oracle=None,  # assigned below (built from the shared lexicon constants)
    covers=["X4", "X1"],
)
def x_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel over `documents`: predicted-English
    filter -> Gopher/C4-style quality gate -> exact dedup (first copy
    per fingerprint wins) -> deterministic md5-threshold 50% sample,
    reported as a 5-row attrition table (stage, n_docs, n_tokens).

    The naive formulation — materialize each stage and count it — scans
    the corpus once per stage. This plan computes all four survival
    flags in a SINGLE pass: map-side expressions for lang/quality/
    fingerprint, ONE window shuffle (partition by fingerprint) for the
    first-copy flag, then one tiny aggregate and a stack() unpivot. At
    100 TB: one scan + one shuffle + O(1) result, vs four scans and a
    distinct per stage. Flags compose monotonically (each stage ANDs
    the previous), exactly like a real curation DAG's lineage columns.
    """
    from engage_spark.api import curation_funnel

    d = table(spark, sf_dir, "documents")
    return curation_funnel(
        d, id_col="doc_id", text_col="text", n_chars_col="n_chars",
        sample_rate=0.5,  # threshold '80000000', matching the oracle
    )


_MARKER_COLS = ",\n           ".join(
    f"len(list_filter(toks, x -> list_contains([{_sql_list(ws)}], x))) AS s_{lg}"
    for lg, ws in _LANG_MARKERS.items()
)

from engage_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["x_curation_pipeline"].oracle = rf"""
    WITH t AS (
        SELECT doc_id, n_chars, text, {_TOKS_DUCK} AS toks FROM documents
    ), s AS (
        SELECT doc_id, n_chars, text, len(toks)::BIGINT AS n_toks,
           {_MARKER_COLS},
           len(list_filter(toks, x -> list_contains([{_sql_list(_STOPWORDS)}], x)))
               AS s_stop
        FROM t
    ), g AS (
        SELECT doc_id, n_toks, n_chars, s_stop,
               CASE WHEN s_en + s_es + s_fr + s_de > 0
                     AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de
                    THEN 1 ELSE 0 END AS f_lang,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM s
    ), q AS (
        SELECT doc_id, n_toks, f_lang, fp,
               CASE WHEN f_lang = 1 AND n_chars BETWEEN 100 AND 20000
                     AND s_stop / n_toks::DOUBLE >= 0.01
                    THEN 1 ELSE 0 END AS f_q
        FROM g
    ), dd AS (
        SELECT doc_id, n_toks, f_lang, f_q,
               CASE WHEN f_q = 1 AND sum(f_q) OVER (
                        PARTITION BY fp ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                    THEN 1 ELSE 0 END AS f_d
        FROM q
    ), fl AS (
        SELECT doc_id, n_toks, f_lang, f_q, f_d,
               CASE WHEN f_d = 1
                     AND substr(md5(doc_id::VARCHAR), 1, 8) < '{_SAMPLE_THRESH}'
                    THEN 1 ELSE 0 END AS f_s
        FROM dd
    ), agg AS (
        SELECT count(*)::BIGINT AS n0, sum(n_toks)::BIGINT AS t0,
               sum(f_lang)::BIGINT AS n1, sum(f_lang * n_toks)::BIGINT AS t1,
               sum(f_q)::BIGINT AS n2, sum(f_q * n_toks)::BIGINT AS t2,
               sum(f_d)::BIGINT AS n3, sum(f_d * n_toks)::BIGINT AS t3,
               sum(f_s)::BIGINT AS n4, sum(f_s * n_toks)::BIGINT AS t4
        FROM fl
    )
    SELECT 0::BIGINT AS stage_idx, 'raw' AS stage, n0 AS n_docs, t0 AS n_tokens FROM agg
    UNION ALL SELECT 1, 'lang_en', n1, t1 FROM agg
    UNION ALL SELECT 2, 'quality', n2, t2 FROM agg
    UNION ALL SELECT 3, 'dedup', n3, t3 FROM agg
    UNION ALL SELECT 4, 'sample', n4, t4 FROM agg
"""


# ---------------------------------------------------------------------------
# Sequence packing (pretraining batch construction)

_PACK_BUDGET = 512  # tokens per packed sequence


@query(
    "x_sequence_packing_exact_order",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, len({_TOKS_DUCK})::BIGINT AS n_toks
        FROM documents
    ), packed AS (
        SELECT source, doc_id, n_toks,
               ((sum(n_toks) OVER (
                   PARTITION BY source ORDER BY doc_id, n_toks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_toks) // {_PACK_BUDGET})::BIGINT AS pack_id
        FROM t
    )
    SELECT source, pack_id,
           count(*)::BIGINT AS n_docs,
           sum(n_toks)::BIGINT AS pack_tokens
    FROM packed GROUP BY source, pack_id
    """,
    covers=["X4"],
)
def x_sequence_packing_exact_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, EXACT-GLOBAL-ORDER variant (renamed from
    x_sequence_packing in round 7 so nobody mistakes it for the
    default — the sharded form, x_packed_sequences_sharded, is the
    primary/scale path): documents fill 512-token packs greedily in
    deterministic (source, doc_id) order — pack_id =
    floor(start_offset / budget), where start_offset is the exclusive
    running token sum. Greedy sequential fill is the streaming-friendly
    standard (an oversize doc spills its pack; no bin-packing shuffle
    of documents across the corpus); the assignment is one window
    cumsum per source partition — a single shuffle on source, no
    Python. Deterministic: the same corpus packs identically on any
    cluster layout, so a resumed job continues the same packs.
    THE HAZARD this variant keeps (and the sharded default removes):
    the cumsum window is one task per source — a handful of sources
    means a handful of sequential scans, fine for exact-order
    requirements at modest strata, wrong as the default at 100 TB."""
    from engage_spark.api import sequence_packing

    d = table(spark, sf_dir, "documents")
    per_doc = sequence_packing(
        d, id_col="doc_id", text_col="text", strata_col="source",
        budget=_PACK_BUDGET,
    )
    return per_doc.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("pack_tokens"),
    )


@query(
    "x_packed_sequences_exact_order",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, text, len({_TOKS_DUCK})::BIGINT AS n_toks
        FROM documents
    ), packed AS (
        SELECT source, doc_id, text, n_toks,
               ((sum(n_toks) OVER (
                   PARTITION BY source ORDER BY doc_id, n_toks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_toks) // {_PACK_BUDGET})::BIGINT AS pack_id
        FROM t
    )
    SELECT source, pack_id,
           count(*)::BIGINT AS n_docs,
           sum(n_toks)::BIGINT AS pack_tokens,
           string_agg(text, ' ' ORDER BY doc_id) AS packed_text
    FROM packed GROUP BY source, pack_id
    """,
    covers=["X4"],
)
def x_packed_sequences_exact_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized training records, EXACT-GLOBAL-ORDER variant
    (renamed from x_packed_sequences in round 7; the sharded form
    x_packed_sequences_sharded is the primary/scale path — this one
    keeps the per-source single-task cumsum for exact-order needs):
    each 512-token pack's member documents concatenated in
    deterministic doc_id order — what actually gets written as a
    pretraining batch after the packing assignment decides membership.
    Same assignment as the packing query (delegating to
    api.sequence_packing), then text joins on and one
    groupBy(source, pack_id) builds the record.

    Scale: pack assignment moves only (doc_id, source, n_toks); text
    crosses the wire exactly twice — the doc_id join and the pack
    groupBy — which is the floor for any formulation that must
    physically co-locate a pack's documents (they start scattered
    across the corpus). collect_list state per task is bounded by one
    pack's budget of tokens times docs-per-pack, independent of corpus
    size."""
    from engage_spark.api import sequence_packing

    d = table(spark, sf_dir, "documents")
    per_doc = sequence_packing(
        d, id_col="doc_id", text_col="text", strata_col="source",
        budget=_PACK_BUDGET,
    )
    return (
        per_doc.join(d.select("doc_id", "text"), "doc_id")
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("pack_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s.text,
                ),
                " ",
            ).alias("packed_text"),
        )
    )


_PACK_SHARDS = 8
_PACK_SALT = "pack-v1"


@query(
    "x_packed_sequences_sharded",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, text, len({_TOKS_DUCK})::BIGINT AS n_toks,
               (('0x' || substr(
                   md5('{_PACK_SALT}:' || doc_id::VARCHAR), 1, 8
               ))::BIGINT % {_PACK_SHARDS})::BIGINT AS shard_id
        FROM documents
    ), packed AS (
        SELECT source, shard_id, doc_id, text, n_toks,
               ((sum(n_toks) OVER (
                   PARTITION BY source, shard_id ORDER BY doc_id, n_toks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_toks) // {_PACK_BUDGET})::BIGINT AS pack_id
        FROM t
    )
    SELECT source, shard_id, pack_id,
           count(*)::BIGINT AS n_docs,
           sum(n_toks)::BIGINT AS pack_tokens,
           string_agg(text, ' ' ORDER BY doc_id) AS packed_text
    FROM packed GROUP BY source, shard_id, pack_id
    """,
    covers=["X4"],
)
def x_packed_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, THE PRIMARY (100 TB-safe) form since round 7
    (the exact-global-order variants keep the *_exact_order suffix):
    packs are built
    within (source, shard_id), where shard_id = md5-hash of the doc_id
    mod 8 (the `_shard_key_cols` delivery scheme). The flat form's
    cumsum window partitions by source only — a handful of sources
    means a handful of tasks, each sequentially scanning its WHOLE
    stratum; hierarchical packing multiplies window parallelism by
    n_shards while staying fully deterministic (the shard is a pure
    function of the id, so the same corpus packs identically on any
    cluster layout and each shard resumes independently). Pack
    identity is (source, shard_id, pack_id); the cost is at most one
    under-filled trailing pack per shard instead of per source.

    Plan: one window cumsum over (source, shard_id) — the exchange is
    hashpartitioning on BOTH keys (pinned by plan test) — then the
    same text join + groupBy record assembly as x_packed_sequences."""
    from engage_spark.api import sequence_packing

    d = table(spark, sf_dir, "documents")
    per_doc = sequence_packing(
        d, id_col="doc_id", text_col="text", strata_col="source",
        budget=_PACK_BUDGET, n_shards=_PACK_SHARDS, shard_salt=_PACK_SALT,
    )
    return (
        per_doc.join(d.select("doc_id", "text"), "doc_id")
        .groupBy("source", "shard_id", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("pack_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s.text,
                ),
                " ",
            ).alias("packed_text"),
        )
    )


@query(
    "x_pack_boundaries",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, len({_TOKS_DUCK})::BIGINT AS n_toks,
               (('0x' || substr(
                   md5('{_PACK_SALT}:' || doc_id::VARCHAR), 1, 8
               ))::BIGINT % {_PACK_SHARDS})::BIGINT AS shard_id
        FROM documents
    ), packed AS (
        SELECT source, shard_id, doc_id, n_toks,
               ((sum(n_toks) OVER (
                   PARTITION BY source, shard_id ORDER BY doc_id, n_toks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_toks) // {_PACK_BUDGET})::BIGINT AS pack_id
        FROM t
    )
    SELECT source, shard_id, pack_id, doc_id,
           (sum(n_toks) OVER (
               PARTITION BY source, shard_id, pack_id
               ORDER BY doc_id, n_toks
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_toks)::BIGINT AS tok_start,
           (sum(n_toks) OVER (
               PARTITION BY source, shard_id, pack_id
               ORDER BY doc_id, n_toks
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ))::BIGINT AS tok_end
    FROM packed
    """,
    covers=["X4"],
)
def x_pack_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack DOCUMENT BOUNDARY OFFSETS — what cross-document
    attention masking consumes at training time: for every document in
    a pack, its [tok_start, tok_end) token span within the pack's
    local coordinates (same sharded assignment as
    x_packed_sequences_sharded; an oversize spill doc's tok_end may
    exceed the budget, the documented greedy-fill semantics). Pure
    integer window arithmetic over the packing cumsum — the
    (source, shard_id) exchange is reused for the within-pack offsets
    (same partitioning prefix, no second shuffle), and the output is
    exactly the mask-index table a loader zips with packed_text.
    Delegates to api.pack_boundaries (the public facade)."""
    from engage_spark.api import pack_boundaries

    d = table(spark, sf_dir, "documents")
    return pack_boundaries(
        d, id_col="doc_id", text_col="text", strata_col="source",
        budget=_PACK_BUDGET, n_shards=_PACK_SHARDS, shard_salt=_PACK_SALT,
    ).select("source", "shard_id", "pack_id", "doc_id", "tok_start", "tok_end")


# ---------------------------------------------------------------------------
# Percentile quality gating ("keep the top X% by score")

_GATE_BUCKETS = 10


@query(
    "x_quality_decile_gate",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               round(
                   len(list_filter({_TOKS_DUCK},
                       x -> list_contains([{_sql_list(_STOPWORDS)}], x)))
                   / len({_TOKS_DUCK})::DOUBLE + 1e-9, 6
               ) AS sc
        FROM documents
    ), th AS (
        SELECT list_transform(
                   quantile_cont(sc, [{", ".join(str(k / _GATE_BUCKETS)
                                                  for k in range(1, _GATE_BUCKETS))}]),
                   t -> round(t + 1e-9, 6)
               ) AS ths
        FROM s
    )
    SELECT (1 + list_sum(list_transform(th.ths,
                t -> CASE WHEN s.sc > t THEN 1 ELSE 0 END)))::BIGINT AS decile,
           count(*)::BIGINT AS n_docs,
           round(min(s.sc), 6) AS min_score,
           round(max(s.sc), 6) AS max_score
    FROM s, th
    GROUP BY decile
    """,
    covers=["X4"],
)
def x_quality_decile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gating of the stopword-ratio quality score — the "keep
    the top X% by quality" curation step, summarized as per-decile
    (n_docs, min_score, max_score). Ties collapse deciles (a score
    equal to several thresholds lands in the lowest), so sparse score
    distributions may realize fewer than 10 rows — deterministic
    either way.

    Scale (api.percentile_gate): no global ntile sort — the 9
    thresholds reduce to one broadcast row and bucketing is map-side;
    the registered query uses the EXACT percentile (oracle-comparable,
    one-aggregator buffering), the facade's exact=False swaps in
    approx_percentile's fixed-size sketch for corpus scale."""
    from engage_spark.api import _ws_tokens, percentile_gate

    d = table(spark, sf_dir, "documents")
    toks = _ws_tokens("text")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    score = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        / F.size(toks).cast("double")
    )
    scored = d.select("doc_id", score.alias("q"))
    g = percentile_gate(scored, "q", n_buckets=_GATE_BUCKETS, exact=True)
    return g.groupBy(F.col("bucket").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min("q_rounded"), 6).alias("min_score"),
        F.round(F.max("q_rounded"), 6).alias("max_score"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (multilingual/source rebalancing)

_MIX_TEMP = 0.7  # T < 1 upsamples the tail, the multilingual standard


@query(
    "x_mixture_temperature",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               CAST(sum(len({_TOKS_DUCK})) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ), tot AS (SELECT sum(tokens) AS all_tokens FROM per_src),
    scaled AS (
        SELECT source, tokens,
               pow(tokens / all_tokens::DOUBLE, {_MIX_TEMP}) AS t_mass
        FROM per_src, tot
    ), norm AS (SELECT sum(t_mass) AS z FROM scaled)
    SELECT s.source, s.tokens,
           round(s.tokens / tot.all_tokens::DOUBLE + 1e-9, 6) AS natural_share,
           round(s.t_mass / norm.z + 1e-9, 6) AS temp_share,
           round((s.t_mass / norm.z)
                 / (s.tokens / tot.all_tokens::DOUBLE) + 1e-9, 4)
               AS sampling_factor
    FROM scaled s, tot, norm
    """,
    covers=["X4"],
)
def x_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (p_i ∝ natural_share^T,
    T=0.7): the standard multilingual/source rebalancing — T < 1
    flattens the distribution, upsampling tail sources without
    discarding head data. Emits per-source natural vs temperature
    share and the sampling_factor (>1 = upsample) that a repetition-
    aware sampler (hash_sample with per-source rates) consumes.

    Plan: per-source token counts are one partial-agg'd shuffle on
    source; both normalizers are single-row aggregates broadcast back
    — no window over all rows, no second corpus pass."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.expr(_TOKS_SPARK))).cast("long").alias("tokens")
    )
    tot = per_src.agg(F.sum("tokens").alias("all_tokens"))
    scaled = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "t_mass",
        F.pow(F.col("tokens") / F.col("all_tokens").cast("double"), _MIX_TEMP),
    )
    norm = scaled.agg(F.sum("t_mass").alias("z"))
    nat = F.col("tokens") / F.col("all_tokens").cast("double")
    tmp = F.col("t_mass") / F.col("z")
    return scaled.crossJoin(F.broadcast(norm)).select(
        "source",
        "tokens",
        F.round(nat + F.lit(1e-9), 6).alias("natural_share"),
        F.round(tmp + F.lit(1e-9), 6).alias("temp_share"),
        F.round(tmp / nat + F.lit(1e-9), 4).alias("sampling_factor"),
    )


_MIX_SALT = "mix-v1"  # bump for an independent remainder draw


@query(
    "x_mixture_materialize",
    oracle=f"""
    WITH per_src AS (
        SELECT source, CAST(sum(len({_TOKS_DUCK})) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ), tot AS (SELECT sum(tokens) AS all_tokens FROM per_src),
    scaled AS (
        SELECT source, pow(tokens / all_tokens::DOUBLE, {_MIX_TEMP}) AS t_mass,
               tokens / all_tokens::DOUBLE AS nat
        FROM per_src, tot
    ), norm AS (SELECT sum(t_mass) AS z FROM scaled),
    factors AS (
        SELECT source, (t_mass / norm.z) / nat AS factor
        FROM scaled, norm
    ), planned AS (
        SELECT d.doc_id, d.source,
               (floor(f.factor)
                + CASE WHEN ('0x' || substr(
                        md5('{_MIX_SALT}:' || d.doc_id::VARCHAR), 1, 8
                    ))::BIGINT / 4294967296.0 < f.factor - floor(f.factor)
                    THEN 1 ELSE 0 END)::BIGINT AS n_copies
        FROM documents d JOIN factors f ON d.source = f.source
    )
    SELECT doc_id, source, unnest(generate_series(1, n_copies))::BIGINT AS copy_idx
    FROM planned WHERE n_copies > 0
    """,
    covers=["X4"],
)
def x_mixture_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature mixture (x_mixture_temperature's
    sampling factors) into an actual resampled corpus: every document
    repeats floor(factor) times plus one more with probability
    factor - floor(factor), decided by a deterministic md5 threshold —
    so upsampled sources gain whole epochs + a reproducible fractional
    draw, downsampled sources thin to `factor`, and the SAME corpus
    materializes the SAME mix on any cluster layout (resumable,
    re-drawable by bumping the salt). Returns one row per emitted copy
    (doc_id, source, copy_idx).

    Plan: factors reduce to a per-source table derived from broadcast
    single-row aggregates; the per-doc join is a broadcast join on
    source; the copy fan-out is sequence()+explode inside codegen —
    the only corpus-sized work is one map pass. This is the
    missing half of mixture PLANNING: the op that actually builds the
    training mix a sampler delivers."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.expr(_TOKS_SPARK))).cast("long").alias("tokens")
    )
    tot = per_src.agg(F.sum("tokens").alias("all_tokens"))
    scaled = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        (F.col("tokens") / F.col("all_tokens").cast("double")).alias("nat"),
        F.pow(
            F.col("tokens") / F.col("all_tokens").cast("double"), _MIX_TEMP
        ).alias("t_mass"),
    )
    norm = scaled.agg(F.sum("t_mass").alias("z"))
    factors = scaled.crossJoin(F.broadcast(norm)).select(
        "source", ((F.col("t_mass") / F.col("z")) / F.col("nat")).alias("factor")
    )
    frac = F.col("factor") - F.floor("factor")
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(_MIX_SALT), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        / F.lit(float(1 << 32))
    )
    planned = (
        d.select("doc_id", "source")
        .join(F.broadcast(factors), "source")
        .select(
            "doc_id",
            "source",
            (F.floor("factor") + F.when(draw < frac, 1).otherwise(0))
            .cast("long")
            .alias("n_copies"),
        )
        .filter(F.col("n_copies") > 0)
    )
    return planned.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
            "copy_idx"
        ),
    )


# x_dedup_components_lsh's oracle: the md5-MinHash pair SELECT (shared
# with x2d_minhash_md5) composed under the same recursive transitive
# closure the exact-edge clustering queries use.
from engage_spark.queries.llm_dedup import _MH32_PAIRS_SQL as _MH32_SQL  # noqa: E402
from engage_spark.registry import REGISTRY as _REG2  # noqa: E402

_REG2["x_dedup_components_lsh"].oracle = f"""
    WITH RECURSIVE
    lshp AS ({_MH32_SQL}),
    sym AS (
        SELECT doc_a s, doc_b d FROM lshp
        UNION SELECT doc_b, doc_a FROM lshp
    ),
    walk(node, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.node, e.d FROM walk w JOIN sym e ON e.s = w.reach
    )
    SELECT node AS doc_id, min(reach)::BIGINT AS component_id,
           CASE WHEN node = min(reach) THEN 1 ELSE 0 END AS is_keeper
    FROM walk GROUP BY node
"""


@query(
    "x_snapshot_diff",
    # the fingerprint twin is the established x1 expression
    # (md5 of whitespace-normalized lowercase text); the full-outer
    # status classification mirrors api.snapshot_diff case-for-case
    oracle=r"""
    WITH o AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id % 7 != 0
    ),
    n AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(
               CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END
             )), '\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id % 5 != 0
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """,
    covers=["X1"],
)
def x_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (api.snapshot_diff) — the dataset-versioning
    primitive behind incremental retraining decisions: two derived
    snapshots of the documents table (old = ids not divisible by 7;
    new = ids not divisible by 5, with every 11th document's text
    revised) full-outer joined on id and compared by the canonical
    exact-dedup fingerprint. Output (doc_id, status) classifies every
    id as added / removed / changed / unchanged — aggregate for the
    release report, anti-join 'unchanged' for the incremental slice.

    Scale shape: text never shuffles — each side reduces to (id, 16 B
    fingerprint) map-side before the single full-outer join exchange."""
    from engage_spark.api import snapshot_diff

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return snapshot_diff(old, new)
