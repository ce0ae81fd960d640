"""Membership/search/graph rungs: Bloom gate, CDC chunks, boolean search, Count-Min, kNN graph + centrality.

Registration-order slice of the former plans/registry.py (r11 split);
order within and across modules is load-bearing -- the driver window and
QUERIES.md read QUERIES in insertion order.
"""

from __future__ import annotations

from multiagent_document_etl_system_spark.plans.registry._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _docs,
    _emb,
    _q,
    dedup,
    similarity,
    textfns,
    textstats,
)

@_q("dedup_bloom_membership", f"""
WITH corpus AS (
  SELECT md5(text) AS k FROM documents WHERE doc_id % 10 <> 0
), bits AS (
  SELECT DISTINCT unnest({dedup.bloom_positions_sql('k')}) AS pos
  FROM (SELECT DISTINCT k FROM corpus)
), probes AS (
  SELECT doc_id, md5(text) AS k FROM documents WHERE doc_id % 10 = 0
), ppos AS (
  SELECT doc_id, k, unnest({dedup.bloom_positions_sql('k')}) AS pos
  FROM probes
), bloom AS (
  SELECT doc_id, k,
    CAST(CASE WHEN sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
              = {dedup.BLOOM_K} THEN 1 ELSE 0 END AS INT) AS bloom_hit
  FROM ppos p LEFT JOIN bits b USING (pos) GROUP BY doc_id, k
)
SELECT doc_id, bloom_hit,
  CAST(CASE WHEN k IN (SELECT k FROM corpus) THEN 1 ELSE 0 END AS INT)
    AS exact_hit
FROM bloom
""")
def dedup_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter for continuous dedup: probes
    (doc_id % 10 = 0 — the 'incoming batch') checked against the corpus
    remainder through an m-bit Bloom bitmap in its relational form (set-bit
    set ≤ m rows, so it broadcasts at ANY corpus size), next to the exact
    answer so the oracle audits the no-false-negative guarantee and the
    false-positive rate of the (m, k) sizing. See dedup.bloom_membership
    for the 100 TB argument; m is deliberately undersized (4096 bits) so
    the FP path is exercised at sf0.01."""
    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    probes = d.filter(F.col("doc_id") % 10 == 0)
    return dedup.bloom_membership(
        corpus, probes, key=F.md5("text"), probe_key=F.md5("text"))


@_q("ta_cdc_chunks", textstats.cdc_chunks_sql())
def ta_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (token-level FastCDC-style cut rule) +
    shift-robust cross-document chunk dedup accounting — catches copied
    PASSAGES whose surrounding edits defeat fixed-window chunking. All
    outputs integer; full oracle (md5 hash family cut rule). See
    textstats.cdc_chunks for semantics and the one-exchange plan."""
    return textstats.cdc_chunks(_docs(spark, sf_dir))


#: conjunctive-search demo terms: one rare marker token + two common ones,
#: so the AND-intersection actually prunes (the rare posting list drives
#: the result size — the classic term-ordering observation)
_SEARCH_TERMS = ("dup", "vector", "key")


@_q("ta_boolean_search", f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM (
  SELECT doc_id, token FROM (
    SELECT doc_id,
      unnest({textfns.tokens_sql('lower(text)')}) AS token
    FROM documents
  ) WHERE token IN {str(tuple(_SEARCH_TERMS))}
)
GROUP BY doc_id
HAVING count(DISTINCT token) = {len(_SEARCH_TERMS)}
""")
def ta_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) boolean retrieval over the corpus — the query
    side of the ta_inverted_index build: documents containing EVERY query
    term, scored by total term occurrences (n_hits — the integer TF
    relevance a ranker would start from). Relationally this is a
    posting-list intersection: explode filters to the query terms FIRST
    (the scan emits only matching postings — at 100 TB the rare term's
    posting list bounds the intersection, the standard term-ordering
    win), then one groupBy on doc_id checks all terms are present via a
    distinct count. No joins at all; one shuffle on doc_id."""
    d = _docs(spark, sf_dir)
    toks = (d.select("doc_id", F.explode(
        textfns.tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.col("token").isin(*_SEARCH_TERMS)))
    return (toks.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_hits"),
                 F.count_distinct("token").alias("_nd"))
            .filter(F.col("_nd") == len(_SEARCH_TERMS))
            .select("doc_id", "n_hits"))


@_q("ta_countmin_freq", textstats.countmin_freq_sql())
def ta_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency estimation audited against exact
    counts — the mergeable-summary sketch next to Misra-Gries
    (ta_heavy_hitters) and the engine-private HLL/KLL rungs: per-partition
    partial counts ARE the partition sketches, the ≤ d·w-key shuffle is
    the merge, and the seeded-md5 position family keeps the whole counter
    table bit-exact on both engines (full hash oracle — the only sketch
    family in the registry where that is possible). Output: top-20 tokens
    with (freq, cms_est), cms_est >= freq one-sided by construction. See
    textstats.countmin_freq."""
    return textstats.countmin_freq(_docs(spark, sf_dir))


@_q("v23_knn_graph", similarity.knn_graph_stats_sql())
def v23_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked mutual-kNN similarity graph (out-degree, mutual degree,
    nearest neighbour id per vector) — the graph construction under
    diversity pruning and SemDeDup-style curation. Ranking on the 1e-4
    score grid with id tie-break ⇒ integer-only outputs, full oracle
    (plane literals + parity cosine restated in SQL)."""
    return similarity.knn_graph_stats(_emb(spark, sf_dir), dim=64)


@_q("v25_centroid_outliers", """
WITH xq AS (
  SELECT vec_id, label, i,
    CAST(floor(embedding[i] * 1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings, generate_series(1, 64) g(i)
), comp AS (
  SELECT label, i, CAST(sum(q) AS HUGEINT) AS s,
    CAST(count(*) AS HUGEINT) AS n
  FROM xq GROUP BY 1, 2
), d AS (
  SELECT x.vec_id, x.label,
    sum((c.n * x.q - c.s) * (c.n * x.q - c.s)) AS d2n2,
    max(c.n) AS n
  FROM xq x JOIN comp c ON x.label = c.label AND x.i = c.i
  GROUP BY 1, 2
), ranked AS (
  SELECT label, vec_id,
    CAST(d2n2 // (n * n * 100000000) AS BIGINT) AS d2_q1e4,
    row_number() OVER (PARTITION BY label
                       ORDER BY d2n2 DESC, vec_id ASC) AS rank
  FROM d
)
SELECT CAST(label AS INT) AS label, vec_id,
  CAST(rank AS BIGINT) AS rank, d2_q1e4
FROM ranked WHERE rank <= 5
""")
def v25_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding OUTLIERS: the 5 vectors farthest from their
    own label centroid — the curation op behind prototype-based outlier
    removal (mislabeled / off-distribution members of a semantic class).
    The whole score is EXACT integer arithmetic: with xq = the 1e-6 grid
    components and (s, n) the per-(label, dim) scaled sums, the squared
    distance to the mean scales as Σ(n·xq − s)² — an integer (DECIMAL
    38 / HUGEINT; at n = 10⁹ vectors the summand peaks ~10³⁰, well under
    int128) — so the ranking has a single deterministic value on both
    engines and the emitted distance rides the 1e-4 grid via one floor
    division. Plan: component explode → (label, dim) partial-agg sums →
    equi-join back on (label, dim) → per-vector sum → per-label top-5
    window (WindowGroupLimit). Same explode volume class as
    v9_label_centroids."""
    e = _emb(spark, sf_dir)
    xq = e.select(
        "vec_id", "label",
        F.posexplode(F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5))
            .cast("bigint"))).alias("i", "q"))
    comp = (xq.groupBy("label", "i")
            .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
                 F.count("*").cast("decimal(38,0)").alias("n")))
    term = (F.col("n") * F.col("q").cast("decimal(38,0)") - F.col("s"))
    d = (xq.join(comp, ["label", "i"])
         .select("vec_id", "label", (term * term).alias("t2"), "n")
         .groupBy("vec_id", "label")
         .agg(F.sum("t2").alias("d2n2"), F.max("n").alias("n")))
    denom = F.col("n") * F.col("n") * F.lit(100_000_000).cast("decimal(38,0)")
    w = Window.partitionBy("label").orderBy(F.desc("d2n2"), F.asc("vec_id"))
    return (d.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select(F.col("label").cast("int").alias("label"), "vec_id",
                    F.col("rank").cast("bigint").alias("rank"),
                    ((F.col("d2n2") - F.col("d2n2") % denom) / denom)
                    .cast("bigint").alias("d2_q1e4")))


@_q("v26_label_separation", """
WITH xq AS (
  SELECT vec_id, label, i,
    CAST(floor(embedding[i] * 1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings, generate_series(1, 64) g(i)
), comp AS (
  SELECT label, i, CAST(sum(q) AS HUGEINT) AS s,
    CAST(count(*) AS HUGEINT) AS n,
    CAST(floor(CAST(sum(q) AS DOUBLE) / 1000000.0 / count(*) * 10000.0
               + 0.5) AS BIGINT) AS m_q
  FROM xq GROUP BY 1, 2
), intra AS (
  SELECT x.label,
    sum((c.n * x.q - c.s) * (c.n * x.q - c.s)) AS d2n2_sum,
    max(c.n) AS n
  FROM xq x JOIN comp c ON x.label = c.label AND x.i = c.i
  GROUP BY 1
), inter AS (
  SELECT a.label AS label, b.label AS other,
    CAST(sum((a.m_q - b.m_q) * (a.m_q - b.m_q)) // 10000 AS BIGINT)
      AS inter_d2_q1e4,
    row_number() OVER (PARTITION BY a.label
                       ORDER BY sum((a.m_q - b.m_q) * (a.m_q - b.m_q)) ASC,
                                b.label ASC) AS rn
  FROM comp a JOIN comp b ON a.i = b.i AND a.label <> b.label
  GROUP BY 1, 2
)
SELECT CAST(t.label AS INT) AS label,
  CAST(t.n AS BIGINT) AS n_vectors,
  CAST((10000 * t.d2n2_sum) // (t.n * t.n * t.n * 1000000000000)
       AS BIGINT) AS intra_mean_d2_q1e4,
  CAST(i.other AS INT) AS nearest_label,
  i.inter_d2_q1e4,
  i.inter_d2_q1e4
    - CAST((10000 * t.d2n2_sum) // (t.n * t.n * t.n * 1000000000000)
           AS BIGINT) AS margin_q1e4
FROM intra t JOIN inter i ON t.label = i.label AND i.rn = 1
""")
def v26_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality / separability report per label: the mean squared
    distance of members to their own centroid (intra spread) against the
    squared distance to the NEAREST other centroid (inter margin) — the
    silhouette-style diagnostic behind "are these semantic classes
    usable as curation strata". Intra rides the same exact
    Σ(n·q − s)² integer machinery as v25_centroid_outliers (one floor
    division onto the 1e-4 grid at the end); inter distances are
    computed between the 1e-4-grid centroid components that
    v9_label_centroids proved single-valued cross-engine (driver-green
    r04), so every comparison and the argmin ranking are pure integer
    logic at ANY vector count. Plan: component explode + (label, dim)
    sums (the v9 shape), one join-back for intra, and a centroid
    self-join that is (#labels·dim)-sized — kilobytes regardless of
    corpus size."""
    e = _emb(spark, sf_dir)
    xq = e.select(
        "vec_id", "label",
        F.posexplode(F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5))
            .cast("bigint"))).alias("i", "q"))
    comp = (xq.groupBy("label", "i")
            .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
                 F.count("*").cast("decimal(38,0)").alias("n")))
    comp = comp.withColumn(
        "m_q",
        F.floor(F.col("s").cast("double") / 1000000.0 / F.col("n")
                * 10000.0 + F.lit(0.5)).cast("bigint"))
    term = (F.col("n") * F.col("q").cast("decimal(38,0)") - F.col("s"))
    intra = (xq.join(comp, ["label", "i"])
             .select("label", (term * term).alias("t2"), "n")
             .groupBy("label")
             .agg(F.sum("t2").alias("d2n2_sum"), F.max("n").alias("n")))
    a = comp.select(F.col("label").alias("la"), "i",
                    F.col("m_q").alias("ma"))
    b = comp.select(F.col("label").alias("lb"), "i",
                    F.col("m_q").alias("mb"))
    pair = (a.join(b, "i").filter(F.col("la") != F.col("lb"))
            .groupBy("la", "lb")
            .agg(F.sum((F.col("ma") - F.col("mb"))
                       * (F.col("ma") - F.col("mb"))).alias("ss")))
    w = Window.partitionBy("la").orderBy(F.asc("ss"), F.asc("lb"))
    nearest = (pair.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select(F.col("la").alias("label"),
                       F.col("lb").alias("nearest_label"),
                       F.expr("ss div 10000").cast("bigint")
                       .alias("inter_d2_q1e4")))
    d12 = F.lit(10_000).cast("decimal(38,0)")
    den = (F.col("n") * F.col("n") * F.col("n")
           * F.lit(1_000_000_000_000).cast("decimal(38,0)"))
    num = d12 * F.col("d2n2_sum")
    intra_q = ((num - num % den) / den).cast("bigint")
    return (intra.select(F.col("label"), F.col("n"),
                         intra_q.alias("intra_mean_d2_q1e4"))
            .join(nearest, "label")
            .select(F.col("label").cast("int").alias("label"),
                    F.col("n").cast("bigint").alias("n_vectors"),
                    "intra_mean_d2_q1e4",
                    F.col("nearest_label").cast("int")
                    .alias("nearest_label"),
                    "inter_d2_q1e4",
                    (F.col("inter_d2_q1e4")
                     - F.col("intra_mean_d2_q1e4")).alias("margin_q1e4")))


@_q("v24_graph_pagerank", similarity.graph_pagerank_sql())
def v24_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank over the mutual-kNN similarity graph — graph
    centrality as a curation signal (central docs are the representative
    cores of semantic neighborhoods, rank-starved isolates the outliers).
    The whole iteration is INTEGER-EXACT on the 1e-6 rank grid
    (rank' = 150000 + (85·Σ rank div deg) div 100, 4 unrolled rounds), so
    an iterative graph algorithm carries a full DuckDB hash oracle — the
    recurrence is restated as one CTE per round. Edge list built once
    (LSH-blocked, never all-pairs) and localCheckpointed; each round is
    an ids-only join+groupBy on the same key: connected-components shape,
    linear plan depth. See operators/similarity.py:graph_pagerank."""
    return similarity.graph_pagerank(_emb(spark, sf_dir), dim=64)
