"""Text-analysis (ta_*) sweep: repetition, chunking, token stats, TF-IDF, readability.

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
    _q,
    curation,
    dedup,
    idiv_round,
    idiv_round_sql,
    textstats,
    tokens,
)

@_q("ta_repetition", f"""
SELECT doc_id, {textstats.repetition_sql('text')} AS rep_ratio FROM documents
""")
def ta_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition gate: repeated-trigram ratio
    (1 − distinct/total word trigrams) — the C4/Gopher-style boilerplate
    filter that runs before cross-document dedup in a training pipeline.
    Pure slice+zip_with array expressions, narrow map, zero shuffles."""
    return _docs(spark, sf_dir).select(
        "doc_id", textstats.repetition_expr(F.col("text")).alias("rep_ratio"))


@_q("ta_chunk_segments", """
SELECT doc_id, seg_idx, CAST(length(seg) AS BIGINT) AS n_chars,
  CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_tokens
FROM (
  SELECT doc_id,
    CAST(unnest(generate_series(1, len(segs))) - 1 AS BIGINT) AS seg_idx,
    unnest(segs) AS seg
  FROM (
    SELECT doc_id,
      list_transform(
        generate_series(0, greatest(CAST(ceil(len(t) / 20.0) AS BIGINT), 1) - 1),
        i -> array_to_string(t[i*20+1 : i*20+20], ' ')) AS segs
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
          FROM documents)
  )
)
WHERE length(seg) > 0
""")
def ta_chunk_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunk segmentation (posexplode — the generator/table-
    function surface): each doc splits into 20-token segments with a
    positional index and per-segment char/token counts — the unit-splitting
    pass that feeds sequence packing (td_token_budget_pack works at doc
    granularity; this is the within-doc flavor a context-length-bounded
    tokenizer pipeline needs). The 1→N fan-out is a generate node feeding
    a narrow map — zero shuffles; the segment build is pure
    sequence/slice/array_join codegen, no UDF."""
    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    nseg = F.greatest(F.ceil(F.size("t") / 20.0), F.lit(1)).cast("long")
    segs = F.transform(
        F.sequence(F.lit(0).cast("long"), nseg - F.lit(1)),
        lambda i: F.array_join(F.slice(F.col("t"), i * 20 + 1, 20), " "),
    )
    seg_rows = (
        d.select("doc_id", t.alias("t"))
        .select("doc_id", F.posexplode(segs).alias("seg_idx", "seg"))
    )
    return seg_rows.filter(F.length("seg") > 0).select(
        "doc_id",
        F.col("seg_idx").cast("bigint").alias("seg_idx"),
        F.length("seg").cast("bigint").alias("n_chars"),
        F.size(F.split(F.col("seg"), " ")).cast("bigint").alias("n_tokens"),
    )


@_q("td_token_budget_pack", f"""
SELECT lang, doc_id, n_tokens,
  CAST(floor(coalesce(sum(n_tokens) OVER (
    PARTITION BY lang ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0)
    AS BIGINT) AS shard_id
FROM (SELECT lang, doc_id, {textstats.token_count_sql('text')} AS n_tokens
      FROM documents)
""")
def td_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing / shard assignment: docs are packed into ~2000-token
    shards per language by the running token count (shard = floor of the
    exclusive prefix sum / budget) — the deterministic batch-assembly op a
    training data loader needs.

    DISTRIBUTED prefix sum (two-phase scan): a naive
    ``Window.partitionBy(lang)`` caps parallelism at the stratum count
    (~5 languages ⇒ 5 tasks over 100 TB). Instead: (1) range-bucket each
    stratum on doc_id and prefix-sum WITHIN (lang, bucket) — thousands of
    independent window partitions; (2) aggregate one row per bucket and
    prefix those per lang — a window over a bucket-count-sized frame,
    broadcast back. exclusive_global = exclusive_in_bucket +
    bucket_offset, exactly the textbook scan decomposition; all-integer
    arithmetic keeps it bit-exact across engines, so the oracle states
    the single-window formulation and the results hash-match."""
    d = _docs(spark, sf_dir)
    sel = d.select(
        "lang", "doc_id",
        textstats.token_count(F.col("text")).alias("n_tokens"),
        (F.col("doc_id") / 1000).cast("bigint").alias("_bkt"))
    w_in = (Window.partitionBy("lang", "_bkt").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    in_bucket = F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    per_bucket = sel.groupBy("lang", "_bkt").agg(
        F.sum("n_tokens").alias("_bkt_sum"))
    w_off = (Window.partitionBy("lang").orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = per_bucket.select(
        "lang", "_bkt",
        F.coalesce(F.sum("_bkt_sum").over(w_off), F.lit(0))
        .alias("_bkt_off"))
    return (
        sel.withColumn("_in_bkt", in_bucket)
        .join(offsets, ["lang", "_bkt"])
        .select(
            "lang", "doc_id", "n_tokens",
            F.floor((F.col("_in_bkt") + F.col("_bkt_off")) / 2000.0)
            .cast("bigint").alias("shard_id"))
    )


@_q("td_pack_utilization", f"""
WITH packed AS (
  SELECT lang, doc_id, n_tokens,
    CAST(floor(coalesce(sum(n_tokens) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0)
      AS BIGINT) AS shard_id
  FROM (SELECT lang, doc_id, {textstats.token_count_sql('text')} AS n_tokens
        FROM documents)
), per_shard AS (
  SELECT lang, shard_id, CAST(sum(n_tokens) AS BIGINT) AS toks
  FROM packed GROUP BY 1, 2
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_shards,
  CAST(sum(toks) AS BIGINT) AS n_tokens,
  {idiv_round_sql("10000 * sum(toks)", "2000 * count(*)")}
    AS utilization_q1e4,
  CAST(max(toks) AS BIGINT) AS max_shard_tokens
FROM per_shard GROUP BY lang
""")
def td_pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over td_token_budget_pack's assignment:
    per language, shard count, token mass, UTILIZATION (tokens per
    2000-token budget slot, 1e-4 grid — the padding-waste number a
    training loader cares about; prefix-sum packing overflows a shard
    rather than splitting a doc, so utilization can exceed 10000), and
    the largest shard. Composition: the same distributed two-phase
    prefix-sum, then two tiny rollups (shards, then langs)."""
    packed = td_token_budget_pack(spark, sf_dir)
    per_shard = (packed.groupBy("lang", "shard_id")
                 .agg(F.sum("n_tokens").alias("toks")))
    return (per_shard.groupBy("lang")
            .agg(F.count("*").alias("n_shards"),
                 F.sum("toks").cast("bigint").alias("n_tokens"),
                 idiv_round(F.lit(10_000) * F.sum("toks"),
                            F.lit(2000) * F.count("*"))
                 .alias("utilization_q1e4"),
                 F.max("toks").cast("bigint").alias("max_shard_tokens")))


@_q("ta_token_stats", f"""
SELECT doc_id,
  {textstats.token_count_sql('text')} AS n_tokens,
  {textstats.subword_estimate_sql('text')} AS n_subwords,
  CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
""")
def ta_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n_tokens"),
        textstats.subword_estimate(F.col("text")).alias("n_subwords"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


@_q("ta_term_frequency", textstats.term_frequencies_sql())
def ta_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.term_frequencies(_docs(spark, sf_dir))


@_q("ta_source_divergence", textstats.source_divergence_sql())
def ta_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between per-source unigram
    distributions, integer-exact on the 1e-6 probability grid — the
    source-similarity matrix behind mixture/dedup-order decisions; see
    textstats.source_divergence for the exactness and S²-bound argument."""
    return textstats.source_divergence(_docs(spark, sf_dir))


@_q("ta_vocab_stats", textstats.vocab_stats_sql())
def ta_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary profile (tokens / types / hapaxes / TTR on
    the integer grid) — the lexical-diversity report behind source-mix
    decisions; see textstats.vocab_stats for the plan shape."""
    return textstats.vocab_stats(_docs(spark, sf_dir))


@_q("ta_lang_id",
    f"SELECT doc_id, {textstats.lang_id_sql('text')} AS lang_pred FROM documents")
def ta_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", textstats.lang_id_expr(F.col("text")).alias("lang_pred"))


_DEDUPED_DOCS_SQL = """(
  SELECT d.* FROM documents d
  JOIN (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)) k
    ON d.doc_id = k.keep_id
) AS deduped"""


@_q("td_mix_post_dedup", curation.temperature_mix_sql(
    table=_DEDUPED_DOCS_SQL))
def td_mix_post_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing computed on the DEDUPED corpus — the ordering
    pitfall this query exists to encode: mixing weights derived before
    dedup over-weight the sources whose volume is duplication (a source
    that is 50% copies contributes half its apparent mass), so the mix
    must be computed on survivors. Same exact-integer isqrt machinery as
    td_temperature_mix, fed by the exact-dedup keep set; diffing the two
    queries' shares quantifies how much each source's weight was
    duplication. Plan: one md5 window for the survivor set + the
    one-scan mix shape."""
    survivors = dedup.exact_dedup(_docs(spark, sf_dir))
    return curation.temperature_mix(survivors)


@_q("ta_lang_confusion", f"""
SELECT lang AS lang_true, {textstats.lang_id_sql('text')} AS lang_pred,
  CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
""")
def ta_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX: the n-gram heuristic's predictions
    rolled up against the labeled lang column — the evaluation artifact
    that tells you per-language where the classifier is trustworthy
    before you gate a 100 TB corpus on it (off-diagonal mass = docs a
    lang-keyed pipeline would route to the wrong curation thresholds).
    One scan + one tiny (#langs² max) rollup."""
    d = _docs(spark, sf_dir)
    return (d.groupBy(
        F.col("lang").alias("lang_true"),
        textstats.lang_id_expr(F.col("text")).alias("lang_pred"))
        .agg(F.count("*").alias("n")))


@_q("ta_quality_score",
    f"SELECT doc_id, {textstats.quality_q1e4_sql('text')} AS quality_q1e4 "
    f"FROM documents")
def ta_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document composite quality on the exact 1e-4 integer grid
    (textstats.quality_q1e4_expr — pure integer kernel, no float channel
    anywhere; divide by 1e4 downstream when a [0,1] double is wanted)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        textstats.quality_q1e4_expr(F.col("text")).alias("quality_q1e4"))


@_q("ta_fingerprint", f"""
SELECT doc_id, {textstats.fingerprint_sql('text')} AS fingerprint FROM documents
""")
def ta_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", textstats.fingerprint_expr(F.col("text")).alias("fingerprint"))


@_q("ta_tfidf", textstats.tfidf_top_terms_sql(k=5))
def ta_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms — the classic salience scoring next
    to the raw term/bigram frequency queries. All-integer inputs to the
    double math keep the score bit-identical cross-engine."""
    return textstats.tfidf_top_terms(_docs(spark, sf_dir), k=5)


@_q("ta_inverted_index", f"""
SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
  array_to_string(list_sort(list(DISTINCT doc_id))[1:10], ',') AS postings
FROM (
  SELECT doc_id, unnest({{toks}}) AS token FROM documents
)
WHERE length(token) > 0
GROUP BY token ORDER BY df DESC, token ASC LIMIT 50
""".format(toks="string_split_regex(trim(lower(text)), '\\s+')"))
def ta_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → document frequency + the first 10
    doc ids of the sorted posting list — the retrieval-index construction
    pass next to ta_tfidf's salience scoring.

    Bounded-state construction: a naive collect_set(doc_id) materializes
    the FULL posting list per token before truncating — for stop-words
    that is the whole corpus' ids in one aggregation buffer. Instead the
    distinct (token, doc) pairs are rank-filtered to the 10 smallest ids
    per token BEFORE any collect (window + row_number — Spark's
    WindowGroupLimit pushes the rank bound below the sort), so the only
    list ever built holds ≤10 elements; the df count is a separate
    partial-aggregating countDistinct that never builds a list at all.
    Top-50 by df is a TakeOrderedAndProject, never a global sort."""
    d = _docs(spark, sf_dir)
    pairs = (
        d.select("doc_id",
                 F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    dfreq = pairs.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"))
    w = Window.partitionBy("token").orderBy("doc_id")
    top10 = pairs.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") <= 10)
    postings = top10.groupBy("token").agg(
        F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
        .alias("postings"))
    return (
        dfreq.join(postings, "token")
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(50)
    )


@_q("ta_bigrams", textstats.bigram_frequencies_sql())
def ta_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams (n-gram analysis next to the unigram
    ta_term_frequency) — slice+zip_with pairing, no UDF."""
    return textstats.bigram_frequencies(_docs(spark, sf_dir))


@_q("ta_collocations", textstats.collocations_sql())
def ta_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked collocations (multiword-expression mining for tokenizer
    vocab curation): PMI's log is monotonic, so the rank rides the exact
    integer ratio n_ab·N_uni² / (N_bi·n_a·n_b) on the 1e-4 grid —
    DECIMAL(38)/HUGEINT products, full hash oracle, no float channel.
    min_count=5 kills hapax-pair noise. Two vocab-sized count tables,
    token-key joins, TakeOrdered top-20. See textstats.collocations."""
    return textstats.collocations(_docs(spark, sf_dir))


@_q("ta_readability", f"""
SELECT doc_id, {textstats.readability_q1e4_sql('text')} AS flesch_q1e4
FROM documents
""")
def ta_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease-style readability per document
    (textstats.readability_q1e4_expr) — word/sentence/vowel-group counts
    only, a narrow map, emitted on the exact 1e-4 integer grid (hash-proof
    integer output); extreme scores flag word-salad and run-on boilerplate
    in a curation pass."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        textstats.readability_q1e4_expr(F.col("text")).alias("flesch_q1e4"))


@_q("ta_bigram_logprob", textstats.bigram_logprob_sql())
def ta_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under the corpus's add-one-
    smoothed bigram LM — the count-based perplexity proxy for fluency/
    quality gating (textstats.bigram_logprob); count tables are
    vocabulary-sized, the per-doc mean rides the stable-sum path."""
    return textstats.bigram_logprob(_docs(spark, sf_dir))


