"""Corpus -> model-input layout: z-order, packing, splits, leakage, shuffle order, shard manifests, heavy hitters and dup-ngram coverage.

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
    load_table,
    textfns,
    textstats,
)
from multiagent_document_etl_system_spark.plans.registry.dedup import (
    _SHINGLE_SQL,
)
from multiagent_document_etl_system_spark.plans.registry.curation import (
    _DECON_SH_H,
)

_ZBITS = 12  # 4096-cell grid per dimension


def _zn_sql(col: str, lo: str, hi: str) -> str:
    grid = (1 << _ZBITS) - 1
    return (f"CAST(floor(({col} - {lo}) * {grid}.0 "
            f"/ greatest({hi} - {lo}, 1)) AS BIGINT)")


@_q("td_zorder_layout", f"""
WITH keyed AS (
  SELECT user_id, (EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) * 60
                   + EXTRACT(minute FROM CAST(ts AS TIMESTAMP))) AS moday
  FROM events
), ext AS (
  SELECT min(user_id) AS u0, max(user_id) AS u1,
         min(moday) AS m0, max(moday) AS m1
  FROM keyed
), z AS (
  SELECT user_id, moday,
    {curation.zorder_key_sql(_zn_sql('user_id', 'u0', 'u1'),
                             _zn_sql('moday', 'm0', 'm1'), _ZBITS)} AS zval
  FROM keyed CROSS JOIN ext
)
SELECT (zval >> {2 * _ZBITS - 6}) AS zbucket, count(*) AS n_rows,
  min(user_id) AS min_user, max(user_id) AS max_user,
  min(moday) AS min_minute, max(moday) AS max_minute
FROM z GROUP BY 1
""")
def td_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data layout: range-normalize user_id × minute-of-
    day onto a 4096² grid, interleave the bits into one clustering key
    (operators/curation.py:zorder_key — pure bitwise Catalyst expression,
    codegen'd, exact DuckDB twin), then summarize each top-6-bit z-prefix
    bucket with its min/max on BOTH source dimensions.

    Range normalization first is the production recipe (Delta OPTIMIZE
    ZORDER uses per-column range ids; raw-bit interleave would let the
    wider dimension's high bits drown the narrower one). The per-bucket
    min/max spans ARE the payoff: a z-prefix bucket maps to one output
    file under a ``repartitionByRange(zval) + sortWithinPartitions``
    write, and its narrow user_id AND minute ranges are exactly the
    parquet footer stats that let a scan with a predicate on EITHER
    column skip the file — multi-dimensional pruning from a one-
    dimensional sort. Scale: the extremes agg is one tiny reduce
    broadcast back (same trick at any sf); the key itself is a per-row
    map; the only other exchange is the 64-group bucket agg.
    tests/test_zorder.py asserts bit-exactness vs a Python reference and
    the both-dimension locality win over a time-sorted layout."""
    ev = load_table(spark, sf_dir, "events")
    moday = (F.hour("ts") * 60 + F.minute("ts")).cast("bigint")
    keyed = ev.select(F.col("user_id"), moday.alias("moday"))
    ext = keyed.agg(
        F.min("user_id").alias("u0"), F.max("user_id").alias("u1"),
        F.min("moday").alias("m0"), F.max("moday").alias("m1"),
    )
    grid = (1 << _ZBITS) - 1

    def zn(col: str, lo: str, hi: str):
        return F.floor(
            (F.col(col) - F.col(lo)) * F.lit(float(grid))
            / F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        ).cast("bigint")

    z = keyed.crossJoin(F.broadcast(ext)).select(
        "user_id", "moday",
        curation.zorder_key(zn("user_id", "u0", "u1"),
                            zn("moday", "m0", "m1"), _ZBITS).alias("zval"),
    )
    return (
        z.groupBy(F.shiftright(F.col("zval"), 2 * _ZBITS - 6)
                  .alias("zbucket"))
        .agg(F.count("*").alias("n_rows"),
             F.min("user_id").alias("min_user"),
             F.max("user_id").alias("max_user"),
             F.min("moday").alias("min_minute"),
             F.max("moday").alias("max_minute"))
    )


@_q("ta_heavy_hitters", textstats.heavy_hitters_sql(inv_epsilon=500))
def ta_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ε-heavy-hitters over the corpus vocabulary via per-partition
    Misra-Gries candidates + exact recount (operators/textstats.py:
    heavy_hitters). Unlike ta_term_frequency's full vocabulary groupBy,
    shuffle volume here is O(partitions/ε) no matter how many distinct
    tokens exist — the plan for billion-key vocabularies (URLs, n-grams,
    hashes). The sketch only nominates candidates; the exact recount +
    integer threshold make the result deterministic, hence a full DuckDB
    oracle despite the sanctioned mapInPandas stage."""
    return textstats.heavy_hitters(_docs(spark, sf_dir), inv_epsilon=500)


@_q("td_quality_calibration", f"""
WITH scored AS (
  SELECT doc_id, lang, {textstats.quality_q1e4_sql('text')} AS q
  FROM documents
), ranked AS (
  SELECT lang, q,
    row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id ASC) AS r,
    count(*) OVER (PARTITION BY lang) AS n
  FROM scored
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN r * 2 <= n THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(min(CASE WHEN r * 2 <= n THEN q END) AS BIGINT) AS thr_q1e4
FROM ranked GROUP BY lang
""")
def td_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality thresholds: keep the top half of
    each language by quality and report the cut point. Quality scores are
    not comparable ACROSS languages (length/stopword priors differ), so
    production curation calibrates the threshold per stratum rather than
    applying one global cut — this computes each language's kept count
    and its realized threshold (the lowest kept quality, as an exact
    1e-4-scaled integer).

    Deliberately RANK-based, not percentile-based: an interpolated
    median sits between grid points, and the two engines' interpolation
    formulas (``a+(b-a)d`` vs ``(1-d)a+db``) can differ by 1 ulp — a
    threshold compare against it could flip a boundary doc. Ranking by
    (quality desc, doc_id asc) is pure integer logic: zero cross-engine
    boundary risk, same adaptive-cut semantics. One window shuffle on
    lang; at 100 TB the same plan with quota fractions from a config
    dim."""
    d = _docs(spark, sf_dir)
    scored = d.select(
        "doc_id", "lang",
        textstats.quality_q1e4_expr(F.col("text")).alias("q"))
    w = Window.partitionBy("lang").orderBy(F.desc("q"), F.asc("doc_id"))
    ranked = scored.select(
        "lang", "q",
        F.row_number().over(w).alias("r"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"))
    kept = F.col("r") * 2 <= F.col("n")
    return ranked.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.min(F.when(kept, F.col("q"))).cast("bigint").alias("thr_q1e4"),
    )


@_q("ta_ngram_novelty", f"""
WITH toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS __toks
  FROM documents
), sh AS (
  SELECT id, unnest({_SHINGLE_SQL}) AS s FROM toks
), h AS (
  SELECT id, {dedup.hash64_sql('s')} AS sh_h FROM sh
), f AS (
  SELECT id, min(id) OVER (PARTITION BY sh_h) AS first_id FROM h
)
SELECT id AS doc_id,
  CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(CASE WHEN first_id = id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  {idiv_round_sql("10000 * sum(CASE WHEN first_id = id THEN 1 ELSE 0 END)",
                  "count(*)")} AS novelty_q1e4
FROM f GROUP BY id
""")
def ta_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's 3-gram
    shingles whose FIRST corpus occurrence (min doc_id) is this doc —
    the contribution/memorization proxy behind "does adding this doc
    teach the model anything new": near-zero novelty means every phrase
    already exists earlier in the corpus (boilerplate, syndication,
    re-crawls), and ordering docs by novelty is the greedy submodular
    heuristic for coverage-maximizing subset selection. Dual of
    ta_dup_ngram_coverage (corpus-frequency per doc) — same one-exchange
    shape: shingles shuffle once as 8-byte hashes for a min-window, then
    regroup per doc; integer outputs on the 1e-4 grid."""
    from multiagent_document_etl_system_spark.io import ensure_parallelism

    # shingle explode + per-shingle md5 is a heavy narrow map — fan the
    # scan to session parallelism first (r12 optimization round)
    d = ensure_parallelism(_docs(spark, sf_dir).select("doc_id", "text"))
    sh = d.select(
        F.col("doc_id"),
        F.explode(dedup.shingles(F.col("text"))).alias("s"))
    sh = sh.select("doc_id", dedup.hash64(F.col("s")).alias("sh_h"))
    w = Window.partitionBy("sh_h")
    f = sh.select("doc_id",
                  F.min("doc_id").over(w).alias("first_id"))
    novel = F.sum(F.when(F.col("first_id") == F.col("doc_id"), 1)
                  .otherwise(0)).cast("bigint")
    return (f.groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_shingles"),
                 novel.alias("n_novel"))
            .select("doc_id", "n_shingles", "n_novel",
                    idiv_round(F.col("n_novel") * F.lit(10_000),
                               F.col("n_shingles")).alias("novelty_q1e4")))


_DUP_NGRAM_COV_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLE_SQL}) AS s
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS __toks
        FROM documents)
), h AS (
  SELECT doc_id, {dedup.hash64_sql('s')} AS sh_h FROM sh
), cnt AS (
  SELECT sh_h, count(*) AS nd FROM h GROUP BY sh_h
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
  CAST(floor(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 10000.0 / count(*)
             + 0.5) AS BIGINT) AS cov_q1e4
FROM h JOIN cnt USING (sh_h) GROUP BY doc_id
"""


@_q("ta_dup_ngram_coverage", _DUP_NGRAM_COV_SQL)
def ta_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-n-gram coverage per document — the standard corpus
    duplication DIAGNOSTIC (what fraction of a doc's 3-gram shingles also
    appear in some other doc), the metric behind 'dedup improves LMs'
    analyses: run it before/after a dedup pass to quantify what the
    ladder removed. Distinct-shingle basis, so a shingle's global count
    equals its document frequency.

    Scale shape: shingles shuffle as 8-byte md5-derived hashes, never
    strings (the repo's ids-only-shuffle convention). The global count
    rides a WINDOW over sh_h (count(*) partitionBy, no order), not a
    count-table join: one big exchange on sh_h + one doc_id regroup
    instead of TWO sh_h moves + SMJ — measured 2.1x (6.26s -> 2.94s,
    sf0.1 best-of-4, identical results row-for-row). Trade-off audited:
    a window partition holds one shingle's full df rows on one task, so
    a pathological mega-boilerplate shingle (1e8+ docs) would straggle
    where the join plan's AQE skew-split would not — WindowExec spills,
    so it degrades, not OOMs. r10 planted and measured the regime
    (SCALE.md --boiler fabric): at df = 150k the straggler does NOT yet
    bite (a 150k-row window partition is ~2.4 MB — the hot decade is
    volume-bound at exp ~0.88 for this plan AND the straggler-proof
    twin alike); the warning regime starts where one partition's df
    approaches executor memory. On a corpus that can reach it, use
    ta_dup_ngram_coverage_strip — same rows, same oracle, doc-sampled
    hot-shingle probe + salted hot partitions, max cold partition
    bounded with exponentially-small miss probability. Price that
    insurance honestly: with the probe INSIDE the timed rep (ADVICE
    r10) the strip measures ~1.09× this plan on the organic fabric and
    ~2× on the boiler fabric at 100× (SCALE.md r11) — this plain plan
    is the right default everywhere the fabrics can test, and the r10
    verdict-#8 auto-route was deliberately NOT wired for that reason.
    Exact integer outputs (coverage as a scaled-int ratio) => full hash
    oracle."""
    from multiagent_document_etl_system_spark.io import ensure_parallelism

    # shingle explode + per-shingle md5 is a heavy narrow map — fan the
    # scan to session parallelism first (r12 optimization round)
    d = ensure_parallelism(_docs(spark, sf_dir).select("doc_id", "text"))
    sh = d.select(
        "doc_id",
        F.explode(dedup.shingles(F.col("text"), 3)).alias("s"))
    h = sh.select("doc_id", dedup.hash64(F.col("s")).alias("sh_h"))
    nd = F.count("*").over(Window.partitionBy("sh_h"))
    flagged = h.select(
        "doc_id", F.when(nd > 1, 1).otherwise(0).alias("_f"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum("_f").cast("bigint").alias("n_dup"),
            F.floor(F.sum("_f") * 10000.0 / F.count("*") + F.lit(0.5))
            .cast("bigint").alias("cov_q1e4"),
        )
    )


@_q("ta_dup_ngram_coverage_strip", _DUP_NGRAM_COV_SQL)
def ta_dup_ngram_coverage_strip(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Skew-hardened twin of ta_dup_ngram_coverage — SAME rows, same
    oracle, different physical strategy: a seeded Bernoulli DOC-sample
    probe (NOT Misra-Gries — an MG mapInPandas pass was measured 2×
    worse and abandoned, see the operator docstring) finds mega-df
    shingle candidates, which are flagged duplicated directly
    (distinct-shingle basis ⇒ freq ≥ 2 IS duplication, and a df-1
    shingle lives in ONE doc so doc-sampling can never see it twice —
    the ≥2 floor is false-positive-free regardless of sampling luck),
    while ONE window pass runs over all rows with hot shingles salted
    64 ways (their count is never read) and cold shingles unsalted
    (their count stays exact). Probabilistic miss bound: a df-d shingle
    escapes the frac=0.01 doc probe with probability ≲ (1-frac)^d —
    exponential decay in df, so the mega-df regime the strip exists for
    is caught with near certainty; a borderline miss costs one
    modestly-oversized window partition, never a wrong row.
    This is the `ta_heavy_hitters pre-strip` mitigation the plain
    query's docstring names for corpora carrying a mega-boilerplate
    shingle. Measured honestly (r11, probe inside the timed rep —
    ADVICE r10): the strip costs ~1.09× the plain plan on the organic
    100× fabric and ~2× on the boiler fabric, because at df = 150k the
    plain plan's straggler does not yet bite while the probe re-runs
    per execution — so this query is the INSURANCE PLAN for df regimes
    orders of magnitude beyond the fabric (one window partition
    approaching executor memory), not a default (the r10 verdict-#8
    auto-route was evaluated and deliberately not wired). SCALE.md r11
    has the full table."""
    return textstats.dup_ngram_coverage_stripped(_docs(spark, sf_dir))


@_q("td_span_dedup", dedup.span_dedup_sql(n=3, min_df=2))
def td_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-SPAN removal (operators/dedup.span_dedup): cut every
    token 3-gram span appearing in ≥2 distinct documents and report
    per-doc removal accounting + the cleaned-text fingerprint — the
    passage-level dedup whole-doc exact/MinHash cannot do (boilerplate
    headers, license blocks, templated passages inside otherwise-unique
    docs; the Lee et al. 2022 exact-substring recipe at shingle
    granularity). Complements ta_dup_ngram_coverage: that measures, this
    removes. Integer + md5-string outputs => full hash oracle."""
    return dedup.span_dedup(_docs(spark, sf_dir), n=3, min_df=2)


# ------------------------------------------------- corpus -> model inputs

_TOKS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


@_q("td_tokenize_ids", f"""
WITH toks AS (
  SELECT doc_id, token, pos FROM (
    SELECT doc_id, unnest(ts) AS token,
      unnest(generate_series(1, len(ts))) AS pos
    FROM (SELECT doc_id, {_TOKS_SQL} AS ts
          FROM documents WHERE text IS NOT NULL)
  ) WHERE token <> ''
), vocab AS (
  SELECT token,
    row_number() OVER (ORDER BY cnt DESC, token ASC) AS tid
  FROM (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
  ORDER BY cnt DESC, token ASC LIMIT 1024
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN tid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
  array_to_string(list(CAST(coalesce(tid, 0) AS VARCHAR) ORDER BY pos), ',')
    AS ids
FROM toks LEFT JOIN vocab USING (token)
GROUP BY doc_id
""")
def td_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → token-id sequences (the text-to-model-input step of a
    training pipeline): learn a frequency-ranked vocabulary (top 1024
    tokens, count-desc/token-asc tie-break — fully deterministic), then
    map every document to its id sequence with 0 = out-of-vocabulary,
    plus token/OOV counts. Docs with no tokens (NULL/empty text) have no
    id sequence and are absent by definition.

    Scale shape: the vocab is two aggregations ending in a GlobalLimit
    (bounded 1024 rows — legitimately broadcast); the corpus side is one
    posexplode + broadcast join + one shuffle on doc_id to reassemble
    sequences in position order (array_sort(collect_list(struct)), the
    v9 pattern). Ids emit as a CSV string — registry outputs are
    scalar-only (driver canon cannot sort array cells)."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    toks = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.lower("text")), r"\s+"))
            .alias("pos0", "token"))
        .filter(F.col("token") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(1024)
        .withColumn("tid", F.row_number().over(w))
        .select("token", "tid")
    )
    joined = toks.join(F.broadcast(vocab), "token", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("tid").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_oov"),
            F.concat_ws(",", F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "pos", F.coalesce(F.col("tid"), F.lit(0)).alias("tid")))),
                lambda st: st["tid"].cast("string"),
            )).alias("ids"),
        )
    )


# ---------------------------------------------- train-prep assignment ops
# (round-4 additions: the three assignment decisions every training-data
# loader makes — split membership, importance acceptance, and global
# shuffle order — each as a deterministic content-hash function of the row,
# so retries, speculative tasks, and engine choice can never change an
# assignment. rand() could not give any of these properties.)

_SPLIT_B = f"{dedup.hash64_sql('CAST(doc_id AS VARCHAR)', seed=41)} % 100"


@_q("td_split", f"""
SELECT doc_id, lang,
  CASE WHEN {_SPLIT_B} < 90 THEN 'train'
       WHEN {_SPLIT_B} < 95 THEN 'val'
       ELSE 'test' END AS split
FROM documents
""")
def td_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (90/5/5): the split is
    a pure hash function of the doc id (seeded md5 bucket mod 100), so it
    is stable across runs, engines, and corpus growth — re-running the
    pipeline after appending new docs never migrates an old doc between
    splits (a leakage bug rand()-based splits have). Narrow map, zero
    shuffles at any scale."""
    d = _docs(spark, sf_dir)
    b = dedup.hash64(F.col("doc_id").cast("string"), seed=41) % 100
    return d.select(
        "doc_id", "lang",
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
        .alias("split"),
    )


@_q("td_split_leakage", f"""
WITH sp AS (
  SELECT doc_id, text,
    CASE WHEN {_SPLIT_B} < 90 THEN 'train'
         WHEN {_SPLIT_B} < 95 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
), tr AS (
  SELECT DISTINCT {_DECON_SH_H} AS sh_h FROM (
    SELECT unnest({_SHINGLE_SQL}) AS sh
    FROM (SELECT string_split_regex(trim(text), '\\s+') AS __toks
          FROM sp WHERE split = 'train')
  )
), ev AS (
  SELECT doc_id, unnest({_SHINGLE_SQL}) AS sh
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS __toks
        FROM sp WHERE split <> 'train')
), m AS (
  SELECT doc_id, count(*) AS n_shared
  FROM (SELECT doc_id, {_DECON_SH_H} AS sh_h FROM ev) e
  JOIN tr USING (sh_h) GROUP BY doc_id
)
SELECT s.doc_id, s.split,
  CAST(coalesce(m.n_shared, 0) AS BIGINT) AS n_shared,
  coalesce(m.n_shared, 0) >= 5 AS leaked
FROM (SELECT doc_id, split FROM sp WHERE split <> 'train') s
LEFT JOIN m USING (doc_id)
""")
def td_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→held-out leakage audit over td_split's own hash split: for
    every val/test doc, the distinct 3-gram shingles it shares with ANY
    train doc, and a leaked flag at the td_decontaminate threshold (≥5).
    The self-audit step of a corpus build — internal near-duplicates that
    straddle the split boundary inflate eval scores in a way external-
    benchmark decontamination never sees.

    Unlike td_decontaminate (eval side workload-bounded ⇒ broadcast
    sanctioned), BOTH sides here scale with the corpus, so the plan is a
    pure shuffle equi-join of 64-bit shingle hashes — see
    curation.split_cross_leakage for the full scale argument."""
    d = _docs(spark, sf_dir)
    b = dedup.hash64(F.col("doc_id").cast("string"), seed=41) % 100
    split = (F.when(b < 90, "train").when(b < 95, "val").otherwise("test"))
    return curation.split_cross_leakage(d, split, n=3, min_shared=5)


@_q("td_importance_resample", f"""
SELECT doc_id, lang, quality_q1e4,
  p_q1e6 * 100 < quality_q1e4 * quality_q1e4 AS accepted
FROM (
  SELECT doc_id, lang,
    {textstats.quality_q1e4_sql('text')} AS quality_q1e4,
    CAST({dedup.hash64_sql('CAST(doc_id AS VARCHAR)', seed=13)} % 1000000
         AS BIGINT) AS p_q1e6
  FROM documents
)
""")
def td_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance resampling (the DSIR-family curation
    move): accept each doc with probability quality², via a deterministic
    hash-uniform draw — high-quality docs pass ~1:1, junk is heavily
    downsampled, and the SAME docs are accepted on every run/engine/retry.
    The acceptance test is PURE INTEGER: draw p ∈ [0,1) as hash‰1e6,
    accept iff p·100 < q1e4² (both sides exact BIGINTs ≤ 1e8) — no float
    compare to flake cross-engine the way exp()-based weights could
    (libm exp differs by 1 ulp between runtimes). Narrow map, zero
    shuffles."""
    d = _docs(spark, sf_dir)
    q = textstats.quality_q1e4_expr(F.col("text"))
    p = (dedup.hash64(F.col("doc_id").cast("string"), seed=13)
         % 1_000_000).cast("bigint")
    return d.select(
        "doc_id", "lang", q.alias("quality_q1e4"), p.alias("_p"),
    ).select(
        "doc_id", "lang", "quality_q1e4",
        (F.col("_p") * F.lit(100).cast("bigint")
         < F.col("quality_q1e4") * F.col("quality_q1e4")).alias("accepted"),
    )


@_q("td_shuffle_order", f"""
SELECT doc_id, shard, CAST(pos AS BIGINT) AS pos FROM (
  SELECT doc_id, shard,
    row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
  FROM (SELECT doc_id,
          {dedup.hash64_sql('CAST(doc_id AS VARCHAR)', seed=97)} % 8 AS shard,
          {dedup.hash64_sql('CAST(doc_id AS VARCHAR)', seed=97)} AS h
        FROM documents)
)
""")
def td_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: every doc gets a
    (shard, position) from a seeded content hash — shard = hash mod N,
    position = rank of the hash within the shard. Reading shards in order
    yields a reproducible pseudo-random permutation of the corpus (what a
    dataloader needs for epoch order), with NO global sort: the only
    shuffle is the hash partition + per-shard window, and shards are
    independent so N scales with the cluster. rand() cannot do this —
    a retried task would deal a different order."""
    d = _docs(spark, sf_dir)
    h = dedup.hash64(F.col("doc_id").cast("string"), seed=97)
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", (h % 8).alias("shard"), h.alias("h"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


@_q("td_shard_manifest", f"""
SELECT {dedup.hash64_sql('CAST(doc_id AS VARCHAR)', seed=97)} % 8 AS shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len({textfns.tokens_sql('text')})) AS BIGINT) AS n_tokens,
  CAST(sum(n_chars) AS BIGINT) AS n_chars,
  CAST(min(doc_id) AS BIGINT) AS min_doc_id,
  CAST(max(doc_id) AS BIGINT) AS max_doc_id,
  bit_xor({dedup.hash64_sql('text', seed=11)}) AS content_xor64
FROM documents GROUP BY 1 ORDER BY shard
""")
def td_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard MANIFEST for the training-data export — the terminal
    artifact a dataloader (and an auditor) reads next to the shard files:
    per shard (td_shuffle_order's deterministic hash-mod-8 assignment),
    the doc count, total whitespace tokens, total chars, the doc-id
    range, and an order-insensitive 60-bit content checksum (bit_xor of
    the seeded content hash — any lost, duplicated, or altered document
    flips it, and XOR commutes so the value is independent of task
    scheduling). Both engines aggregate the identical md5-derived BIGINT,
    so even the checksums are hash-oracled.

    Scale: ONE corpus scan, one shuffle on the 8-row shard key with full
    map-side partial aggregation (count/sum/min/max/xor all combine);
    the manifest is #shards rows at any corpus size."""
    d = _docs(spark, sf_dir)
    shard = dedup.hash64(F.col("doc_id").cast("string"), seed=97) % 8
    return (
        d.select(
            shard.alias("shard"),
            "doc_id", "n_chars",
            F.size(textfns.tokens(F.col("text"))).alias("_nt"),
            dedup.hash64(F.col("text"), seed=11).alias("_ch"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.expr("bit_xor(_ch)").alias("content_xor64"),
        )
        .orderBy("shard")
    )


# ------------------------------------------------- bloom / CDC / kNN graph

