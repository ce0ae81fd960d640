"""Corpus-curation operators for LLM training-data pipelines.

The reference processes one document at a time and has no corpus-level
hygiene surface (/root/reference/src/agents.py:377-428 — per-doc invoke);
a 100 TB training-data pipeline needs set-oriented curation before any
token reaches a model. Three first-class operators, all pure Catalyst
expressions with exact DuckDB twins:

- :func:`decontaminate` — n-gram-overlap decontamination against an
  eval/benchmark set (the standard guard against test-set leakage into
  training data; cf. GPT-3 appendix C / PaLM §C: 13-gram overlap).
- :func:`gopher_rules` — repetition / quality heuristics in the style of
  Gopher (Rae et al. 2021, table A1): word-count bounds, mean word length,
  duplicate-2-gram fraction, stop-word floor.
- :func:`domain_mix` — per-source sampling weights toward a target domain
  distribution + deterministic hash-based subsampling (the mixing step of
  every pretraining corpus build).

Scale posture (100 TB):

- decontaminate broadcasts the EVAL side (benchmarks are tiny — MMLU-sized,
  not corpus-sized) and ships only 64-bit shingle hashes, so the corpus is
  scanned once, shuffled never: explode → broadcast-hash semi-match →
  partial-agg count per doc.
- gopher_rules is a narrow per-row map — no shuffle at all.
- domain_mix aggregates once on `source` (low-cardinality ⇒ tiny shuffle),
  broadcasts the per-source weights back, and samples with a deterministic
  per-row hash — no RNG state, reproducible across retries/speculative
  tasks (rand() is NOT; a re-run task would sample a different subset).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.functions.numeric import (
    idiv_round,
    idiv_round_sql,
)
from multiagent_document_etl_system_spark.functions.text import tokens
from multiagent_document_etl_system_spark.io import ensure_parallelism
from multiagent_document_etl_system_spark.operators.dedup import (
    hash64,
    shingles,
)


# ---------------------------------------------------------- decontamination

def decontaminate(corpus: DataFrame, eval_docs: DataFrame,
                  n: int = 3, min_shared: int = 5,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, n_shared, keep): n_shared = # distinct word-``n``-gram shingles
    the doc shares with ANY eval doc; ``keep`` = n_shared < min_shared.

    Duplicated/near-duplicated eval material shares almost all its shingles
    and is dropped; incidental collisions (a few common n-grams) stay under
    the threshold. The eval side reduces to a distinct set of 64-bit
    shingle hashes and is broadcast — the corpus never shuffles.
    """
    ev = (
        eval_docs
        .select(F.explode(shingles(F.col(text_col), n)).alias("_sh"))
        .select(hash64(F.col("_sh")).alias("_sh_h"))
        .distinct()
    )
    # corpus side fanned to session parallelism before the shingle
    # explode + per-shingle md5 (the shingle_sets convention; a
    # single-row-group scan would serialize the whole map stage — r12
    # optimization round). The eval side is workload-bounded tiny.
    corp_sh = ensure_parallelism(corpus.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("_sh"),
    ).select(F.col(id_col), hash64(F.col("_sh")).alias("_sh_h"))
    # shingle sets are distinct per doc and ev is distinct ⇒ count(*) is
    # the distinct-shared-shingle count, no second dedup needed
    matches = (
        corp_sh.join(F.broadcast(ev), "_sh_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        corpus.select(id_col)
        .join(matches, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint")
            .alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) < min_shared)
            .alias("keep"),
        )
    )


def split_cross_leakage(docs: DataFrame, split_col: Column,
                        n: int = 3, min_shared: int = 5,
                        train_value: str = "train",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Cross-SPLIT leakage audit: for every held-out doc (``split_col !=
    train_value``), the number of distinct word-``n``-gram shingles it
    shares with ANY training doc — (id, split, n_shared, leaked) with
    ``leaked = n_shared >= min_shared``.

    This is the self-audit every training-data build runs AFTER splitting:
    :func:`decontaminate` guards against an EXTERNAL benchmark set, but a
    val/test split carved from the same crawl leaks through internal
    near-duplicates (two mirrors of one page landing on opposite sides of
    the hash split), which silently inflates eval scores. Run it after
    dedup: surviving leaks mean the dedup threshold is too loose.

    Plan — and why it is NOT :func:`decontaminate`'s plan: there the eval
    side is workload-bounded (MMLU-sized forever) and broadcasting it is
    sanctioned; here BOTH sides are split fractions of the corpus and grow
    with it, so nothing may be broadcast. Each side reduces to 64-bit
    shingle hashes (train side distinct ⇒ one map-side-combined shuffle of
    8-byte keys; held-out shingles are distinct per doc by construction),
    then a plain shuffle equi-join on the hash feeds a per-doc count —
    ids + 8-byte hashes are the ONLY thing on the wire, AQE splits
    boilerplate-shingle skew, and every stage scales with the cluster.
    """
    # both sides fanned to session parallelism before the shingle
    # explode + per-shingle md5 (the shingle_sets convention — r12
    # optimization round); the held-side id/split projection for the
    # final join stays on the raw scan (ids only, no heavy map)
    sides = docs.select(F.col(id_col), F.col(text_col),
                        split_col.alias("split"))
    train_sh = (
        ensure_parallelism(sides.filter(F.col("split") == train_value)
                           .select(text_col))
        .select(F.explode(shingles(F.col(text_col), n)).alias("_sh"))
        .select(hash64(F.col("_sh")).alias("_sh_h"))
        .distinct()
    )
    held = sides.filter(F.col("split") != train_value)
    held_sh = ensure_parallelism(held.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("_sh"),
    ).select(F.col(id_col), hash64(F.col("_sh")).alias("_sh_h"))
    # held-out shingle sets are distinct per doc and train_sh is distinct
    # ⇒ count(*) == distinct-shared-shingle count
    matches = (
        held_sh.join(train_sh, "_sh_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        held.select(id_col, "split")
        .join(matches, id_col, "left")
        .select(
            id_col, "split",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint")
            .alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) >= min_shared)
            .alias("leaked"),
        )
    )


# ---------------------------------------------------------- quality rules

GOPHER_STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to")


def _ngram_list(toks: Column, n: int) -> Column:
    """NON-distinct n-gram list (repetition measurement needs multiplicity)."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )


def _gopher_stat_exprs(toks: Column) -> tuple[Column, Column, Column,
                                              Column]:
    """(n_words, mean_word_len_q1e4, dup2_frac_q1e4, stop_hits) as Catalyst
    expressions over an ALREADY-TOKENIZED column — shared by the audit
    table (:func:`gopher_rules`) and the inline gate (:func:`gopher_keep`)
    so both apply identical statistics.

    The two ratio stats are EXACT 1e-4-scaled BIGINTs (half-up integer
    rounding via numeric.idiv_round), not rounded doubles: the gates
    compare them against thresholds, and an integer compare can never
    flip cross-engine the way an engine-``round()``ed double at a half
    boundary can (the td_prepare_corpus driver-red class).

    Taking the token array (not raw text) matters for throughput: the four
    stats reference the array ~6 times, and codegen does not unify the
    repeated ``split`` across higher-order-function lambdas — measured 5x
    (2.65 s -> 0.51 s at sf0.1) when the caller stages ``tokens(text)`` as
    a materialized column first."""
    n_words = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0).cast("bigint"),
                          lambda s, t: s + F.length(t))
    mean_wl_q = idiv_round(sum_len * F.lit(10000),
                           F.greatest(n_words.cast("bigint"),
                                      F.lit(1).cast("bigint")))
    bigrams = _ngram_list(toks, 2)
    n_bg = F.greatest(F.size(bigrams).cast("bigint"),
                      F.lit(1).cast("bigint"))
    dup2_q = idiv_round(
        (F.size(bigrams) - F.size(F.array_distinct(bigrams)))
        .cast("bigint") * F.lit(10000), n_bg)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS)))
    return n_words, mean_wl_q, dup2_q, stop_hits


def gopher_keep(toks: Column,
                min_words: int = 20, max_words: int = 100_000,
                min_mean_word_len: float = 2.0,
                max_mean_word_len: float = 10.0,
                max_dup2_frac: float = 0.75,
                min_stop_hits: int = 2) -> Column:
    """The combined Gopher gate as ONE boolean Column over a PRE-TOKENIZED
    column — for composed pipelines where the gate is a flag in a wider
    funnel (a narrow map, no self-join against the audit table). Callers
    stage ``tokens(text)`` as a materialized column and pass that (see
    :func:`_gopher_stat_exprs` for the 5x rationale). Float thresholds
    are mapped onto the exact 1e-4 integer grid the stats live on."""
    n_words, mean_wl_q, dup2_q, stop_hits = _gopher_stat_exprs(toks)
    return (
        n_words.between(min_words, max_words)
        & mean_wl_q.between(int(min_mean_word_len * 10000),
                            int(max_mean_word_len * 10000))
        & (dup2_q <= int(max_dup2_frac * 10000))
        & (stop_hits >= min_stop_hits)
    )


def gopher_keep_sql(text_expr: str,
                    min_words: int = 20, max_words: int = 100_000,
                    min_mean_word_len: float = 2.0,
                    max_mean_word_len: float = 10.0,
                    max_dup2_frac: float = 0.75,
                    min_stop_hits: int = 2) -> str:
    """DuckDB twin of :func:`gopher_keep` (scalar subquery over the token
    list so the stats are computed once per row; same exact integer-grid
    stats as the Spark side)."""
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    mean_q = idiv_round_sql(
        "CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)"
        " * 10000", "greatest(len(t), 1)")
    dup2_q = idiv_round_sql(
        "CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) * 10000",
        "greatest(len(bg), 1)")
    return f"""
(SELECT (len(t) BETWEEN {min_words} AND {max_words})
    AND ({mean_q}
         BETWEEN {int(min_mean_word_len * 10000)}
             AND {int(max_mean_word_len * 10000)})
    AND ({dup2_q} <= {int(max_dup2_frac * 10000)})
    AND (len(list_filter(t, x -> x IN ({stops}))) >= {min_stop_hits})
 FROM (SELECT t, [array_to_string(t[i:i+1], ' ')
                  for i in generate_series(1, greatest(len(t)-1, 1))] AS bg
       FROM (SELECT string_split_regex(trim({text_expr}), '\\s+') AS t)))
""".strip()


def gopher_rules(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 20, max_words: int = 100_000,
                 min_mean_word_len: float = 2.0,
                 max_mean_word_len: float = 10.0,
                 max_dup2_frac: float = 0.75,
                 min_stop_hits: int = 2) -> DataFrame:
    """Gopher-style per-document quality gates (narrow map, no shuffle).

    Emits the measured statistics, one boolean per rule, and the combined
    ``keep`` — keeping the individual rule columns makes the filter
    auditable (every serious corpus pipeline reports per-rule kill rates).
    """
    n_words, mean_wl_q, dup2_q, stop_hits = _gopher_stat_exprs(F.col("_toks"))
    # narrow but CPU-heavy (tokenize + n-gram stats per row): fan the
    # scan to session parallelism first (r12 optimization round)
    out = ensure_parallelism(df.select(id_col, text_col)) \
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")) \
        .select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        mean_wl_q.alias("mean_word_len_q1e4"),
        dup2_q.alias("dup2_frac_q1e4"),
        stop_hits.cast("bigint").alias("stop_hits"),
    )
    r_len = F.col("n_words").between(min_words, max_words)
    r_wl = F.col("mean_word_len_q1e4").between(
        int(min_mean_word_len * 10000), int(max_mean_word_len * 10000))
    r_rep = F.col("dup2_frac_q1e4") <= int(max_dup2_frac * 10000)
    r_stop = F.col("stop_hits") >= min_stop_hits
    return out.select(
        "*",
        r_len.alias("r_len"), r_wl.alias("r_word_len"),
        r_rep.alias("r_repetition"), r_stop.alias("r_stopwords"),
        (r_len & r_wl & r_rep & r_stop).alias("keep"),
    )


def gopher_rules_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text",
                     min_words: int = 20, max_words: int = 100_000,
                     min_mean_word_len: float = 2.0,
                     max_mean_word_len: float = 10.0,
                     max_dup2_frac: float = 0.75,
                     min_stop_hits: int = 2) -> str:
    """DuckDB twin of :func:`gopher_rules` (same exact integer-grid stats,
    same gates)."""
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    mean_q = idiv_round_sql(
        "CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)"
        " * 10000", "greatest(len(t), 1)")
    dup2_q = idiv_round_sql(
        "CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) * 10000",
        "greatest(len(bg), 1)")
    wl_lo, wl_hi = int(min_mean_word_len * 10000), int(max_mean_word_len * 10000)
    d2_hi = int(max_dup2_frac * 10000)
    return f"""
WITH toks AS (
  SELECT {id_col}, string_split_regex(trim({text_col}), '\\s+') AS t
  FROM {table}
), grams AS (
  SELECT {id_col},
    [array_to_string(t[i:i+1], ' ')
     for i in generate_series(1, greatest(len(t)-1, 1))] AS bg,
    t
  FROM toks
), stats AS (
  SELECT {id_col},
    CAST(len(t) AS BIGINT) AS n_words,
    {mean_q} AS mean_word_len_q1e4,
    {dup2_q} AS dup2_frac_q1e4,
    CAST(len(list_filter(t, x -> x IN ({stops}))) AS BIGINT) AS stop_hits
  FROM grams
)
SELECT *,
  n_words BETWEEN {min_words} AND {max_words} AS r_len,
  mean_word_len_q1e4 BETWEEN {wl_lo} AND {wl_hi} AS r_word_len,
  dup2_frac_q1e4 <= {d2_hi} AS r_repetition,
  stop_hits >= {min_stop_hits} AS r_stopwords,
  (n_words BETWEEN {min_words} AND {max_words})
    AND (mean_word_len_q1e4 BETWEEN {wl_lo} AND {wl_hi})
    AND dup2_frac_q1e4 <= {d2_hi}
    AND stop_hits >= {min_stop_hits} AS keep
FROM stats
"""


# ---------------------------------------------------------- domain mixing

def domain_mix(df: DataFrame, target_share: Column,
               source_col: str = "source", id_col: str = "doc_id",
               sample_scale: float = 0.5, seed: int = 7) -> DataFrame:
    """Per-source mixing weights toward a target distribution, plus a
    deterministic hash-Bernoulli subsample at ``sample_scale × weight``.

    ``target_share`` is an unnormalized per-row target expression (e.g. a
    CASE on the source name); it is normalized over the observed sources.
    Output per source: n_docs, actual share, normalized target share,
    weight = target/actual, and n_sampled under p = min(1, scale·weight).

    Sampling uses the shared md5-derived 60-bit hash of (seed:doc_id) —
    reproducible across engines, retries, and speculative task re-runs,
    which ``rand()`` is not.
    """
    per_source = (
        df.select(F.col(source_col), F.col(id_col), target_share.alias("_t"))
        .withColumn(
            "_p_row",
            (hash64(F.col(id_col).cast("string"), seed=seed) % 1_000_000)
            .cast("double") / 1_000_000.0,
        )
    )
    agg = per_source.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.max("_t").alias("_t"),  # target is constant per source
    )
    tot = agg.agg(
        F.sum("n_docs").alias("_n_total"),
        F.sum("_t").alias("_t_total"),
    )
    w = (
        agg.crossJoin(F.broadcast(tot))
        .select(
            source_col, "n_docs",
            F.round(F.col("n_docs") / F.col("_n_total"), 4).alias("share"),
            F.round(F.col("_t") / F.col("_t_total"), 4)
            .alias("target_share"),
            F.round((F.col("_t") / F.col("_t_total"))
                    / (F.col("n_docs") / F.col("_n_total")), 4)
            .alias("weight"),
        )
    )
    p = F.least(F.lit(1.0), F.lit(sample_scale) * F.col("weight"))
    sampled = (
        per_source.join(F.broadcast(w.select(source_col, "weight")),
                        source_col)
        .filter(F.col("_p_row") < p)
        .groupBy(source_col)
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        w.join(sampled, source_col, "left")
        .select(
            source_col, "n_docs", "share", "target_share", "weight",
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("bigint")
            .alias("n_sampled"),
        )
    )


# ------------------------------------------------------ dataset versioning

def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  hash_cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """(id, status ∈ {added, removed, changed, unchanged}) — the dataset-
    versioning diff between two corpus snapshots: full outer join on the
    id plus a content-hash compare over ``hash_cols``.

    Scale posture: each side reduces to (id, md5) BEFORE the join — the
    shuffle carries 2 small columns, never document bodies; both sides
    hash-partition on the same key (co-partitioned exchange, AQE-skew-
    splittable). md5 collapses arbitrary-width row comparison into one
    128-bit compare, so adding columns to ``hash_cols`` never widens the
    shuffle. This is the incremental-build primitive: `changed ∪ added`
    is exactly the work list for the next pipeline run.
    """
    def keyed(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.md5(F.concat_ws("\x1f", *hash_cols)).alias(alias),
        )

    j = keyed(old, "_oh").join(keyed(new, "_nh"), "_id", "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("_id").alias(id_col), status.alias("status"))


# ---------------------------------------------------------- z-order layout

def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns (x at even positions, y at odd).

    Sorting (or range-partitioning) a table by this key clusters rows
    that are close in BOTH dimensions into the same output files, so
    parquet footer min/max stats stay narrow on EITHER column and a scan
    with a predicate on just one of them skips most files — the layout
    trick behind Delta's OPTIMIZE ZORDER and ClickHouse's mortonEncode,
    here as a pure Catalyst bitwise expression (no UDF, codegen-able).

    The reference has no layout surface at all (single-doc pipeline);
    this is the 100 TB write-path complement to its per-doc reads.
    """
    xi = x.cast("bigint")
    yi = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — identical bit algebra, so the
    oracle restates the layout key exactly."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


# ------------------------------------------------- model-based quality gate

CLASSIFIER_SEED = 11
CLASSIFIER_BUCKETS = 2001  # weights on the 1e-3 grid: [-1000, +1000]


def _feature_weight(feat: Column, seed: int = CLASSIFIER_SEED) -> Column:
    """Integer weight in [-1000, 1000] for one hashed feature (q1e3 grid).

    The weight table is a DETERMINISTIC HASH PROJECTION standing in for
    trained fastText/logistic weights — the container ships no model
    weights (same honesty contract as operators/embed.py's fake encoder).
    A real model drops in by replacing this one expression with a lookup
    into a broadcast (feature-hash → weight) map; every other part of the
    plan — tokenization, bigram featurization, the sparse dot product,
    the zero-shuffle row-local fold — is exactly the production shape.
    """
    return hash64(feat, seed=seed) % CLASSIFIER_BUCKETS - 1000


def quality_classifier(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """fastText-family hashed linear quality classifier (inference):
    (id, n_feats, score_q1e3, keep) per document.

    This is the model-based quality gate every modern pretraining corpus
    runs beside the heuristic one (CCNet's fastText LM filter; LLaMA's
    wiki-reference classifier; Gopher §A1.2): features = unigrams +
    adjacent-bigram hashes (the fastText hashing trick), score = mean
    feature weight, keep = score ≥ 0 (docs scoring below the hyperplane
    are dropped).

    Everything is integer-exact on the q1e3 grid: weights are integers in
    [-1000, 1000] derived from the shared md5 60-bit hash (oracle-
    reproducible), the mean is the half-up integer identity shifted into
    the non-negative domain (score = round((Σw + 1000·n)/n) − 1000), and
    the keep flag is an integer compare — no float anywhere.

    Scale posture (100 TB): a pure narrow map — the feature fold runs as
    ``F.aggregate`` over the row-local token array, so NOTHING shuffles
    and no per-feature row ever exists (contrast a naive explode →
    groupBy, which would ship one row per token across the wire). The
    classifier scans the corpus once at full codegen speed.
    """
    toks = F.filter(tokens(F.lower(F.col(text_col))),
                    lambda x: F.length(x) > 0)
    # narrow but CPU-heavy (one md5 per unigram+bigram feature): fan the
    # scan to session parallelism first (r12 optimization round)
    d = ensure_parallelism(df.select(id_col, text_col)) \
        .select(F.col(id_col), toks.alias("_tk"))
    n1 = F.greatest(F.size("_tk") - F.lit(1), F.lit(0))
    pairs = F.zip_with(F.slice("_tk", 1, n1), F.slice(F.col("_tk"), 2, n1),
                       lambda a, b: F.concat(a, F.lit(" "), b))
    feats = F.concat(F.col("_tk"), pairs)
    scored = d.select(
        id_col,
        F.size(feats).cast("bigint").alias("n_feats"),
        F.aggregate(feats, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + _feature_weight(x)).alias("_wsum"),
    )
    n = F.col("n_feats")
    score = (
        idiv_round(F.col("_wsum") + F.lit(1000) * n, F.greatest(n, F.lit(1)))
        - F.lit(1000)
    )
    return scored.select(
        id_col, "n_feats",
        F.when(n > 0, score).otherwise(F.lit(0)).cast("bigint")
        .alias("score_q1e3"),
        ((n > 0) & (score >= 0)).alias("keep"),
    )


def quality_classifier_sql(table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """DuckDB twin of :func:`quality_classifier` (same hash, same grid)."""
    from multiagent_document_etl_system_spark.operators.dedup import (
        hash64_sql,
    )
    tk = (f"list_filter(string_split_regex(trim(lower({text_col})), "
          f"'\\s+'), t -> length(t) > 0)")
    w = f"({hash64_sql('f', seed=CLASSIFIER_SEED)} % {CLASSIFIER_BUCKETS} - 1000)"
    score = idiv_round_sql("wsum + 1000 * n_feats", "greatest(n_feats, 1)")
    return f"""
WITH d AS (
  SELECT {id_col}, {tk} AS tk FROM {table}
), f AS (
  SELECT {id_col},
    list_concat(tk, list_transform(generate_series(1, len(tk) - 1),
                                   i -> tk[i] || ' ' || tk[i + 1])) AS feats
  FROM d
), s AS (
  SELECT {id_col}, CAST(len(feats) AS BIGINT) AS n_feats,
    CAST(coalesce(list_sum(list_transform(feats, f -> {w})), 0)
         AS BIGINT) AS wsum
  FROM f
)
SELECT {id_col}, n_feats,
  CAST(CASE WHEN n_feats > 0 THEN {score} - 1000 ELSE 0 END
       AS BIGINT) AS score_q1e3,
  (n_feats > 0 AND {score} - 1000 >= 0) AS keep
FROM s
"""


# ------------------------------------------------- temperature-scaled mix

def _isqrt(x: Column) -> Column:
    """Exact integer sqrt ``floor(√x)`` for non-negative BIGINT ``x``.

    floor(sqrt(double)) then a ±1 correction in exact 64-bit integer
    arithmetic: IEEE sqrt is correctly rounded and the double conversion
    of x ≤ ~9e18 perturbs √x by ≪ 1, so the uncorrected guess is off by
    at most 1 — the two integer compares repair it exactly, identically
    on every engine. Domain: x ≤ ~9.2e18 ((g+1)² must not wrap int64).
    """
    g = F.floor(F.sqrt(x.cast("double"))).cast("bigint")
    return (
        F.when((g + 1) * (g + 1) <= x, g + 1)
        .when(g * g > x, g - 1)
        .otherwise(g)
    )


def _isqrt_sql(x: str) -> str:
    """DuckDB twin of :func:`_isqrt` (same guess-and-correct algebra)."""
    g = f"CAST(floor(sqrt(CAST(({x}) AS DOUBLE))) AS BIGINT)"
    return (f"(CASE WHEN ({g} + 1) * ({g} + 1) <= ({x}) THEN {g} + 1 "
            f"WHEN {g} * {g} > ({x}) THEN {g} - 1 ELSE {g} END)")


def temperature_mix(df: DataFrame, source_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Temperature-scaled source mixing weights at T = 2 (α = 1/2): per
    source, sampling share ∝ p_i^(1/2) — the standard low-resource
    up-weighting rule of multilingual/multi-domain pretraining corpora
    (XLM-R §3.1, mT5 §3.2 use exactly this exponential smoothing; T = 2
    is the most common published setting).

    Output per source: (source, n_docs, nat_share_q1e4, temp_share_q1e4,
    boost_q1e4) — natural share p_i, temperature share
    √n_i / Σ√n_j (the N⁻¹ᐟ² normalization cancels), and the resampling
    boost temp/nat, all half-up integers on the 1e-4 grid. √n_i is
    computed as the EXACT integer sqrt of n_i·10⁴ (q1e2 grid,
    :func:`_isqrt` — guess-and-correct, no engine libm disagreement
    possible), so every output cell is a BIGINT with a single
    deterministic value.

    Scale posture: one tiny shuffle on the low-cardinality source key,
    then the corpus-wide totals come from an empty-frame window over the
    per-source aggregate (#sources rows — one SinglePartition exchange of
    KILOBYTES), so the corpus is scanned exactly ONCE. A naive
    ``agg.crossJoin(broadcast(agg.agg(sum(...))))`` re-expands the totals
    subtree into a SECOND full corpus scan (Catalyst does not share the
    un-materialized aggregate) — the window form is the same
    one-exchange pattern ta_tfidf/ta_dup_ngram_coverage use. The weights
    feed :func:`domain_mix`-style hash-Bernoulli sampling downstream.
    Domain: exact while n_i ≤ ~4·10¹¹ docs per source (idiv_round's 2⁵³
    window on n_i·10⁴); beyond that, pre-scale counts to thousands.
    """
    agg = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    agg = agg.withColumn("_s", _isqrt(F.col("n_docs") * F.lit(10_000)))
    w = Window.partitionBy()
    j = agg.withColumn("_n", F.sum("n_docs").over(w)) \
        .withColumn("_ss", F.sum("_s").over(w))
    nat = idiv_round(F.col("n_docs") * F.lit(10_000), F.col("_n"))
    temp = idiv_round(F.col("_s") * F.lit(10_000), F.col("_ss"))
    return j.select(
        source_col, "n_docs",
        nat.alias("nat_share_q1e4"),
        temp.alias("temp_share_q1e4"),
        idiv_round(temp * F.lit(10_000),
                   F.greatest(nat, F.lit(1).cast("bigint")))
        .alias("boost_q1e4"),
    )


def temperature_mix_sql(table: str = "documents",
                        source_col: str = "source") -> str:
    """DuckDB twin of :func:`temperature_mix` (same isqrt, same grid)."""
    nat = idiv_round_sql("n_docs * 10000", "n_total")
    temp = idiv_round_sql("s * 10000", "s_total")
    return f"""
WITH agg AS (
  SELECT {source_col}, CAST(count(*) AS BIGINT) AS n_docs FROM {table}
  GROUP BY {source_col}
), sq AS (
  SELECT {source_col}, n_docs,
    {_isqrt_sql('n_docs * 10000')} AS s
  FROM agg
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
    CAST(sum(s) AS BIGINT) AS s_total FROM sq
)
SELECT {source_col}, n_docs,
  {nat} AS nat_share_q1e4,
  {temp} AS temp_share_q1e4,
  {idiv_round_sql(f'({temp}) * 10000', f'greatest({nat}, 1)')} AS boost_q1e4
FROM sq, tot
"""


# ------------------------------------------------- data-constrained epochs

#: repeat cap on the 1e-2 epoch grid: 4 epochs. Repeating pretraining data
#: up to ~4 passes costs little vs fresh tokens; beyond that returns decay
#: rapidly (Muennighoff et al. 2023, "Scaling Data-Constrained Language
#: Models", §4 — the public result this cap encodes).
EPOCH_CAP_Q100 = 400


def epoch_plan(df: DataFrame, source_col: str = "source",
               text_col: str = "text") -> DataFrame:
    """Data-constrained epoch planning: given a training token budget
    (here: half the corpus total — a fixed, oracle-restatable policy) and
    temperature-T=2 source weights, compute per source how many EPOCHS of
    its data the plan consumes, capped at 4 repeats.

    Per source: n_tokens, its temperature-weighted allocation
    ``alloc_tokens = floor(B·√tok_i / Σ√tok)`` (floor, never round —
    allocations must not overshoot the budget), realized
    ``epochs_q100 = min(400, floor(100·alloc/tok))``, the repeat-capped
    ``planned_tokens = min(alloc, 4·tok)``, and ``data_constrained`` —
    true when the weight asks for more than 4 passes of the source (the
    signal to go get more of that data). Everything is integer
    arithmetic on exact token sums (√ via :func:`_isqrt`), so every cell
    is single-valued and the op carries a full hash oracle.

    Scale posture: identical to :func:`temperature_mix` — one corpus
    scan into a per-source token sum (partial agg), totals via an
    empty-frame window over the #sources-row aggregate; nothing else
    moves at any corpus size."""
    from multiagent_document_etl_system_spark.operators.textstats import (
        token_count,
    )

    agg = (df.groupBy(source_col)
           .agg(F.sum(token_count(F.col(text_col))).cast("bigint")
                .alias("n_tokens")))
    agg = agg.withColumn("_s", _isqrt(F.col("n_tokens") * F.lit(10_000)))
    w = Window.partitionBy()
    j = (agg.withColumn("_tot", F.sum("n_tokens").over(w))
         .withColumn("_ss", F.sum("_s").over(w)))
    budget = F.expr("_tot div 2")
    alloc_num = F.col("_s").cast("decimal(38,0)") \
        * budget.cast("decimal(38,0)")
    alloc = ((alloc_num - alloc_num % F.col("_ss").cast("decimal(38,0)"))
             / F.col("_ss").cast("decimal(38,0)")).cast("bigint")
    j = j.withColumn("alloc_tokens", alloc)
    epochs = F.least(
        F.lit(EPOCH_CAP_Q100).cast("bigint"),
        F.expr("(100 * alloc_tokens) div greatest(n_tokens, 1)"))
    return j.select(
        source_col, "n_tokens", "alloc_tokens",
        epochs.alias("epochs_q100"),
        F.least(F.col("alloc_tokens"), F.col("n_tokens") * 4)
        .alias("planned_tokens"),
        (F.col("alloc_tokens") > F.col("n_tokens") * 4)
        .alias("data_constrained"),
    )


def epoch_plan_sql(table: str = "documents", source_col: str = "source",
                   text_col: str = "text") -> str:
    """DuckDB twin of :func:`epoch_plan` — same isqrt, same floor
    divisions (`//` on non-negative BIGINT/HUGEINT == Spark's `div`)."""
    from multiagent_document_etl_system_spark.operators.textstats import (
        token_count_sql,
    )

    return f"""
WITH agg AS (
  SELECT {source_col},
    CAST(sum({token_count_sql(text_col)}) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY {source_col}
), sq AS (
  SELECT {source_col}, n_tokens,
    {_isqrt_sql('n_tokens * 10000')} AS s
  FROM agg
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS t_total,
    CAST(sum(s) AS BIGINT) AS s_total FROM sq
), plan AS (
  SELECT {source_col}, n_tokens,
    CAST((s * (t_total // 2)) // s_total AS BIGINT) AS alloc_tokens
  FROM sq, tot
)
SELECT {source_col}, n_tokens, alloc_tokens,
  CAST(least({EPOCH_CAP_Q100}, (100 * alloc_tokens) // greatest(n_tokens, 1))
       AS BIGINT) AS epochs_q100,
  CAST(least(alloc_tokens, n_tokens * 4) AS BIGINT) AS planned_tokens,
  alloc_tokens > n_tokens * 4 AS data_constrained
FROM plan
"""
