"""Iterative BPE vocabulary training (Sennrich et al. 2016) — training
the tokenizer vocab FROM the corpus, the training-data analogue of the
reference's FIXED pretrained model (/root/reference/src/pinecone_utils.py:
46-53 loads a frozen encoder; a corpus pipeline must be able to fit one).

Semantics (the classic algorithm, exactly):

1. words = whitespace tokens of lowercased text (functions/text.tokens —
   the same tokenization every ta_*/td_* kernel uses), length ≥ 2;
2. each word starts as its character sequence; repeat N times:
   count adjacent SYMBOL pairs across the corpus (weighted by word
   frequency), emit the most frequent pair as the next merge rule
   (ties → lexicographically smallest pair string: a total order, so
   every iteration is deterministic), and apply the merge greedily
   left-to-right within every word.

Greedy left-to-right application is the contract: a run "l l l" under
merge (l,l) becomes "ll l" (never "l ll"). Both engines implement it as
the SAME string fold over the space-separated symbol string —
``F.aggregate`` here, ``list_reduce`` in the DuckDB oracle — fuzzed
value-identical against a pure-Python model in tests/test_bpe.py.

Scale shape (the whole point): ONE corpus-scale shuffle total — the
word→frequency aggregation. Every merge iteration runs over the word-TYPE
table (vocabulary-sized: distinct whitespace tokens — millions of rows at
100 TB, not corpus-sized), localCheckpointed per round so the plan stays
linear across iterations (the duplicate_clusters lesson); the per-round
argmax is a 1-row TakeOrderedAndProject collect. N is a small constant,
so the driver-side loop is bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.functions import text as textfns


def merge_apply(sym: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right application of merge rule (a, b) to a
    space-separated symbol string: every non-overlapping occurrence of
    symbol a followed by symbol b becomes the single symbol a||b, scanning
    left to right. Pure built-ins (one ``aggregate`` fold — no UDF).

    DuckDB twin: ``merge_apply_sql`` (list_reduce over the same fold; the
    prepended '' gives both engines the identical empty-accumulator
    start). Symbols never contain spaces, so "acc ends with ' '||a" is an
    exact last-symbol test.
    """
    return F.aggregate(
        F.split(sym, " "),
        F.lit(""),
        lambda acc, s: (
            F.when(acc == "", s)
            .when(
                ((acc == a) | acc.endswith(F.concat(F.lit(" "), a)))
                & (s == b),
                F.concat(acc.substr(F.lit(1), F.length(acc) - F.length(a)),
                         a, b),
            )
            .otherwise(F.concat(acc, F.lit(" "), s))
        ),
    )


def merge_apply_sql(sym: str, a: str, b: str) -> str:
    """DuckDB twin of :func:`merge_apply` (same fold via list_reduce)."""
    return f"""list_reduce(list_prepend('', string_split({sym}, ' ')),
      (acc, s) -> CASE WHEN acc = '' THEN s
        WHEN (acc = {a} OR ends_with(acc, ' ' || {a})) AND s = {b}
          THEN substr(acc, 1, length(acc) - length({a})) || {a} || {b}
        ELSE acc || ' ' || s END)"""


def apply_merges(sym: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a TRAINED merge list, in training order, to a
    space-separated symbol string — encoding UNSEEN text with a frozen
    tokenizer (the deploy path: a stream can't join a vocabulary that
    never saw its words, but the merge rules apply to anything).
    ``merges`` is driver-side (N is a small constant), so each fold
    binds literal (a, b) — N composed aggregate expressions, no UDF."""
    out = sym
    for a, b in merges:
        out = merge_apply(out, F.lit(a), F.lit(b))
    return out


def apply_merges_sql(sym: str, n_merges: int) -> str:
    """DuckDB twin of :func:`apply_merges` against the trainer chain's
    merge CTEs: level i reads (a, b) from the cross-joined 1-row
    relation ``mm{i}`` (see :func:`bpe_stream_encode_sql`)."""
    out = sym
    for i in range(1, n_merges + 1):
        out = merge_apply_sql(out, f"mm{i}.a", f"mm{i}.b")
    return out


def _merge_row_sql(i: int) -> str:
    """A guaranteed-ONE-row (a, b) relation from the ≤1-row merge CTE
    ``m{i}``: aggregating with max() always yields exactly one row, and
    an EMPTY m{i} (corpus exhausted before round i — the Spark trainer
    breaks early, bpe_train:150) degrades to the ('', '') sentinel, which
    :func:`merge_apply_sql` provably no-ops (the merge branch requires
    ``s = b`` and symbols are never empty). Without this, a bare cross
    join against an empty m{i} collapses w{i} and everything downstream
    to zero rows, diverging the two engines on degenerate/tiny corpora
    (ADVICE r7 #1)."""
    return (f"(SELECT coalesce(max(string_split(pair, ' ')[1]), '') AS a, "
            f"coalesce(max(string_split(pair, ' ')[2]), '') AS b "
            f"FROM m{i})")


def word_types(docs: DataFrame, text_col: str = "text",
               min_word_len: int = 2) -> DataFrame:
    """(w, sym, c): the word-TYPE table — each distinct lowercased
    whitespace token, its space-separated character sequence, and its
    corpus frequency. The ONE corpus-scale shuffle of BPE training; the
    original word rides along so encode paths can join segmentations
    back to documents."""
    words = (docs
             .select(F.explode(textfns.tokens(F.lower(F.col(text_col))))
                     .alias("w"))
             .filter(F.length("w") >= min_word_len))
    return (words.groupBy("w").agg(F.count("*").alias("c"))
            .select("w",
                    F.trim(F.regexp_replace("w", "(.)", "$1 "))
                    .alias("sym"),
                    "c"))


def pair_counts(types: DataFrame) -> DataFrame:
    """(pair, n_occurrences): adjacent-symbol pair counts over the type
    table, weighted by word frequency — one hash shuffle of short keys."""
    # size >= 2 guard is load-bearing: Spark's sequence(1, size-1) with
    # size == 1 is the DESCENDING [1, 0] (default step -1), which would
    # fabricate NULL pairs via out-of-range get()
    syms = (types.select(F.split("sym", " ").alias("s"), "c")
            .filter(F.size("s") >= 2))
    pairs = syms.select(
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("s") - 1),
            lambda i: F.concat(F.get("s", i - 1), F.lit(" "),
                               F.get("s", i)))).alias("pair"),
        "c")
    return pairs.groupBy("pair").agg(
        F.sum("c").cast("bigint").alias("n_occurrences"))


def bpe_train(docs: DataFrame, n_merges: int = 10,
              text_col: str = "text",
              return_types: bool = False):
    """The merge table: [(step, pair, merged, n_occurrences), ...] —
    ``n_merges`` rounds of count → argmax → greedy apply. Each round's
    argmax is the deterministic (count DESC, pair ASC) cut.
    ``return_types=True`` additionally returns the word-type table AFTER
    all merges were applied — the trained tokenizer's segmentation of
    the corpus vocabulary — as ``(merges, types_df)``."""
    # LAZY checkpoints (r12 optimization round): each round's type table
    # is referenced twice (the argmax count + the next merge apply), so
    # lineage must truncate — but an EAGER checkpoint paid its own job
    # per round on top of the argmax job. eager=False lets the argmax
    # action materialize the checkpoint as part of ITS job: one driver
    # round-trip per merge round instead of two, identical tables.
    types = word_types(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        best = (pair_counts(types)
                .orderBy(F.desc("n_occurrences"), F.asc("pair"))
                .limit(1).collect())
        if not best:  # corpus exhausted below 2 symbols everywhere
            break
        pair, n = best[0]["pair"], best[0]["n_occurrences"]
        a, b = pair.split(" ")
        merges.append((step, pair, a + b, n))
        if step < n_merges or return_types:
            types = types.select(
                "w",
                merge_apply(F.col("sym"), F.lit(a), F.lit(b)).alias("sym"),
                "c").localCheckpoint(eager=False)
    if return_types:
        return merges, types
    return merges


def bpe_train_sql(n_merges: int = 10, corpus: str = "documents",
                  text_col: str = "text") -> str:
    """DuckDB oracle: the identical N rounds unrolled as a CTE chain.
    w{i} CTEs are MATERIALIZED — each is referenced by both p{i+1} and
    w{i+1}, and inlining would double the subtree per level."""
    parts = [f"""WITH words AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest({textfns.tokens_sql(f'lower({text_col})')}) AS w
    FROM {corpus})
  WHERE length(w) >= 2 GROUP BY w
), w0 AS MATERIALIZED (
  SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, c
  FROM words
)"""]
    for i in range(1, n_merges + 1):
        parts.append(f""", p{i} AS (
  SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM (
    SELECT unnest([s[j] || ' ' || s[j + 1]
                   for j in generate_series(1, len(s) - 1)]) AS pair, c
    FROM (SELECT string_split(sym, ' ') AS s, c FROM w{i - 1}))
  GROUP BY pair
), m{i} AS MATERIALIZED (
  SELECT pair, n FROM p{i} ORDER BY n DESC, pair ASC LIMIT 1
)""")
        if i < n_merges:
            merged = merge_apply_sql(
                "w.sym", "m.a", "m.b")
            parts.append(f""", w{i} AS MATERIALIZED (
  SELECT w.w AS w, {merged} AS sym, w.c AS c
  FROM w{i - 1} w, {_merge_row_sql(i)} m
)""")
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS step, pair, "
        f"replace(pair, ' ', '') AS merged, n AS n_occurrences FROM m{i}"
        for i in range(1, n_merges + 1)
    ]
    parts.append("\n" + "\nUNION ALL ".join(selects) + "\nORDER BY step")
    return "".join(parts)


def bpe_segment_sql(n_merges: int = 10, corpus: str = "documents",
                    text_col: str = "text") -> str:
    """DuckDB oracle for :func:`td_bpe_segment`: the trainer chain
    extended one level (w{n} = w{n-1} with merge n applied), rolled up
    into the tokens-per-word-type distribution."""
    head = _bpe_chain_sql(n_merges, corpus, text_col)
    n = n_merges
    return f"""{head}
SELECT CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_symbols,
  CAST(count(*) AS BIGINT) AS n_word_types,
  CAST(sum(c) AS BIGINT) AS n_word_occurrences,
  CAST(sum(c * len(string_split(sym, ' '))) AS BIGINT) AS n_tokens
FROM w{n} GROUP BY 1 ORDER BY n_symbols"""


def _bpe_chain_sql(n_merges: int, corpus: str, text_col: str) -> str:
    """The trainer's CTE chain EXTENDED one level (w{n} = w{n-1} with
    merge n applied): the fully-segmented vocabulary, for oracles that
    consume the trained tokenizer rather than the merge table."""
    train = bpe_train_sql(n_merges, corpus, text_col)
    head = train[:train.rindex("\nSELECT CAST(1 AS BIGINT) AS step")]
    n = n_merges
    merged = merge_apply_sql("w.sym", "m.a", "m.b")
    return f"""{head}, w{n} AS MATERIALIZED (
  SELECT w.w AS w, {merged} AS sym, w.c AS c
  FROM w{n - 1} w, {_merge_row_sql(n)} m
)"""


def bpe_encode_sql(n_merges: int = 10, corpus: str = "documents",
                   text_col: str = "text") -> str:
    """DuckDB oracle for td_bpe_encode: per-document word stream joined
    to the trained vocabulary's segmentation — doc-level BPE token
    counts and half-up-rounded fertility (tokens per word) on the 1e4
    integer grid."""
    from multiagent_document_etl_system_spark.functions.numeric import (
        idiv_round_sql,
    )

    head = _bpe_chain_sql(n_merges, corpus, text_col)
    n = n_merges
    fert = idiv_round_sql("10000 * sum(v.n_sym)", "count(*)")
    return f"""{head}, vocab AS MATERIALIZED (
  SELECT w, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sym
  FROM w{n}
), docwords AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest({textfns.tokens_sql(f'lower({text_col})')}) AS w
    FROM {corpus})
  WHERE length(w) >= 2
)
SELECT d.doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(v.n_sym) AS BIGINT) AS n_bpe_tokens,
  {fert} AS fertility_q1e4
FROM docwords d JOIN vocab v USING (w)
GROUP BY d.doc_id"""


def bpe_stream_encode_sql(n_merges: int = 10,
                          corpus_where: str = "doc_id % 10 <> 7",
                          incoming_where: str = "doc_id % 10 = 7",
                          text_col: str = "text") -> str:
    """DuckDB oracle for st_bpe_fertility: merges trained on the CORPUS
    subset, applied per-word to the INCOMING subset via the same N-fold
    chain (unseen words segment by rule application, no vocabulary
    join), rolled up per incoming document."""
    from multiagent_document_etl_system_spark.functions.numeric import (
        idiv_round_sql,
    )

    corpus = f"(SELECT * FROM documents WHERE {corpus_where})"
    train = bpe_train_sql(n_merges, corpus, text_col)
    head = train[:train.rindex("\nSELECT CAST(1 AS BIGINT) AS step")]
    mms = "".join(
        f""", mm{i} AS (
  SELECT a, b FROM {_merge_row_sql(i)}
)""" for i in range(1, n_merges + 1))
    sym0 = "trim(regexp_replace(d.w, '(.)', '\\1 ', 'g'))"
    encoded = apply_merges_sql(sym0, n_merges)
    crosses = ", ".join(f"mm{i}" for i in range(1, n_merges + 1))
    fert = idiv_round_sql("10000 * sum(n_sym)", "count(*)")
    return f"""{head}{mms}, incoming AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest({textfns.tokens_sql(f'lower({text_col})')}) AS w
    FROM documents WHERE {incoming_where})
  WHERE length(w) >= 2
), enc AS (
  SELECT d.doc_id,
    CAST(len(string_split({encoded}, ' ')) AS BIGINT) AS n_sym
  FROM incoming d, {crosses}
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
  {fert} AS fertility_q1e4
FROM enc GROUP BY doc_id"""
