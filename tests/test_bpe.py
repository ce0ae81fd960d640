"""BPE trainer (operators/bpe.py): the greedy merge fold is
value-identical across Spark, DuckDB, and a pure-Python model; the
trainer's merge table matches the unrolled DuckDB oracle end-to-end and
reproduces a planted corpus's known merges."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from multiagent_document_etl_system_spark.operators import bpe


def _py_merge(sym: str, a: str, b: str) -> str:
    """Pure-Python greedy left-to-right merge — the spec."""
    out: list[str] = []
    toks = sym.split(" ")
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return " ".join(out)


SYMS = st.lists(st.sampled_from(["l", "ll", "a", "ab", "b", "x"]),
                min_size=1, max_size=12)
PAIR = st.tuples(st.sampled_from(["l", "ll", "a", "ab", "b"]),
                 st.sampled_from(["l", "a", "b", "ab"]))


@given(SYMS, PAIR)
@settings(max_examples=200, deadline=None)
def test_fold_matches_python_model_duckdb(syms, pair):
    import duckdb

    a, b = pair
    sym = " ".join(syms)
    expected = _py_merge(sym, a, b)
    got = duckdb.connect().execute(
        "SELECT " + bpe.merge_apply_sql(f"'{sym}'", f"'{a}'", f"'{b}'")
    ).fetchone()[0]
    assert got == expected, (sym, a, b)


def test_fold_matches_python_model_spark(spark):
    """Spark's aggregate fold on a batch of adversarial cases (runs +
    overlaps + merged-symbol collisions), vs the Python spec."""
    from pyspark.sql import functions as F

    cases = [
        ("l l l", "l", "l"),            # odd run → ll l, never l ll
        ("l l l l", "l", "l"),          # even run → ll ll
        ("a b a b a b", "a", "b"),      # alternating, all merge
        ("x a b x", "a", "b"),          # interior pair
        ("ab b a b", "ab", "b"),        # merged symbol as left side
        ("a ab ab", "a", "ab"),         # merged symbol as right side
        ("x", "a", "b"),                # single symbol, no-op
        ("a b", "a", "b"),              # whole word merges
        ("b a", "a", "b"),              # wrong order, no-op
        ("ll l ll", "ll", "l"),         # multi-char symbols
    ]
    df = spark.createDataFrame(cases, "sym string, a string, b string")
    got = df.select(
        bpe.merge_apply(F.col("sym"), F.col("a"), F.col("b"))
        .alias("m")).collect()
    for (sym, a, b), row in zip(cases, got):
        assert row["m"] == _py_merge(sym, a, b), (sym, a, b)


def test_trainer_recovers_planted_merges(spark):
    """A corpus of known words must yield the hand-derivable merge
    sequence. 'aaab' ×9 + 'ab' ×3: round 1 counts (a,a)=18 > (a,b)=12 →
    merge aa (greedy: 'a a a b' → 'aa a b'); round 2 counts (a,b)=12 >
    (aa,a)=9 → merge ab ('aa a b' → 'aa ab', 'a b' → 'ab'); round 3
    leaves only (aa,ab)=9 → merge aaab; round 4 has no pairs left and
    the trainer stops early."""
    docs = spark.createDataFrame(
        [(1, "aaab " * 9 + "ab ab ab")], "doc_id long, text string")
    got = bpe.bpe_train(docs, n_merges=4)
    assert got == [
        (1, "a a", "aa", 18),
        (2, "a b", "ab", 12),
        (3, "aa ab", "aaab", 9),
    ]


def test_trainer_matches_unrolled_oracle(spark, duck):
    """End-to-end at sf0.001: 6 rounds of the Spark trainer == the
    unrolled DuckDB CTE chain, row for row."""
    from multiagent_document_etl_system_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = bpe.bpe_train(docs, n_merges=6)
    want = duck.execute(bpe.bpe_train_sql(6)).fetchall()
    assert [tuple(r) for r in want] == got


def test_trainer_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string")
    got = bpe.bpe_train(docs, n_merges=10)
    # merges exhaust after every word is a single symbol
    assert [m[1] for m in got] == ["a b", "c d"]


def test_oracle_chain_survives_corpus_exhaustion(spark):
    """ADVICE r7 #1: when the corpus exhausts before n_merges rounds, the
    Spark trainer breaks early but the unrolled DuckDB chain used to
    cross-join each w{i} against a possibly-EMPTY m{i}, collapsing w{i}
    and everything downstream to zero rows. The one-row ('', '') sentinel
    (_merge_row_sql) makes the exhausted rounds provable no-ops: both
    engines now agree on degenerate corpora — train, segment, encode,
    and the stream-encode chain all stay populated and value-identical."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS "
                "SELECT 1 AS doc_id, 'ab ab cd' AS text "
                "UNION ALL SELECT 2, 'ab cd cd'")
    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab cd cd")], "doc_id long, text string")

    # 5 rounds requested, corpus exhausts after 2 (every word 1 symbol)
    merges, types = bpe.bpe_train(docs, n_merges=5, return_types=True)
    want_train = con.execute(bpe.bpe_train_sql(5)).fetchall()
    assert [tuple(r) for r in want_train] == merges
    assert len(merges) == 2

    # segment: the oracle's w5 must hold the REAL segmented types, not
    # collapse to zero rows
    want_seg = con.execute(bpe.bpe_segment_sql(5)).fetchall()
    assert want_seg == [(1, 2, 6, 6)]
    seg = {r["sym"]: r["c"] for r in types.collect()}
    assert seg == {"ab": 3, "cd": 3}

    # encode + stream-encode chains survive too (fertility = 1.0 grid)
    want_enc = sorted(con.execute(bpe.bpe_encode_sql(5)).fetchall())
    assert want_enc == [(1, 3, 3, 10000), (2, 3, 3, 10000)]
    want_stream = con.execute(bpe.bpe_stream_encode_sql(
        5, corpus_where="doc_id = 1",
        incoming_where="doc_id = 2")).fetchall()
    assert want_stream == [(2, 3, 3, 10000)]

    # Spark apply_merges with the SHORT trained list == oracle's padded
    # no-op chain on unseen text
    from pyspark.sql import functions as F

    pairs = [(m[1].split(" ")[0], m[1].split(" ")[1]) for m in merges]
    sym = F.trim(F.regexp_replace(F.lit("abcd"), "(.)", "$1 "))
    got = spark.range(1).select(
        bpe.apply_merges(sym, pairs).alias("s")).first()["s"]
    assert got == "ab cd"


def test_segment_stats_consistent_with_trainer(spark):
    """return_types applies every merge: the segmented type table's
    token mass equals characters-per-word minus one per merge USE, and
    the planted corpus segments exactly as hand-derived."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "aaab " * 9 + "ab ab ab")], "doc_id long, text string")
    merges, types = bpe.bpe_train(docs, n_merges=4, return_types=True)
    segs = {r["sym"]: r["c"] for r in types.collect()}
    # merges: aa, ab, aaab -> 'aaab' collapses to ONE symbol, 'ab' too
    assert segs == {"aaab": 9, "ab": 3}
    # avg tokens per word(=1.0 here): the fertility report's numerator
    stats = (types.select(F.size(F.split("sym", " ")).alias("n"), "c")
             .agg(F.sum(F.col("n") * F.col("c")).alias("tok"),
                  F.sum("c").alias("occ")).first())
    assert stats["tok"] == stats["occ"] == 12
