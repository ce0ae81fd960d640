"""Event-table operators: the as-of join family, approximate distinct, event dedup.

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
    _q,
    load_table,
)

@_q("q_asof_join", """
WITH v AS (SELECT user_id, ts, max(value) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
p AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
  round(p.value, 2) AS purchase_value,
  round(v.view_value, 2) AS asof_view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""")
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase attributed to the
    latest prior view per user. Oracle = DuckDB's native ASOF LEFT JOIN;
    the Spark side is the union+window composition — one shuffle on
    user_id. Right side pre-aggregated to unique (user, ts) so the
    at-tie choice is well-defined in both engines."""
    from multiagent_document_etl_system_spark.operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    out = asof_join(purchases, views, key="user_id")
    return out.select(
        "event_id", "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("asof_view_value", 2).alias("asof_view_value"),
    )


@_q("q_asof_forward", """
WITH v AS (SELECT user_id, ts, max(value) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
p AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
  round(p.value, 2) AS purchase_value,
  round(v.view_value, 2) AS next_view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
""")
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each purchase paired with the EARLIEST view at
    or after it per user (next-event lookup — next tick, next session).
    Same union+window composition as backward, scanned descending; oracle
    = DuckDB's native ASOF with the comparison flipped."""
    from multiagent_document_etl_system_spark.operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    out = asof_join(purchases, views, key="user_id", direction="forward")
    return out.select(
        "event_id", "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("asof_view_value", 2).alias("next_view_value"),
    )


@_q("q_asof_nearest", """
WITH v AS (SELECT user_id, ts, max(value) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
p AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'),
b AS (SELECT p.event_id, p.user_id, p.ts, p.value,
        v.ts AS bts, v.view_value AS bval
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts),
f AS (SELECT p.event_id, v.ts AS fts, v.view_value AS fval
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts)
SELECT b.event_id, b.user_id,
  round(b.value, 2) AS purchase_value,
  round(CASE WHEN fts IS NULL THEN bval
             WHEN bts IS NULL THEN fval
             WHEN (fts - b.ts) < (b.ts - bts) THEN fval
             ELSE bval END, 2) AS nearest_view_value
FROM b JOIN f USING (event_id)
""")
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each purchase paired with the time-CLOSEST view
    per user, ties to the earlier one — both directional scans evaluated
    over the same keyed exchange. Oracle composes DuckDB's two native
    ASOF directions with the identical interval tie-break."""
    from multiagent_document_etl_system_spark.operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    out = asof_join(purchases, views, key="user_id", direction="nearest")
    return out.select(
        "event_id", "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("asof_view_value", 2).alias("nearest_view_value"),
    )


@_q("q_asof_tolerance", """
WITH v AS (SELECT user_id, ts, max(value) AS view_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
p AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
  CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS purchase_cents,
  CAST(floor(CASE WHEN v.ts IS NOT NULL
              AND (p.ts - v.ts) <= INTERVAL 600 SECOND
             THEN v.view_value END * 100 + 0.5) AS BIGINT)
    AS recent_view_cents
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""")
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOLERANCE-bounded as-of join (pandas merge_asof(tolerance=...)
    semantics): each purchase attributed to the latest prior view per
    user ONLY if it happened within the last 10 minutes — the attribution
    window / staleness bound every market-data and ads pipeline puts on
    raw as-of matches (an hour-old price is not "the" price). The bound
    is a per-row predicate applied AFTER the window scan
    (operators/asof.py), so the plan — one keyed exchange + linear
    in-partition scan — costs exactly the unbounded join; the oracle is
    DuckDB's native ASOF with the interval test restated on its match."""
    from multiagent_document_etl_system_spark.operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    out = asof_join(purchases, views, key="user_id",
                    tolerance=600 * 1_000_000)  # µs axis: 10 minutes
    # exact cents BIGINT (the float-output pin's rule for new queries):
    # floor(x*100 + 0.5) is the same deterministic per-row op on both
    # engines' identical input doubles
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    return out.select(
        "event_id", "user_id",
        cents("value").alias("purchase_cents"),
        cents("asof_view_value").alias("recent_view_cents"),
    )


@_q("q_approx_distinct", None)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — approximate by construction, engine
    HLLs differ ⇒ rows-only. Exact twin checked in q_distinct_agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


@_q("q_kmv_distinct", """
WITH h AS (
  SELECT DISTINCT l_returnflag AS rf,
    CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
         AS BIGINT) AS h
  FROM lineitem
), ranked AS (
  SELECT rf, h, row_number() OVER (PARTITION BY rf ORDER BY h ASC) AS rn
  FROM h
), sk AS (
  SELECT rf, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
  FROM ranked WHERE rn <= 256 GROUP BY rf
), ex AS (
  SELECT l_returnflag AS rf,
    CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
  FROM lineitem GROUP BY rf
), est AS (
  SELECT s.rf, e.exact_parts, s.n_kept,
    CAST(CASE WHEN s.n_kept < 256 THEN s.n_kept
         ELSE floor(1152921504606846976.0 * 255 / s.kth + 0.5) END
         AS BIGINT) AS kmv_est
  FROM sk s JOIN ex e USING (rf)
)
SELECT rf AS l_returnflag, exact_parts, n_kept AS kmv_kept, kmv_est,
  CAST((abs(kmv_est - exact_parts) * 10000) // exact_parts AS BIGINT)
    AS err_bp
FROM est
""")
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch, HASH-ORACLED — the
    exactly-restatable twin of q_approx_distinct's HLL (which is
    engine-internal ⇒ rows-only): per group, keep the k=256 smallest
    DISTINCT 60-bit md5-derived hashes (operators/dedup.hash64 — the
    repo's cross-engine hash primitive) and estimate
    distinct ≈ (k-1)·2^60 / kth_min (Bar-Yossef et al. 2002); groups
    with fewer than k distinct values fall back to the exact kept
    count (the sketch IS the set there). Emits the exact distinct and
    an integer basis-point error alongside, so the estimator's quality
    is part of the hash-pinned result, not an unchecked claim. The only
    float op is one (lit·255)/kth double division stated identically in
    both engines; everything else is BIGINT.

    Scale: the sketch's whole point at 100 TB — the distinct shuffle
    carries only (group, 8-byte hash) pairs, the per-group top-k is a
    WindowGroupLimit (partial top-k per partition BEFORE the exchange —
    plan-asserted in tests/test_kmv.py), and min-k sketches merge by
    union + re-top-k (min-k of a union = min-k of per-part min-k), so
    partial sketches combine across shards/days without rescanning."""
    li = load_table(spark, sf_dir, "lineitem")
    from multiagent_document_etl_system_spark.operators.dedup import hash64
    k = 256
    # NOTE (r12 optimization round): an ensure_parallelism fan-out of the
    # scan was tried here and REVERTED on measurement (1.18x — one md5
    # per row is too cheap to repay the round-robin exchange; contrast
    # q_sampled_percentile's concat+md5 row key, which kept it at 0.88x)
    h = li.select(
        F.col("l_returnflag").alias("rf"),
        hash64(F.col("l_partkey").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("rf").orderBy(F.asc("h"))
    sk = (h.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= k)
          .groupBy("rf")
          .agg(F.count("*").cast("bigint").alias("n_kept"),
               F.max("h").alias("kth")))
    ex = (li.groupBy(F.col("l_returnflag").alias("rf"))
          .agg(F.countDistinct("l_partkey").cast("bigint")
               .alias("exact_parts")))
    est = sk.join(ex, "rf").withColumn(
        "kmv_est",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(F.floor(F.lit(1152921504606846976.0) * (k - 1)
                           / F.col("kth") + F.lit(0.5)))
        .cast("bigint"))
    return est.select(
        F.col("rf").alias("l_returnflag"), "exact_parts",
        F.col("n_kept").alias("kmv_kept"), "kmv_est",
        F.expr("CAST((abs(kmv_est - exact_parts) * 10000) div exact_parts"
               " AS BIGINT)").alias("err_bp"))


@_q("q_kmv_setops", """
WITH a AS (
  SELECT DISTINCT
    CAST(concat('0x', substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
         AS BIGINT) AS h
  FROM lineitem WHERE l_linestatus = 'F'
), b AS (
  SELECT DISTINCT
    CAST(concat('0x', substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
         AS BIGINT) AS h
  FROM lineitem WHERE l_linestatus = 'O'
), ka AS (SELECT h FROM a ORDER BY h LIMIT 256),
kb AS (SELECT h FROM b ORDER BY h LIMIT 256),
ku AS (
  SELECT h FROM (
    SELECT DISTINCT h FROM (
      SELECT h FROM ka UNION ALL SELECT h FROM kb))
  ORDER BY h LIMIT 256
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_ku, max(h) AS big_m FROM ku
), c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common
  FROM ka JOIN kb USING (h), m WHERE ka.h <= m.big_m
), ex AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_union
  FROM lineitem WHERE l_linestatus IN ('F', 'O')
), exi AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM
    (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_linestatus = 'F') ia
    JOIN (SELECT DISTINCT l_orderkey FROM lineitem
          WHERE l_linestatus = 'O') ib USING (l_orderkey)
), est AS (
  SELECT m.n_ku, c.n_common,
    CAST(CASE WHEN m.n_ku < 256 THEN m.n_ku
         ELSE floor(1152921504606846976.0 * 255 / m.big_m + 0.5) END
         AS BIGINT) AS est_union
  FROM m, c
), est2 AS (
  SELECT est.n_ku AS kept, est.est_union, ex.exact_union,
    CAST(CASE WHEN est.n_ku < 256 THEN est.n_common
         ELSE (est.n_common * est.est_union + 128) // 256 END
         AS BIGINT) AS est_inter,
    exi.exact_inter
  FROM est, ex, exi
)
SELECT kept, est_union, exact_union,
  CAST((abs(est_union - exact_union) * 10000) // exact_union AS BIGINT)
    AS union_err_bp,
  est_inter, exact_inter,
  CAST((abs(est_inter - exact_inter) * 10000) // exact_inter AS BIGINT)
    AS inter_err_bp
FROM est2
""")
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET OPERATIONS, HASH-ORACLED — the mergeability half
    of q_kmv_distinct's story (Beyer et al., SIGMOD 2007): two per-set
    sketches (k=256 smallest distinct hash64 of linestatus-F vs -O orderkeys)
    combine WITHOUT rescanning either set — union = re-top-k of the
    merged sketch with est (k-1)·2^60/M, intersection = (ρ/k)·est_union
    where ρ counts sketch-common hashes ≤ M. Exact union/intersection
    and integer basis-point errors ride alongside, so both estimators'
    quality is part of the hash-pinned result. Only float op: the one
    (lit·255)/M double division (the q_kmv_distinct pattern);
    intersection scaling is pure BIGINT with round-half-up
    ((ρ·est + k/2) div k).

    Scale: per-set top-k plans as TakeOrderedAndProject (a k-row heap
    per partition, no global sort); the merge step touches 2k rows
    total regardless of corpus size — THIS is why a 100 TB pipeline
    keeps per-shard/per-day KMV sketches and answers cross-shard
    distinct/overlap queries from kilobytes."""
    li = load_table(spark, sf_dir, "lineitem")
    from multiagent_document_etl_system_spark.operators.dedup import hash64
    k = 256

    # ONE lineitem scan + ONE shuffle (r12 optimization round; was 5
    # scans + 2 full-table md5 passes + 2 extra distinct shuffles + a
    # join): distinct orderkeys with per-set membership flags, hash64
    # computed once per DISTINCT key — identical sets to hashing every
    # row first ({h(x) | x ∈ rows} == {h(x) | x ∈ distinct keys}).
    # Checkpointed because THREE consumers (two sketches + the exact
    # audit) re-reference it; the relation is the same volume the
    # groupBy exchange already moves. In REBUILD_PER_REP so the eager
    # materialization stays inside the timed rep.
    keys = (li.filter(F.col("l_linestatus").isin("F", "O"))
            .groupBy("l_orderkey")
            .agg(F.max((F.col("l_linestatus") == "F").cast("int"))
                 .alias("in_f"),
                 F.max((F.col("l_linestatus") == "O").cast("int"))
                 .alias("in_o"))
            .select(hash64(F.col("l_orderkey").cast("string")).alias("h"),
                    "in_f", "in_o")
            .localCheckpoint(eager=True))
    # Dedup on the HASH value (ADVICE r12): keys are distinct ORDERKEYS,
    # so a 64-bit hash collision between two keys would otherwise leave
    # duplicate h rows in a sketch, shifting the bottom-k cut and
    # double-counting the ka∩kb intersection. The oracle's per-set CTEs
    # are SELECT DISTINCT <hash>. Collapsing to h-grain ONCE (one
    # exchange over the checkpointed key relation, membership flags
    # OR-merged — identical per-set hash sets to a per-side DISTINCT)
    # instead of a .distinct() inside each sketch side keeps the fix at
    # one exchange total; a per-side distinct measured +24% on the whole
    # query (r13 A/B). The exact audit below stays on the
    # orderkey-grain ``keys`` — hash collisions must NOT merge its rows.
    # eager: hkeys is referenced four times (two sketch sides, each read
    # by the union and the intersection join); in-session interleaved
    # reps measured ckpt 1.29 / lazy 1.30 / per-side distinct 1.43 s —
    # the h-grain collapse is the cheapest form of the semantic fix
    hkeys = (keys.groupBy("h")
             .agg(F.max("in_f").alias("in_f"), F.max("in_o").alias("in_o"))
             .localCheckpoint(eager=True))

    def sk(flag):
        return (hkeys.filter(F.col(flag) == 1)
                .select("h").orderBy("h").limit(k))

    ka, kb = sk("in_f"), sk("in_o")
    ku = ka.unionAll(kb).distinct().orderBy("h").limit(k)
    m = ku.agg(F.count("*").cast("bigint").alias("n_ku"),
               F.max("h").alias("big_m"))
    c = (ka.join(kb, "h").crossJoin(F.broadcast(m))
         .filter(F.col("h") <= F.col("big_m"))
         .agg(F.count("*").cast("bigint").alias("n_common")))
    audit = keys.agg(
        F.count("*").cast("bigint").alias("exact_union"),
        F.sum(F.when((F.col("in_f") == 1) & (F.col("in_o") == 1), 1)
              .otherwise(0)).cast("bigint").alias("exact_inter"))
    ex = audit.select("exact_union")
    exi = audit.select("exact_inter")

    est = (m.crossJoin(c).withColumn(
        "est_union",
        F.when(F.col("n_ku") < k, F.col("n_ku"))
        .otherwise(F.floor(F.lit(1152921504606846976.0) * (k - 1)
                           / F.col("big_m") + F.lit(0.5)))
        .cast("bigint")))
    est2 = (est.crossJoin(F.broadcast(ex)).crossJoin(F.broadcast(exi))
            .select(
                F.col("n_ku").alias("kept"), "est_union", "exact_union",
                F.expr(f"CAST(CASE WHEN n_ku < {k} THEN n_common"
                       f" ELSE (n_common * est_union + {k // 2}) div {k}"
                       " END AS BIGINT)").alias("est_inter"),
                "exact_inter"))
    return est2.select(
        "kept", "est_union", "exact_union",
        F.expr("CAST((abs(est_union - exact_union) * 10000)"
               " div exact_union AS BIGINT)").alias("union_err_bp"),
        "est_inter", "exact_inter",
        F.expr("CAST((abs(est_inter - exact_inter) * 10000)"
               " div exact_inter AS BIGINT)").alias("inter_err_bp"))


@_q("q_sampled_percentile", """
WITH v AS (
  SELECT l_returnflag AS rf,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
    CAST(concat('0x', substring(md5(concat(
      CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))),
      1, 15)) AS BIGINT) AS h
  FROM lineitem
), ps AS (SELECT unnest([50, 90, 99]) AS p),
samp AS (
  SELECT rf, cents FROM (
    SELECT rf, cents,
      row_number() OVER (PARTITION BY rf ORDER BY h ASC) AS rn
    FROM v) WHERE rn <= 1000
), sr AS (
  SELECT rf, cents,
    row_number() OVER (PARTITION BY rf ORDER BY cents ASC) AS rn,
    CAST(count(*) OVER (PARTITION BY rf) AS BIGINT) AS n
  FROM samp
), spick AS (
  SELECT sr.rf, ps.p, sr.cents AS sample_cents
  FROM sr, ps WHERE sr.rn = (sr.n * ps.p + 99) // 100
), er AS (
  SELECT rf, cents,
    row_number() OVER (PARTITION BY rf ORDER BY cents ASC) AS rn,
    CAST(count(*) OVER (PARTITION BY rf) AS BIGINT) AS n
  FROM v
), epick AS (
  SELECT er.rf, ps.p, er.cents AS exact_cents
  FROM er, ps WHERE er.rn = (er.n * ps.p + 99) // 100
)
SELECT e.rf AS l_returnflag, CAST(e.p AS INT) AS p,
  e.exact_cents, s.sample_cents,
  CAST((abs(s.sample_cents - e.exact_cents) * 10000) // e.exact_cents
       AS BIGINT) AS err_bp
FROM epick e JOIN spick s ON s.rf = e.rf AND s.p = e.p
""")
def q_sampled_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sampled percentile with HASH-PINNED error — the
    exactly-restatable twin of q_approx_percentile (whose KLL sketch is
    engine-internal ⇒ rows-only): per returnflag, the p50/p90/p99 of
    l_extendedprice (exact cents) estimated from the 1,000 rows with
    the SMALLEST row-key hash64 (the repo's hash-not-rand sampling
    convention — deterministic under retries and partition order), with
    the exact percentile and an integer basis-point error alongside.
    The percentile itself is stated as an explicit ceil-rank selection
    (value at row_number ceil(n·p/100) over cents ASC — pure-integer
    (n·p+99)//100, no engine percentile builtin, so there is NO
    interpolation-semantics risk between engines); a value at a fixed
    rank in a multiset is well-defined, so ties in cents cannot break
    determinism.

    Scale: the sample selection compiles to WindowGroupLimit (1,000
    smallest hashes per partition BEFORE the exchange; k=1000 ON
    PURPOSE — Spark's InferWindowGroupLimit rule fires only for rank
    limits <= spark.sql.optimizer.windowGroupLimitThreshold, default
    1000 inclusive, so k=1024 would silently lose the pushdown and
    sort whole groups — plan-asserted in tests/test_kmv.py), so the sampled
    path sorts ~k·partitions rows instead of the corpus — the reason a
    100 TB pipeline quantiles a deterministic sample and carries the
    measured error, exactly what this query's err_bp column pins. The
    full-corpus exact side rides along as the audit (per-group window;
    at true scale you'd run ONLY the sampled path and spot-audit)."""
    li = load_table(spark, sf_dir, "lineitem")
    from multiagent_document_etl_system_spark.operators.dedup import hash64
    k = 1000
    from multiagent_document_etl_system_spark.io import ensure_parallelism

    # per-row md5 row-key hashing is the heavy narrow map here — fan the
    # single-row-group scan to session parallelism first (r12
    # optimization round). Selection stays deterministic: h is unique per
    # row in this keyspace, so the top-1000-by-hash cut is
    # partitioning-independent.
    v = ensure_parallelism(li.select(
        "l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber")).select(
        F.col("l_returnflag").alias("rf"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint").alias("cents"),
        hash64(F.concat(F.col("l_orderkey").cast("string"), F.lit(":"),
                        F.col("l_linenumber").cast("string"))).alias("h"))
    ps = spark.createDataFrame([(50,), (90,), (99,)], "p int")

    def pick(src, out):
        wv = Window.partitionBy("rf").orderBy(F.asc("cents"))
        ranked = src.select(
            "rf", "cents",
            F.row_number().over(wv).alias("rn"),
            F.count("*").over(Window.partitionBy("rf")).cast("bigint")
            .alias("n"))
        return (ranked.crossJoin(F.broadcast(ps))
                .filter(F.col("rn") ==
                        F.expr("(n * p + 99) div 100"))
                .select("rf", "p", F.col("cents").alias(out)))

    wh = Window.partitionBy("rf").orderBy(F.asc("h"))
    samp = (v.withColumn("rn", F.row_number().over(wh))
            .filter(F.col("rn") <= k).select("rf", "cents"))
    spick = pick(samp, "sample_cents")
    epick = pick(v.select("rf", "cents"), "exact_cents")
    return (epick.join(spick, ["rf", "p"])
            .select(F.col("rf").alias("l_returnflag"),
                    F.col("p").cast("int").alias("p"),
                    "exact_cents", "sample_cents",
                    F.expr("CAST((abs(sample_cents - exact_cents) * 10000)"
                           " div exact_cents AS BIGINT)").alias("err_bp")))


@_q("q_event_dedup", """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
    row_number() OVER (
      PARTITION BY user_id, event_type, date_trunc('minute', CAST(ts AS TIMESTAMP))
      ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
""")
def q_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming dropDuplicatesWithinWatermark: one event
    per (user, type, minute), deterministic keep = lowest event_id. The
    streaming flavor is smoke-tested in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", "ts")
    ).orderBy("event_id")
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


