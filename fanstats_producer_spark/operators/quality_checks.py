"""Data-quality constraint auditing — the validation stage every landed
zone needs (AWS's own answer is Glue Data Quality over the same catalog
the reference provisions, main.tf:301-314; the reference itself lands
blindly, main.py:151-153).

Rules compile to aggregate expressions and run in ONE pass per table
(a single job computes every violation count — no per-rule scans), plus
set-based rules (uniqueness, referential integrity) that need their own
shuffles.  Output is a tidy (rule, n_violations) frame a pipeline can
gate on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fanstats_producer_spark.functions.num import qint
from fanstats_producer_spark.io import load
from fanstats_producer_spark.registry import query


def violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Row-predicate rules in one aggregation pass: each rule is a
    boolean Column that is True when the row VIOLATES the rule."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', `{name}`" for name in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
    )


def uniqueness_violations(df: DataFrame, cols: list[str], rule_name: str) -> DataFrame:
    dups = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("n_violations"))
    )
    return dups.select(F.lit(rule_name).alias("rule"), "n_violations")


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, rule_name: str
) -> DataFrame:
    orphans = child.join(parent, child[fk] == parent[pk], "left_anti")
    return orphans.agg(F.count("*").cast("long").alias("n_violations")).select(
        F.lit(rule_name).alias("rule"), "n_violations"
    )


_X25_Z = 3.0


@query(
    "x25_zscore_outliers",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             COUNT(value) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(27,6))) AS DOUBLE) AS sxx
      FROM events GROUP BY 1),
    stats AS (
      SELECT event_type, sx / n AS mean,
             sqrt((sxx - sx * sx / n) / (n - 1)) AS std
      FROM s),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - t.mean) / t.std AS zval
      FROM events e JOIN stats t USING (event_type))
    SELECT event_id, event_type, value,
           CAST(floor(zval * 1e4 + 0.5) AS BIGINT) AS z_e4
    FROM z WHERE abs(zval) > {_X25_Z}
    """,
)
def x25_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly flags: events whose value sits more than
    {z}σ from its event_type's mean.

    Mean and stddev come from the closed formula over exact decimal sums
    (the q52 pattern: sum and sum-of-squares quantized to decimal, so
    both statistics are bit-identical on any engine / partitioning);
    the per-row z is then a plain double expression.  One aggregation
    pass + one broadcast join — no window, no second shuffle of events.
    """
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(27,6)"))
        .cast("double")
        .alias("sxx"),
    )
    stats = s.select(
        "event_type",
        (F.col("sx") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    z = ev.join(F.broadcast(stats), "event_type").withColumn(
        "zval", (F.col("value") - F.col("mean")) / F.col("std")
    )
    return z.filter(F.abs("zval") > _X25_Z).select(
        "event_id", "event_type", "value", qint("zval", 4).alias("z_e4")
    )



@query(
    "x16_data_quality",
    oracle="""
    SELECT 'orders_negative_price' AS rule,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations FROM orders
    UNION ALL
    SELECT 'orders_bad_status',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)
                AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orders_null_date',
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST(SUM(CASE WHEN l_quantity < 0 OR l_quantity > 50 THEN 1 ELSE 0 END)
                AS BIGINT) FROM lineitem
    """,
)
def x16_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    row_rules = violations(
        orders,
        {
            "orders_negative_price": F.col("o_totalprice") < 0,
            "orders_bad_status": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "orders_null_date": F.col("o_orderdate").isNull(),
        },
    )
    li_rules = violations(
        lineitem,
        {"lineitem_qty_range": (F.col("l_quantity") < 0) | (F.col("l_quantity") > 50)},
    )
    return (
        row_rules.unionByName(
            uniqueness_violations(orders, ["o_orderkey"], "orders_pk_unique")
        )
        .unionByName(
            referential_violations(
                lineitem, orders, "l_orderkey", "o_orderkey", "lineitem_fk_orders"
            )
        )
        .unionByName(li_rules)
    )


# --- q60: winsorized aggregation (robust mean via exact-quantile clipping) -----
# Outlier-robust statistics for a feed whose `value`/price fields arrive
# unvalidated (the reference lands raw API JSON with no range checks,
# main.py:151-153): clip to the exact [p01, p99] band, then aggregate.
# The p01/p99 bounds are exact tail ORDER STATISTICS, fetched with two
# bounded top-k jobs (see _exact_tail_quantile — measured 4x faster than
# Spark's exact percentile aggregate, identical result) and folded into
# the clipping scan as literals; the fact table is never shuffled
# (clipping scan aggregates partial+final).  Clipped values are
# decimal-quantized before summation (the q52_corr pattern) so the
# winsorized mean is bit-identical across partitionings/engines.
@query(
    "q60_winsorize",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
             quantile_cont(l_extendedprice, 0.99) AS hi
      FROM lineitem)
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
           CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
           CAST(floor(CAST(SUM(CAST(floor(
                        least(greatest(l_extendedprice, lo), hi) * 1e4 + 0.5)
                      AS BIGINT)) AS DOUBLE) / 1e4 / COUNT(*) * 1e6 + 0.5)
                AS BIGINT) AS avg_winsorized_e6
    FROM lineitem CROSS JOIN b
    GROUP BY 1
    """,
)
def q60_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    lo = _exact_tail_quantile(li, "l_extendedprice", 0.01)
    hi = _exact_tail_quantile(li, "l_extendedprice", 0.99)
    j = li.withColumn("lo", F.lit(lo)).withColumn("hi", F.lit(hi))
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
    )
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("lo"), 1).otherwise(0)
        ).cast("long").alias("n_lo"),
        F.sum(
            F.when(F.col("l_extendedprice") > F.col("hi"), 1).otherwise(0)
        ).cast("long").alias("n_hi"),
        qint(
            F.sum(
                F.floor(clipped * F.lit(1e4) + F.lit(0.5)).cast("decimal(18,0)")
            ).cast("double")
            / F.lit(1e4)
            / F.count("*")
        ).alias("avg_winsorized_e6"),
    )


def _exact_tail_quantile(
    df: DataFrame, col: str, q: float, exact_tail_limit: int = 10_000_000
) -> float:
    """Exact interpolated quantile (quantile_cont semantics) for a TAIL
    probability, via top-k order statistics instead of Spark's exact
    `percentile` aggregate.

    `percentile` materializes a value->count map of the whole column per
    partition (measured 2-4 s on 600 k doubles at sf0.1); a p01/p99 bound
    only needs the two order statistics flanking h = (n-1)*q, which sit
    within ~q*n of the edge — a TakeOrderedAndProject job with a bounded
    per-partition heap.  Formula mirrors Spark's Percentile.getPercentile
    (lower + (higher-lower)*frac, all double IEEE), so results are
    bit-identical to percentile()/DuckDB quantile_cont.

    The tail fetch grows with n*q, so it is SIZE-GATED (the dedup.py
    driver-union-find pattern): once the tail exceeds
    ``exact_tail_limit`` rows — the 100 TB regime — the code switches to
    percentile_approx, Spark's mergeable sketch (fixed memory per
    partition, one pass, no ordered fetch).  The default limit keeps
    every fixture SF on the exact path so oracle comparisons stay
    bit-exact; the approx path is unit-tested by forcing the limit down.
    """
    import math

    n = df.count()
    h = (n - 1) * q
    k1, k2 = math.floor(h) + 1, math.ceil(h) + 1
    tail_k = k2 if q <= 0.5 else n - k1 + 1
    if tail_k > exact_tail_limit:
        return df.agg(
            F.percentile_approx(F.col(col), F.lit(q), F.lit(10_000)).alias("v")
        ).collect()[0][0]
    c = F.col(col)
    take = 2 if k2 > k1 else 1
    if q <= 0.5:
        # the k2 smallest values, then read back the largest one/two:
        # vals[0] = v_k2, vals[-1] = v_k1
        edge = df.select(c).orderBy(c.asc()).limit(k2).orderBy(c.desc())
        vals = [r[0] for r in edge.limit(take).collect()]
        v2, v1 = vals[0], vals[-1]
    else:
        # positions k1..n (from the bottom) = the top n-k1+1 values,
        # then read back the smallest one/two: vals[0] = v_k1
        edge = df.select(c).orderBy(c.desc()).limit(n - k1 + 1).orderBy(c.asc())
        vals = [r[0] for r in edge.limit(take).collect()]
        v1, v2 = vals[0], vals[-1]
    return v1 + (v2 - v1) * (h - math.floor(h))


# --- x49: median/MAD robust outliers --------------------------------------------
_X49_K = 1.4826  # MAD -> sigma consistency constant for normal data
_X49_Z = 35000  # 3.5 in e4 units — the filter compares QUANTIZED scores


@query(
    "x49_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_id, e.event_type, e.value,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1),
    z AS (
      SELECT d.event_id, d.event_type, d.value,
             CAST(floor(d.adev / ({_X49_K} * m.mad) * 1e4 + 0.5) AS BIGINT)
               AS robust_z_e4
      FROM dev d JOIN mad m USING (event_type)
      WHERE m.mad > 0)
    SELECT event_id, event_type, value, robust_z_e4
    FROM z WHERE robust_z_e4 > {_X49_Z}
    """,
)
def x49_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outliers: |x - median| / (1.4826 · MAD) > 3.5.

    The median/MAD pair is the skew-tolerant complement of x25's
    mean/stddev z-score — one extreme value inflates stddev enough to
    mask real outliers (masking), while the 50% breakdown point of the
    median resists it.  Two exact-percentile aggregation passes, each a
    tiny per-group frame broadcast back onto events — no window, events
    shuffles zero times.  The outlier gate compares the e4-QUANTIZED
    score, so the cross-engine float boundary sits inside the
    quantization margin instead of on the comparison itself.  Zero-MAD
    groups (>50% of values at the median) are excluded: the score is
    undefined there, and both engines state that identically."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    z = (
        dev.join(F.broadcast(mad.filter(F.col("mad") > 0)), "event_type")
        .withColumn(
            "robust_z_e4",
            qint(F.col("adev") / (F.lit(_X49_K) * F.col("mad")), 4),
        )
    )
    return z.filter(F.col("robust_z_e4") > _X49_Z).select(
        "event_id", "event_type", "value", "robust_z_e4"
    )


# --- x63: PSI distribution-drift monitor ----------------------------------------
# Population Stability Index — the standard production gate for "has
# the incoming data's distribution drifted from the reference sample"
# (PSI < 0.1 stable / 0.1-0.25 moderate / > 0.25 act).  Feature here:
# power-of-2 document-length buckets (x54's binning); reference vs live
# populations are the deterministic doc_id-parity halves (in production:
# yesterday's accepted table vs today's batch).  Laplace-smoothed
# per-bucket probabilities over each source's observed bucket set, the
# ln contribution quantized to an e9 integer per bucket BEFORE the sum
# (the x30 contract), so the per-source PSI is an exact integer sum.
# Scale: one (source, bucket, half) aggregate, then |sources × buckets|
# rows — corpus-size-independent after the first aggregate.
@query(
    "x63_psi_drift",
    oracle="""
    WITH b AS (
      SELECT source, doc_id % 2 AS half,
             CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS bucket
      FROM documents),
    counts AS (
      SELECT source, bucket,
             COUNT(*) FILTER (WHERE half = 0) AS n_ref,
             COUNT(*) FILTER (WHERE half = 1) AS n_live
      FROM b GROUP BY 1, 2),
    tot AS (
      SELECT source, SUM(n_ref) AS t_ref, SUM(n_live) AS t_live,
             COUNT(*) AS n_buckets
      FROM counts GROUP BY 1),
    contrib AS (
      SELECT c.source,
             CAST(floor((
               (CAST(c.n_live + 1 AS DOUBLE) / (t.t_live + t.n_buckets))
               - (CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + t.n_buckets))
             ) * ln(
               (CAST(c.n_live + 1 AS DOUBLE) / (t.t_live + t.n_buckets))
               / (CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + t.n_buckets))
             ) * 1e9 + 0.5) AS BIGINT) AS psi_term_e9
      FROM counts c JOIN tot t USING (source))
    SELECT c.source,
           CAST(SUM(c.psi_term_e9) AS BIGINT) AS psi_e9,
           CAST(MIN(t.t_ref) AS BIGINT) AS n_ref,
           CAST(MIN(t.t_live) AS BIGINT) AS n_live
    FROM contrib c JOIN tot t USING (source)
    GROUP BY 1 ORDER BY 1
    """,
)
def x63_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PSI between the reference and live halves over
    power-of-2 length buckets — every term is derived from exact
    integer counts and quantized before summation, so the monitor
    value-hash-matches across engines."""
    docs = load(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        (F.col("doc_id") % 2).alias("half"),
        F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1)))).alias("bucket"),
    )
    counts = b.groupBy("source", "bucket").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("half") == 1, 1)).alias("n_live"),
    )
    tot = counts.groupBy("source").agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_live").alias("t_live"),
        F.count("*").alias("n_buckets"),
    )
    j = counts.join(F.broadcast(tot), "source")
    p_live = (F.col("n_live") + 1).cast("double") / (
        F.col("t_live") + F.col("n_buckets")
    )
    p_ref = (F.col("n_ref") + 1).cast("double") / (
        F.col("t_ref") + F.col("n_buckets")
    )
    contrib = j.select(
        "source",
        "t_ref",
        "t_live",
        F.floor((p_live - p_ref) * F.log(p_live / p_ref) * 1e9 + 0.5)
        .cast("long")
        .alias("psi_term_e9"),
    )
    return contrib.groupBy("source").agg(
        F.sum("psi_term_e9").cast("long").alias("psi_e9"),
        F.min("t_ref").cast("long").alias("n_ref"),
        F.min("t_live").cast("long").alias("n_live"),
    )


# --- x105: exact two-sample Kolmogorov-Smirnov drift matrix ----------------------
# The distribution-shift test the PSI monitor (x63) approximates with
# fixed buckets, computed EXACTLY: for every unordered pair of event
# types, D = sup_x |F_a(x) - F_b(x)| over the merged value grid.  All
# arithmetic is integer cross-multiplication — D's argmax compares
# |ca·nb - cb·na| (the per-pair denominator na·nb is constant), so the
# statistic is bit-reproducible on any engine; only the final e6 report
# divides.  int64 envelope: ca·nb <= (2e5)² = 4e10 at sf1.
#
# Scale shape: one groupBy to (type, value) counts, a types×grid
# broadcast expansion, one cumulative window PER TYPE (partitioned —
# no global window), one self-join on the value grid, map-side-
# combinable max.  The grid is the DISTINCT value set: exact KS is the
# right tool when that's bounded (monitoring per-key metrics, scores,
# latencies); for truly continuous 100 TB columns, run it over x97's
# bottom-k sample instead (the DKW bound then caps the added error) —
# the composition this operator's helper accepts any frame for.
X105_ORACLE = """
    WITH ev AS (
      SELECT event_type AS t, value AS v FROM events WHERE value IS NOT NULL),
    totals AS (SELECT t, COUNT(*) AS n FROM ev GROUP BY 1),
    cnts AS (SELECT t, v, COUNT(*) AS c FROM ev GROUP BY 1, 2),
    grid AS (
      SELECT tt.t, g.v FROM (SELECT DISTINCT v FROM ev) g
      CROSS JOIN (SELECT DISTINCT t FROM ev) tt),
    cum AS (
      SELECT grid.t, grid.v,
             SUM(COALESCE(cnts.c, 0)) OVER (
               PARTITION BY grid.t ORDER BY grid.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM grid LEFT JOIN cnts ON cnts.t = grid.t AND cnts.v = grid.v),
    pairs AS (
      SELECT a.t AS type_a, b.t AS type_b,
             abs(a.cum * nb.n - b.cum * na.n) AS dnum,
             na.n AS n_a, nb.n AS n_b
      FROM cum a JOIN cum b ON a.v = b.v AND a.t < b.t
      JOIN totals na ON na.t = a.t
      JOIN totals nb ON nb.t = b.t),
    agg AS (
      SELECT type_a, type_b, MAX(dnum) AS d_num,
             MAX(n_a) AS n_a, MAX(n_b) AS n_b
      FROM pairs GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(d_num AS BIGINT) AS d_num,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(floor(CAST(d_num AS DOUBLE) / (n_a * n_b) * 1e6 + 0.5)
                AS BIGINT) AS ks_e6
    FROM agg
    """


@query("x105_ks_two_sample", oracle=X105_ORACLE)
def x105_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x105: exact KS distance between every pair of event-type value
    distributions — integer cross-multiplied suprema (see block
    comment), one row per unordered type pair."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("event_type").alias("t"), F.col("value").alias("v"))
    )
    return ks_matrix_from_counts(
        ev.groupBy("t", "v").agg(F.count("*").alias("c"))
    )


def ks_matrix_from_counts(cnts: DataFrame) -> DataFrame:
    """The KS matrix from a (t, v, c) count table — shared by batch
    x105 and the s33 online monitor (whose persisted state IS this
    table)."""
    totals = cnts.groupBy("t").agg(F.sum("c").alias("n"))
    grid = cnts.select("v").distinct().crossJoin(
        F.broadcast(cnts.select("t").distinct())
    )
    w = (
        Window.partitionBy("t")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.join(cnts, ["t", "v"], "left")
        .select("t", "v", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .withColumn("cum", F.sum("c").over(w))
    )
    a = cum.select(
        F.col("t").alias("type_a"), "v", F.col("cum").alias("ca")
    )
    b = cum.select(
        F.col("t").alias("type_b"), "v", F.col("cum").alias("cb")
    )
    na = totals.select(F.col("t").alias("type_a"), F.col("n").alias("n_a"))
    nb = totals.select(F.col("t").alias("type_b"), F.col("n").alias("n_b"))
    pairs = (
        a.join(b, "v")
        .filter(F.col("type_a") < F.col("type_b"))
        .join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.abs(
                F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
            ).alias("dnum"),
            "n_a",
            "n_b",
        )
    )
    agg = pairs.groupBy("type_a", "type_b").agg(
        F.max("dnum").alias("d_num"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    return agg.select(
        "type_a",
        "type_b",
        F.col("d_num").cast("long").alias("d_num"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.floor(
            F.col("d_num").cast("double")
            / (F.col("n_a") * F.col("n_b"))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long").alias("ks_e6"),
    )


# --- x107: Mann-Whitney U / AUC effect-size matrix -------------------------------
# The rank-based companion to x105's KS: for each event-type pair, the
# Mann-Whitney U statistic and its effect size U/(n_a·n_b) — which IS
# ROC-AUC, the number a curation pipeline reads as "how separable are
# these two value distributions" (Mann & Whitney 1947, public).
# Integer-exact via DOUBLED midranks: ties at a value get midrank
# min_rank + (ties-1)/2, so 2·midrank = 2·min_rank + ties - 1 is
# always an integer; R2_a = Σ 2·midrank over sample a and
# U2_a = R2_a - n_a·(n_a+1) are exact int64 (sf1 envelope:
# R2 <= 2·(4e5)² = 3.2e11).  Only the final AUC report divides.
#
# Scale shape: each type sits in |types|-1 pairs, so the pair
# expansion is a broadcast join against the types×types dim (fan-out
# |types|-1, never corpus²); ranks are per-pair windows (partitioned
# — no global window); everything after is map-side-combinable sums.
X107_ORACLE = """
    WITH ev AS (
      SELECT event_type AS t, value AS v FROM events
      WHERE value IS NOT NULL),
    tp AS (
      SELECT a.t AS ta, b.t AS tb
      FROM (SELECT DISTINCT t FROM ev) a
      JOIN (SELECT DISTINCT t FROM ev) b ON a.t < b.t),
    pooled AS (
      SELECT tp.ta, tp.tb, ev.t, ev.v
      FROM tp JOIN ev ON ev.t = tp.ta OR ev.t = tp.tb),
    ranked AS (
      SELECT ta, tb, t, v,
             2 * rank() OVER (PARTITION BY ta, tb ORDER BY v)
               + COUNT(*) OVER (PARTITION BY ta, tb, v) - 1 AS r2
      FROM pooled),
    agg AS (
      SELECT ta AS type_a, tb AS type_b,
             SUM(CASE WHEN t = ta THEN r2 ELSE 0 END) AS r2_a,
             SUM(CASE WHEN t = ta THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN t = tb THEN 1 ELSE 0 END) AS n_b
      FROM ranked GROUP BY 1, 2)
    SELECT type_a, type_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(floor(CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
                      / (2 * n_a * n_b) * 1e6 + 0.5) AS BIGINT)
             AS auc_e6
    FROM agg
    """


@query("x107_mannwhitney_auc", oracle=X107_ORACLE)
def x107_mannwhitney_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x107: Mann-Whitney U and ROC-AUC for every event-type pair —
    doubled-midrank integer arithmetic (see block comment), one row
    per unordered pair.  Shares :func:`auc_matrix_from_counts` with
    the s34 online monitor (the x105/s33 pattern)."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("event_type").alias("t"), F.col("value").alias("v"))
    )
    return auc_matrix_from_counts(
        ev.groupBy("t", "v").agg(F.count("*").alias("c"))
    )


def auc_matrix_from_counts(cnts: DataFrame) -> DataFrame:
    """The Mann-Whitney/AUC matrix from a (t, v, c) count table —
    shared by batch x107 and the s34 online monitor (whose persisted
    state IS this table, the same counts s33 keeps for KS).

    Doubled midranks straight from counts: per pair and value, with
    ties = c_a + c_b and cum the within-pair running total,
    2·midrank = 2·(cum − ties + 1) + ties − 1 = 2·cum − ties + 1 —
    integer throughout, so R2_a = Σ c_a·r2 and U2_a are exact int64
    and the matrix is bit-identical to the raw-event formulation on
    any input (the r2-from-counts pytest pins the algebra)."""
    types = cnts.select("t").distinct()
    tp = (
        types.select(F.col("t").alias("ta"))
        .join(types.select(F.col("t").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    ga = cnts.join(F.broadcast(tp), F.col("t") == F.col("ta")).select(
        "ta", "tb", "v", F.col("c").alias("ca")
    )
    gb = cnts.join(F.broadcast(tp), F.col("t") == F.col("tb")).select(
        "ta", "tb", "v", F.col("c").alias("cb")
    )
    pooled = (
        ga.join(gb, ["ta", "tb", "v"], "full")
        .select(
            "ta",
            "tb",
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .withColumn("ties", F.col("ca") + F.col("cb"))
    )
    wr = (
        Window.partitionBy("ta", "tb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = pooled.withColumn(
        "r2", 2 * F.sum("ties").over(wr) - F.col("ties") + 1
    )
    agg = ranked.groupBy(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b")
    ).agg(
        F.sum(F.col("ca") * F.col("r2")).alias("r2_a"),
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
    )
    u2 = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)
    return agg.select(
        "type_a",
        "type_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2.cast("long").alias("u2_a"),
        F.floor(
            u2.cast("double")
            / (2 * F.col("n_a") * F.col("n_b"))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long").alias("auc_e6"),
    )


# --- x109: chi-square independence audit (lang × source) -------------------------
# The categorical-association test completing the drift/separability
# battery (x105 KS and x107 AUC read numeric columns; this reads the
# two categorical ones): are language and source independent, or does
# some source skew toward some language — the check that catches a
# crawler bucket silently going monolingual.  Per-cell contribution
# (O−E)²/E with E = r·c/N computed as ONE deterministic double
# expression per cell — the square is self-multiplication
# ((o−e)*(o−e)), a correctly-rounded IEEE op on both engines, NOT
# pow(x,2) (JVM Math.pow is 1-ulp, DuckDB rides C libm pow; a 1-ulp
# split can flip the e6 floor at a boundary) — e6-quantized BEFORE
# summation (the x77 quantize-then-exact-sum convention — no
# cross-engine float sum order anywhere); chi² total and the
# (R−1)(C−1) dof ride every row as window totals over the
# cell-count-sized frame.
X109_ORACLE = """
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    rows_ AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
    cols_ AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT obs.lang, obs.source, obs.o,
             CAST(floor(
               (obs.o - CAST(rows_.r * cols_.c AS DOUBLE) / n.n)
               * (obs.o - CAST(rows_.r * cols_.c AS DOUBLE) / n.n)
               / (CAST(rows_.r * cols_.c AS DOUBLE) / n.n)
               * 1e6 + 0.5) AS BIGINT) AS contrib_e6
      FROM obs JOIN rows_ USING (lang) JOIN cols_ USING (source)
      CROSS JOIN n),
    tot AS (
      SELECT lang, source, o, contrib_e6,
             CAST(SUM(contrib_e6) OVER () AS BIGINT) AS chi2_e6,
             CAST((COUNT(DISTINCT lang) OVER () - 1)
                  * (COUNT(DISTINCT source) OVER () - 1) AS BIGINT) AS dof
      FROM cells)
    SELECT lang, source, CAST(o AS BIGINT) AS o, contrib_e6, chi2_e6, dof
    FROM tot
    """


@query("x109_chi2_independence", oracle=X109_ORACLE)
def x109_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x109: per-cell chi-square contributions + the window-total
    statistic and dof for the lang × source contingency table (see
    block comment for the parity argument).  Shares
    :func:`chi2_from_counts` with the s35 online monitor (the
    x105/s33 and x107/s34 pattern)."""
    obs = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("o"))
    )
    return chi2_from_counts(obs)


def chi2_from_counts(obs: DataFrame) -> DataFrame:
    """The chi-square independence report from a (lang, source, o)
    contingency-count table — shared by batch x109 and the s35 online
    monitor (whose persisted state IS this table).  Counts in, the
    identical deterministic per-cell expression out (see x109's block
    comment), so the monitor is bit-identical to the batch key on any
    input."""
    rows_ = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("source").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    cells = (
        obs.join(F.broadcast(rows_), "lang")
        .join(F.broadcast(cols_), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "o",
            F.floor(
                (F.col("o") - e) * (F.col("o") - e) / e * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long").alias("contrib_e6"),
        )
    )
    w = Window.partitionBy()
    tot = cells.select(
        "lang",
        "source",
        F.col("o").cast("long").alias("o"),
        "contrib_e6",
        F.sum("contrib_e6").over(w).cast("long").alias("chi2_e6"),
        (
            (F.size(F.collect_set("lang").over(w)) - 1)
            * (F.size(F.collect_set("source").over(w)) - 1)
        ).cast("long").alias("dof"),
    )
    return tot


# --- x113: mutual information + Cramér's V (lang × source) -----------------------
# The information-theoretic companions to x109's chi², finishing the
# categorical audit: MI(L;S) = Σ (o/N)·log2(o·N/(r·c)) answers "how
# many bits does knowing the source tell you about the language"
# (Cover & Thomas, public), and Cramér's V = sqrt(χ²/(N·min(R−1,C−1)))
# is the [0,1]-normalized effect size that makes association
# comparable across corpora of different size — the pair a curation
# dashboard actually plots (chi² alone grows with N; V and MI do not).
# Exactness: each MI cell contribution is ONE deterministic double
# expression — two exact-int64 divisions (o·N ≤ 2.5e9 at sf1, r·c
# likewise) around the single libm log2 — e9-quantized BEFORE the
# exact integer window sum; V is derived from the EXACT chi2_e6
# integer (x109's quantize-then-sum) via division and one sqrt, both
# correctly-rounded IEEE ops, so no new libm class rides.  V reports
# 0 on a degenerate 1×C / R×1 table (no association measurable)
# rather than dividing by zero.
@query(
    "x113_mi_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    rows_ AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
    cols_ AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT obs.lang, obs.source, obs.o, n.n,
             CAST(floor(
               (obs.o - CAST(rows_.r * cols_.c AS DOUBLE) / n.n)
               * (obs.o - CAST(rows_.r * cols_.c AS DOUBLE) / n.n)
               / (CAST(rows_.r * cols_.c AS DOUBLE) / n.n)
               * 1e6 + 0.5) AS BIGINT) AS chi2c_e6,
             CAST(floor(
               CAST(obs.o AS DOUBLE) / n.n
               * log2(CAST(obs.o * n.n AS DOUBLE)
                      / CAST(rows_.r * cols_.c AS DOUBLE))
               * 1e9 + 0.5) AS BIGINT) AS mi_contrib_e9
      FROM obs JOIN rows_ USING (lang) JOIN cols_ USING (source)
      CROSS JOIN n),
    tot AS (
      SELECT lang, source, o, n, mi_contrib_e9,
             CAST(SUM(mi_contrib_e9) OVER () AS BIGINT) AS mi_e9,
             CAST(SUM(chi2c_e6) OVER () AS BIGINT) AS chi2_e6,
             CAST(least(COUNT(DISTINCT lang) OVER () - 1,
                        COUNT(DISTINCT source) OVER () - 1)
                  AS BIGINT) AS mink
      FROM cells)
    SELECT lang, source, CAST(o AS BIGINT) AS o, mi_contrib_e9, mi_e9,
           CASE WHEN mink = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(sqrt(
                       CAST(chi2_e6 AS DOUBLE) / 1e6
                       / (CAST(n AS DOUBLE) * mink))
                     * 1e6 + 0.5) AS BIGINT)
           END AS cramers_v_e6
    FROM tot
    """,
)
def x113_mi_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x113: per-cell mutual-information contributions with the MI
    total and Cramér's V as window totals over the lang × source
    contingency table (see block comment for the parity argument)."""
    obs = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("o"))
    )
    rows_ = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("source").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    cells = (
        obs.join(F.broadcast(rows_), "lang")
        .join(F.broadcast(cols_), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "o",
            "n",
            F.floor(
                (F.col("o") - e) * (F.col("o") - e) / e * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long").alias("chi2c_e6"),
            F.floor(
                F.col("o").cast("double") / F.col("n")
                * F.log2(
                    (F.col("o") * F.col("n")).cast("double")
                    / (F.col("r") * F.col("c")).cast("double")
                )
                * F.lit(1e9)
                + F.lit(0.5)
            ).cast("long").alias("mi_contrib_e9"),
        )
    )
    w = Window.partitionBy()
    tot = cells.select(
        "lang",
        "source",
        F.col("o").cast("long").alias("o"),
        "n",
        "mi_contrib_e9",
        F.sum("mi_contrib_e9").over(w).cast("long").alias("mi_e9"),
        F.sum("chi2c_e6").over(w).cast("long").alias("chi2_e6"),
        F.least(
            F.size(F.collect_set("lang").over(w)) - 1,
            F.size(F.collect_set("source").over(w)) - 1,
        ).cast("long").alias("mink"),
    )
    return tot.select(
        "lang",
        "source",
        "o",
        "mi_contrib_e9",
        "mi_e9",
        F.when(F.col("mink") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                F.sqrt(
                    F.col("chi2_e6").cast("double") / F.lit(1e6)
                    / (F.col("n").cast("double") * F.col("mink"))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("cramers_v_e6"),
    )


# --- x114: embedding-centroid drift (label x vec_id-parity halves) ---------------
# The vector member of the drift battery (VERDICT r11 item 2): the
# pipeline's own ANN/semdedup arms consume embeddings.embedding, which
# the numeric (x63/x105/x107) and categorical (x109/x113) audits never
# see.  The standard first-moment monitor for an embedding column is
# the per-slice CENTROID SHIFT between a reference and a live cohort
# (the mean-embedding drift check every vector-store rollout runs):
# here reference = even vec_id, live = odd vec_id, sliced per label —
# the same halves convention as x63's PSI.
#
# Exactness: each float32 component is e6-quantized per row
# (q = floor(x*1e6 + 0.5) — float->double cast, one multiply, floor:
# all exact/correctly-rounded, so both engines produce the same int),
# then everything up to the report is EXACT integer state: per
# (label, half, component) the sum of q and the row count.  The
# per-component mean difference is carried as the cross-multiplied
# integer d = s_ref*n_live - s_live*n_ref (never a float division),
# its square accumulates in DECIMAL(38,0) (exact on both engines),
# and the report's centroid_shift_e6 = floor(sqrt(shift2)/(n_ref*
# n_live) + 0.5) uses only IEEE-correctly-rounded ops (decimal->double
# cast, sqrt, divide) — bit-identical across engines with NO libm
# quantize convention needed (sqrt is correctly rounded by IEEE-754).
#
# int64/decimal envelope: |q| <= 1e6 (unit vectors), so |d| <=
# 2e6*n_ref*n_live and d^2 <= 4e12*(n_ref*n_live)^2 — exact to
# ~2e6 rows PER (label, half) slice (sf10 holds 1e4); past that the
# deployment re-scales the quantization or moves d to DECIMAL (the
# x112 envelope convention).  State is |labels| x 2 x dim cells —
# bounded forever, which is what makes the s36 online twin's staged
# SUM-merge state O(1) in stream length.
X114_ORACLE = """
    WITH ex AS (
      SELECT label, vec_id % 2 AS half, u['k'] AS k, u['q'] AS q
      FROM (SELECT label, vec_id,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {'k': i - 1,
                                'q': CAST(floor(CAST(embedding[i] AS DOUBLE)
                                          * 1e6 + 0.5) AS BIGINT)})) AS u
            FROM embeddings)),
    sums AS (
      SELECT label, half, k, CAST(SUM(q) AS BIGINT) AS s, COUNT(*) AS n
      FROM ex GROUP BY 1, 2, 3),
    d AS (
      SELECT r.label, r.s * l.n - l.s * r.n AS d_num,
             r.n AS n_ref, l.n AS n_live
      FROM sums r JOIN sums l ON r.label = l.label AND r.k = l.k
      WHERE r.half = 0 AND l.half = 1),
    agg AS (
      SELECT label,
             SUM(CAST(d_num AS DECIMAL(19,0))
                 * CAST(d_num AS DECIMAL(19,0))) AS shift2,
             MIN(n_ref) AS n_ref, MIN(n_live) AS n_live
      FROM d GROUP BY 1)
    SELECT label,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_live AS BIGINT) AS n_live,
           CAST(floor(sqrt(CAST(shift2 AS DOUBLE))
                      / (CAST(n_ref AS DOUBLE) * CAST(n_live AS DOUBLE))
                      + 0.5) AS BIGINT) AS centroid_shift_e6
    FROM agg
    """


@query("x114_embedding_drift", oracle=X114_ORACLE)
def x114_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x114: per-label centroid shift between the even- and odd-vec_id
    halves of the embeddings table — the vector-column member of the
    drift battery (see block comment for the exact-integer-state
    parity argument).  Shares :func:`embedding_drift_from_sums` with
    the s36 online monitor (the x105/s33, x107/s34, x109/s35
    pattern)."""
    sums = embedding_component_sums(load(spark, sf_dir, "embeddings"))
    return embedding_drift_from_sums(sums)


def embedding_component_sums(emb: DataFrame) -> DataFrame:
    """(label, half, k) -> exact int64 sum of the e6-quantized k-th
    components + row count, from an embeddings frame.  This IS the
    s36 monitor's per-batch increment AND its persisted state shape —
    integer sums merge by SUM, so any batch slicing of the stream
    reaches the identical state the batch key computes in one pass."""
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("k", "x"),
    ).select(
        "label",
        "half",
        "k",
        F.floor(F.col("x").cast("double") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    return ex.groupBy("label", "half", "k").agg(
        F.sum("q").alias("s"), F.count("*").alias("n")
    )


def embedding_drift_from_sums(sums: DataFrame) -> DataFrame:
    """The centroid-shift report from a (label, half, k, s, n)
    component-sum table — shared by batch x114 and the s36 online
    monitor (whose persisted state IS this table).  Only the final
    row runs float ops, all correctly-rounded IEEE (see x114's block
    comment), so the monitor is bit-identical to the batch key."""
    ref = sums.filter(F.col("half") == 0).select(
        "label",
        "k",
        F.col("s").alias("s_ref"),
        F.col("n").alias("n_ref"),
    )
    live = sums.filter(F.col("half") == 1).select(
        "label",
        "k",
        F.col("s").alias("s_live"),
        F.col("n").alias("n_live"),
    )
    d = ref.join(live, ["label", "k"]).select(
        "label",
        "n_ref",
        "n_live",
        (
            F.col("s_ref") * F.col("n_live")
            - F.col("s_live") * F.col("n_ref")
        ).alias("d_num"),
    )
    dd = F.col("d_num").cast("decimal(19,0)")
    agg = d.groupBy("label").agg(
        F.sum(dd * dd).alias("shift2"),
        F.min("n_ref").cast("long").alias("n_ref"),
        F.min("n_live").cast("long").alias("n_live"),
    )
    return agg.select(
        "label",
        "n_ref",
        "n_live",
        F.floor(
            F.sqrt(F.col("shift2").cast("double"))
            / (F.col("n_ref").cast("double") * F.col("n_live").cast("double"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("centroid_shift_e6"),
    )


# --- x115: drift-gated quarantine (monitor -> breach -> partition) ---------------
# Closes the drift battery's consumer side (VERDICT r12 item 6): the
# batteries observe, this key ACTS.  The x114 centroid-shift monitor
# gates a quarantine decision — every live-half vector of a label whose
# shift breaches the gate is routed to the quarantine partition pending
# review, the standard monitor->gate->hold pattern in front of a
# training-data merge.
#
# Breach rule (a pure function of the monitor's state table, hence
# SQL-stateable): a label breaches when its centroid_shift_e6 is at
# least 1.05x the EXACT cross-label median.  The median of the
# |labels|-row report is carried as the integer order-statistic sum
# m_lo + m_hi (the two middle ranks; the same rank twice when |labels|
# is odd), so the gate compares 40*shift >= 21*(m_lo + m_hi) in pure
# int64 — no float boundary to disagree on, at any SF.  A RELATIVE
# gate is the operationally meaningful one here: the null-model shift
# scales ~1/sqrt(n), so any fixed absolute threshold degenerates to
# all-clean or all-breached as the cohort grows; "worse than your
# peers by 5%" tracks the scale automatically.
#
# Scale shape: the monitor state is |labels| x 2 x dim integer cells
# (one bounded shuffle over the vector stream); the rank/median step
# runs on the |labels|-row report (domain-bounded, FIXTURES.md) via
# one row_number window + two broadcast scalar aggregates — no global
# window over data-sized frames (the x104 rule); the verdict joins
# back to the live vectors BROADCAST, so the vector stream is touched
# map-side only.  At 100 TB: one shuffle of bounded output + one
# broadcast join.
X115_ORACLE = f"""
    WITH drift AS ({X114_ORACLE}),
    ranked AS (
      SELECT label, centroid_shift_e6,
             row_number() OVER (ORDER BY centroid_shift_e6, label) AS rn,
             COUNT(*) OVER () AS n_lab
      FROM drift),
    gated AS (
      SELECT label, centroid_shift_e6,
             SUM(CASE WHEN rn * 2 IN (n_lab, n_lab + 2)
                        THEN centroid_shift_e6
                      WHEN rn * 2 = n_lab + 1
                        THEN centroid_shift_e6 * 2
                      ELSE 0 END) OVER () AS sum_mid
      FROM ranked)
    SELECT e.vec_id, e.label, g.centroid_shift_e6,
           CAST(40 * g.centroid_shift_e6 >= 21 * g.sum_mid AS INT)
             AS quarantined
    FROM embeddings e JOIN gated g ON g.label = e.label
    WHERE e.vec_id % 2 = 1
    """


@query("x115_drift_quarantine", oracle=X115_ORACLE)
def x115_drift_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x115: the x114 monitor gating a quarantine partition (see block
    comment for the integer breach rule and the scale shape).  Spark
    arm: rank window over the |labels|-row report only; n_lab and
    sum_mid ride broadcast scalar aggregates (never a data-sized
    window); the verdict broadcasts back onto the live vectors."""
    emb = load(spark, sf_dir, "embeddings")
    drift = embedding_drift_from_sums(embedding_component_sums(emb))
    ranked = drift.select("label", "centroid_shift_e6").withColumn(
        "rn",
        F.row_number().over(
            # |labels|-row frame: domain-bounded (FIXTURES.md), the
            # adjudicated-safe zero-arg window class
            Window.orderBy("centroid_shift_e6", "label")
        ),
    )
    # Three consumers read this |labels|-row frame (n_lab, sum_mid,
    # the gate itself) — truncate the lineage so the component-sum
    # shuffle over the vector stream runs ONCE, not once per consumer
    # (measured 4.0 s -> sub-second at sf0.1; the x102 convention).
    ranked = ranked.localCheckpoint(eager=True)
    n_lab = ranked.agg(F.count("*").alias("n_lab"))
    mid = (
        ranked.crossJoin(F.broadcast(n_lab))
        .select(
            F.when(
                (F.col("rn") * 2 == F.col("n_lab"))
                | (F.col("rn") * 2 == F.col("n_lab") + 2),
                F.col("centroid_shift_e6"),
            )
            .when(
                F.col("rn") * 2 == F.col("n_lab") + 1,
                F.col("centroid_shift_e6") * 2,
            )
            .otherwise(F.lit(0))
            .alias("m")
        )
        .agg(F.sum("m").alias("sum_mid"))
    )
    gated = ranked.crossJoin(F.broadcast(mid)).select(
        "label",
        "centroid_shift_e6",
        (
            F.col("centroid_shift_e6") * 40
            >= F.col("sum_mid") * 21
        )
        .cast("int")
        .alias("quarantined"),
    )
    return (
        emb.filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "label")
        .join(F.broadcast(gated), "label")
        .select("vec_id", "label", "centroid_shift_e6", "quarantined")
    )
