"""Scale-lever tests (SURVEY.md §4): salting correctness, bucketed
exchange-free joins, AQE behavior — the properties that matter at
100 TB, asserted at test scale from real plans and results.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR

from fanstats_producer_spark.io import load
from fanstats_producer_spark.operators.skew import (
    salted_groupby_count,
    salted_join,
    write_bucketed,
)
from fanstats_producer_spark.plans import checks


@pytest.fixture(scope="module")
def skewed(spark):
    """99% of rows share one key — the hot-key shape."""
    hot = spark.range(2000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    tail = spark.range(20).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(tail)


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.range(30).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = skewed.join(dim, "k").groupBy("k").agg(F.count("*").alias("n"))
    salted = salted_join(skewed, dim, "k").groupBy("k").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_outer(spark, skewed):
    """Salting replicates the right side n_salts ways, so join types that
    emit unmatched right rows would duplicate them — rejected up front."""
    import pytest

    dim = spark.range(30).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    for how in ("right", "full_outer", "full", "right_outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(skewed, dim, "k", how=how)
    # left-family types stay allowed (semi: one row per matching left row)
    semi = salted_join(skewed, dim, "k", how="left_semi")
    assert semi.count() == skewed.join(dim, "k", "left_semi").count()


def test_salted_groupby_matches_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(F.count("*").cast("long").alias("n"))
    salted = salted_groupby_count(skewed, "k")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed by the key → sort-merge join with zero
    shuffles (the plan must contain no Exchange)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load(spark, SF_DIR, "orders")
        lineitem = load(spark, SF_DIR, "lineitem")
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", "o_orderkey", n_buckets=8,
        )
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = checks.explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # and it still computes the right thing
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_coalesces_small_shuffle(spark):
    """AQE must shrink the static 8-partition shuffle for a tiny agg —
    the mechanism that makes one config serve sf0.001 and 100 TB."""
    df = load(spark, SF_DIR, "nation").groupBy("n_regionkey").count()
    df.collect()
    n_parts = df.rdd.getNumPartitions()
    assert n_parts < 8  # coalesced below spark.sql.shuffle.partitions


def test_repartition_by_range_output_layout(spark, tmp_path):
    """Write-distribution control: repartitionByRange produces range-
    clustered output files (what a downstream sorted-merge reader or
    zone-map-pruning format wants)."""
    out = str(tmp_path / "ranged")
    orders = load(spark, SF_DIR, "orders")
    orders.repartitionByRange(4, "o_orderdate").write.parquet(out)
    import glob

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    # each file covers a disjoint date range
    ranges = []
    for f in files:
        mm = spark.read.parquet(f).agg(
            F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
        ).collect()[0]
        ranges.append((mm.lo, mm.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_coalesce_controls_file_count(spark, tmp_path):
    out = str(tmp_path / "one")
    load(spark, SF_DIR, "nation").coalesce(1).write.parquet(out)
    import glob

    assert len(glob.glob(out + "/part-*.parquet")) == 1


def test_compact_partitions(spark, tmp_path):
    """Small-files compaction: many files per partition → 1, same rows,
    other partitions untouched by the dynamic overwrite."""
    from fanstats_producer_spark.operators.maintenance import compact_partitions
    import glob

    lake = str(tmp_path / "lake")
    ev = load(spark, SF_DIR, "events").withColumn("event_date", F.to_date("ts"))
    # simulate many small files: 8 files per partition
    ev.repartition(8).write.partitionBy("event_date").parquet(lake)
    before_rows = spark.read.parquet(lake).count()
    one_dir = sorted(glob.glob(lake + "/event_date=*"))[0]
    assert len(glob.glob(one_dir + "/*.parquet")) > 1

    compact_partitions(spark, lake, "event_date")
    after = glob.glob(one_dir + "/*.parquet")
    assert len(after) == 1
    assert spark.read.parquet(lake).count() == before_rows


def test_cluster_within_partitions_rowgroup_stats(spark, tmp_path):
    """Clustered+sorted files → parquet min/max actually selective:
    a value filter reads fewer rows than a full scan would."""
    from fanstats_producer_spark.operators.maintenance import (
        cluster_within_partitions,
    )

    import glob

    out = str(tmp_path / "clustered")
    ev = load(spark, SF_DIR, "events").withColumn("event_date", F.to_date("ts"))
    cluster_within_partitions(ev, "event_date", ["user_id"]).write.parquet(out)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == 4
    # each file covers a narrow, mostly-disjoint user_id range → parquet
    # min/max stats make a user_id predicate skip whole row groups
    ranges = sorted(
        tuple(
            spark.read.parquet(f)
            .agg(F.min("user_id"), F.max("user_id"))
            .collect()[0]
        )
        for f in files
    )
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # range-clustered, not interleaved


def test_analyze_table_feeds_cbo(spark):
    from fanstats_producer_spark.operators.maintenance import analyze_table

    load(spark, SF_DIR, "customer").write.mode("overwrite").saveAsTable("t_stats")
    analyze_table(spark, "t_stats", ["c_custkey", "c_mktsegment"])
    desc = spark.sql("DESCRIBE EXTENDED t_stats c_custkey").collect()
    info = {r.info_name: r.info_value for r in desc}
    assert info.get("distinct_count") not in (None, "NULL")
    spark.sql("DROP TABLE t_stats")


def test_runtime_bloom_filter_prunes_before_shuffle(spark):
    """With the lever on, a selective shuffle join injects a bloom probe
    on the fact side (bloom_filter_agg build + might_contain probe in the
    physical plan) and the join result is unchanged."""
    import pyspark.sql.functions as F

    from fanstats_producer_spark.operators.skew import runtime_bloom_filters

    sf = "/root/testdata/sf0.01"
    def q():
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{sf}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    try:
        baseline = {(r.o_orderstatus, r.n) for r in q().collect()}
        with runtime_bloom_filters(spark, application_side_threshold="0"):
            df = q()
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "bloom_filter_agg" in plan
            assert "might_contain" in plan
            assert {(r.o_orderstatus, r.n) for r in df.collect()} == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_interval_overlap_join_bins_emit_each_pair_once(spark):
    """Binned interval join: multi-bin spans emit one row per pair,
    half-open endpoints do not touch-overlap, disjoint bins still pair
    when intervals overlap across a bin boundary."""
    from fanstats_producer_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 100), (2, 95, 105), (3, 200, 210)],
        "id long, start long, end long",
    )
    b = spark.createDataFrame(
        [(10, 50, 60), (11, 99, 101), (12, 100, 110), (13, 210, 220)],
        "id long, start long, end long",
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(a, b, bin_size=10).collect()
    )
    # a1=[0,100): overlaps b10, b11; NOT b12 ([100,110) half-open touch)
    # a2=[95,105): overlaps b11, b12 (spans bins 9-10, emitted once each)
    # a3=[200,210): NOT b13 (touch at 210)
    assert got == [(1, 10), (1, 11), (2, 11), (2, 12)]


def test_zorder_layout_localizes_both_columns(spark, tmp_path):
    """Z-ordered files cover hypercubes of the key space: the AVERAGE
    per-file min/max span shrinks on BOTH columns (file boundaries are
    row-count quantiles of the z curve, so a boundary-straddling file can
    still span widely — locality is an aggregate property).  A
    lexicographic sort leaves the second column spanning the full range
    in EVERY file."""
    import pyspark.sql.functions as F

    from fanstats_producer_spark.operators.maintenance import zorder_by

    grid = (
        spark.range(64)
        .selectExpr("id AS a")
        .crossJoin(spark.range(64).selectExpr("id AS b"))
    )
    out = str(tmp_path / "z")
    zorder_by(grid, ["a", "b"], n_files=16, bits=6).write.parquet(out)

    spans = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("a") - F.min("a")).alias("span_a"),
            (F.max("b") - F.min("b")).alias("span_b"),
        )
        .collect()
    )
    assert len(spans) == 16
    avg_a = sum(r.span_a for r in spans) / len(spans)
    avg_b = sum(r.span_b for r in spans) / len(spans)
    assert avg_a < 40, avg_a  # measured ~28.6; global span 63
    assert avg_b < 32, avg_b  # measured ~19.4

    # contrast: lexicographic clustering leaves b unpruned in every file
    lex = str(tmp_path / "lex")
    grid.repartitionByRange(16, "a", "b").sortWithinPartitions("a", "b").write.parquet(lex)
    lex_spans = (
        spark.read.parquet(lex)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg((F.max("b") - F.min("b")).alias("span_b"))
        .collect()
    )
    assert all(r.span_b == 63 for r in lex_spans)


def test_dsum_pos_matches_decimal_dsum(spark):
    """The split-accumulator fast sum must be value-identical to the
    decimal-cast sum on every nonnegative fixture measure it replaced."""
    import pyspark.sql.functions as F

    from fanstats_producer_spark.functions.num import dsum, dsum_pos
    from fanstats_producer_spark.io import load

    from conftest import SF_DIR

    li = load(spark, SF_DIR, "lineitem")
    cases = [
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
        F.col("l_quantity") * F.col("l_extendedprice"),
    ]
    row = li.groupBy("l_returnflag").agg(
        *[dsum(c).alias(f"d{i}") for i, c in enumerate(cases)],
        *[dsum_pos(c).alias(f"p{i}") for i, c in enumerate(cases)],
    ).collect()
    assert row
    for r in row:
        for i in range(len(cases)):
            assert r[f"d{i}"] == r[f"p{i}"], (r["l_returnflag"], i)


def test_dsum_pos_partitioning_invariant(spark):
    """Same result on 1 partition and 32 skew-shuffled partitions —
    the reproducibility contract that matters at 1000 executors."""
    import pyspark.sql.functions as F

    from fanstats_producer_spark.functions.num import dsum_pos

    df = spark.range(100_000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 0.001 + 0.0005).alias("v"),
    )
    one = {r["k"]: r["s"] for r in df.coalesce(1).groupBy("k").agg(dsum_pos("v").alias("s")).collect()}
    many = {r["k"]: r["s"] for r in df.repartition(32, "v").groupBy("k").agg(dsum_pos("v").alias("s")).collect()}
    assert one == many


def test_global_dense_rank_matches_window(spark):
    """Two-phase global rank == the single-task row_number over the same
    ordering, on a frame large enough to span many buckets — and stable
    under different shuffle layouts (the round-3 hazard: offsets keyed on
    runtime partition ids could mis-describe a re-executed lineage)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from fanstats_producer_spark.operators.llm_data import global_dense_rank

    df = spark.range(50_000).select(
        F.col("id"),
        (F.xxhash64("id") % 1000).alias("freq"),
    )
    bucket = (-F.col("freq")).cast("long")
    w = Window.orderBy(F.desc("freq"), F.asc("id"))
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w).cast("int")).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # Force DIFFERENT physical layouts across evaluations: the
        # result must be a pure function of the data either way.
        for parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = {
                r["id"]: r["rank"]
                for r in global_dense_rank(
                    df, [F.desc("freq"), F.asc("id")], bucket, out_col="rank"
                ).collect()
            }
            assert got == want, f"mismatch at shuffle.partitions={parts}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_global_running_sum_matches_window(spark):
    """Two-phase global cumulative sum == the single-task running-sum
    window over the same ordering."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from fanstats_producer_spark.operators.llm_data import global_running_sum

    df = spark.range(30_000).select(
        F.col("id"),
        (F.xxhash64("id") % 97).alias("k"),
        (F.col("id") % 13 + 1).alias("v"),
    )
    w = (
        Window.orderBy(F.asc("k"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = {
                r["id"]: r["cum"]
                for r in global_running_sum(
                    df,
                    [F.asc("k"), F.asc("id")],
                    "v",
                    bucket=F.floor(F.col("k") / 10).cast("long"),
                    out_col="cum",
                ).collect()
            }
            assert got == want, f"mismatch at shuffle.partitions={parts}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_spread_guards_single_split_scans(spark):
    """io.spread: single-partition frames fan out to defaultParallelism;
    already-parallel frames pass through untouched; key'd spread
    preserves downstream clustering (no extra exchange for the agg)."""
    import pyspark.sql.functions as F

    from fanstats_producer_spark.io import spread
    from fanstats_producer_spark.plans import checks

    one = spark.range(1000).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    assert spread(one).rdd.getNumPartitions() == target

    wide = spark.range(1000).repartition(target)
    assert spread(wide) is wide

    # key'd spread: explode + aggregate on the spread key adds exactly
    # one exchange (the spread itself)
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.array(F.lit("a"), F.lit("b")).alias("toks"),
    ).coalesce(1)
    agg = (
        spread(docs, "doc_id")
        .select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .count()
    )
    assert checks.n_shuffle_exchanges(agg) == 1


def test_sort_percentile_matches_percentile_aggregate(spark):
    """sort_percentile == Spark's exact percentile aggregate (same
    interpolation), on a high-cardinality column, stable under different
    shuffle layouts — including the r-integer boundary (p lands exactly
    on a rank) and a group with a single row."""
    import pyspark.sql.functions as F

    from fanstats_producer_spark.operators.aggregates import sort_percentile

    df = spark.range(10_001).select(
        (F.col("id") % 7).alias("g"),
        (F.xxhash64("id").cast("double") / 1e12).alias("v"),
    ).union(
        spark.range(1).select(F.lit(99).alias("g"), F.lit(42.0).alias("v"))
    )
    for p in (0.5, 0.9, 0.25):
        want = {
            r["g"]: r["pct"]
            for r in df.groupBy("g")
            .agg(F.expr(f"percentile(v, {p})").alias("pct"))
            .collect()
        }
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            for parts in ("3", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                got = {
                    r["g"]: r["pctl"]
                    for r in sort_percentile(df, "g", "v", p).collect()
                }
                assert set(got) == set(want)
                for g in want:
                    assert got[g] == pytest.approx(want[g], abs=0.0, rel=0.0) or (
                        got[g] == want[g]
                    ), f"p={p} g={g}: {got[g]} != {want[g]}"
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)


# --- hypothesis: sort_percentile equals the percentile aggregate ---------------
try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1, max_size=60,
        ),
        n_groups=st.integers(min_value=1, max_value=4),
        p=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
    )
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    def test_sort_percentile_property(vals, n_groups, p):
        """Random values and group layouts: bit-identical to the
        percentile aggregate at every sampled percentile point,
        including p=0 and p=1."""
        import pyspark.sql.functions as F

        from fanstats_producer_spark.operators.aggregates import sort_percentile
        from fanstats_producer_spark.session import get_spark

        spark = get_spark("fanstats-tests")
        rows = [(i % n_groups, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g int, v double")
        want = {
            r["g"]: r["pct"]
            for r in df.groupBy("g")
            .agg(F.expr(f"percentile(v, {p})").alias("pct"))
            .collect()
        }
        got = {r["g"]: r["pctl"] for r in sort_percentile(df, "g", "v", p).collect()}
        assert got == want
except ImportError:  # pragma: no cover
    pass


# --- hypothesis: salted join equals the plain join ------------------------------
try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        left_keys=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=40),
        right_keys=st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=8),
        n_salts=st.integers(min_value=2, max_value=8),
        how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    )
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def test_salted_join_property(left_keys, right_keys, n_salts, how):
        """Random skewed key sets, salt counts, and join types: the
        salted join's multiset of result keys equals the plain join's."""
        from collections import Counter

        from fanstats_producer_spark.operators.skew import salted_join
        from fanstats_producer_spark.session import get_spark

        spark = get_spark("fanstats-tests")
        left = spark.createDataFrame(
            [(k, i) for i, k in enumerate(left_keys)], "k int, lv int"
        )
        right = spark.createDataFrame(
            [(k, i * 10) for i, k in enumerate(right_keys)], "k int, rv int"
        )
        want = Counter(
            tuple(r) for r in left.join(right, "k", how).select("k", "lv").collect()
        )
        got = Counter(
            tuple(r)
            for r in salted_join(left, right, "k", n_salts=n_salts, how=how)
            .select("k", "lv")
            .collect()
        )
        assert got == want
except ImportError:  # pragma: no cover
    pass


def test_parquet_aggregate_pushdown_serves_from_footers(spark):
    """Scale lever: whole-table COUNT/MIN/MAX are answered from parquet
    FOOTER statistics when the V2 parquet source runs with
    spark.sql.parquet.aggregatePushdown — the scan's output schema IS
    the aggregate list (no row decode at all; at 100 TB this is the
    difference between touching metadata and scanning every row
    group).  Result equality vs the normal row-scan path is asserted
    alongside the plan shape."""
    path = f"{SF_DIR}/lineitem.parquet"
    normal = spark.read.parquet(path).agg(
        F.count("*").alias("n"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    ).collect()[0]
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        pushed = spark.read.parquet(path).agg(
            F.count("*").alias("n"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )
        got = pushed.collect()[0]
        plan = pushed._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
    assert tuple(got) == tuple(normal)
    scan_lines = [l for l in plan.splitlines() if "BatchScan" in l]
    assert scan_lines and "count(*)" in scan_lines[0] and "min(l_quantity)" in scan_lines[0], (
        f"aggregates not pushed into the scan: {scan_lines[:1]}"
    )


def test_cached_frame_reuses_inmemory_columnar_scan(spark):
    """Scale lever: an explicitly cached hot frame serves later queries
    from the in-memory columnar store (InMemoryTableScan) instead of
    re-reading parquet — the iterative-workload lever (PageRank, CC,
    k-means all re-read their base frame every round without it)."""
    df = load(spark, SF_DIR, "orders").groupBy("o_orderstatus").count().cache()
    try:
        first = {r.o_orderstatus: r["count"] for r in df.collect()}  # populate
        again = df.filter(F.col("count") > 0)
        got = {r.o_orderstatus: r["count"] for r in again.collect()}
        plan = again._jdf.queryExecution().executedPlan().toString()
        # the executed plan reads the cache; the parquet lineage only
        # appears in the cached relation's own (already-materialized)
        # plan text below it
        assert "InMemoryTableScan" in plan.split("== Initial Plan ==")[0]
        assert got == {k: v for k, v in first.items() if v > 0}
    finally:
        df.unpersist()
