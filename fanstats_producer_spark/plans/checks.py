"""Physical-plan introspection helpers.

Perf properties (pushdown, pruning, broadcast, codegen) are asserted in
tests the same way correctness is — by reading the executed plan, not by
hoping.  SURVEY.md §4 maps each reference access-path trick to the
Catalyst feature these helpers verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain prints to stdout)."""
    qe = df._jdf.queryExecution()  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan."""
    plan = explain_str(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema(df: DataFrame) -> str:
    """The ReadSchema section(s) — what actually reaches the parquet scan."""
    plan = explain_str(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df, "simple")


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters section(s) — pruning predicates at the scan."""
    plan = explain_str(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PartitionFilters" in line
    )


def scan_metrics(df: DataFrame) -> list[dict[str, int]]:
    """Executed-plan scan-node metrics (numFiles, numPartitions,
    numOutputRows, ...) — the ground truth for pruning assertions.
    Collect/execute the DataFrame first; walks through AQE query stages.
    """

    def walk(node, out):
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name or "BatchScan" in name:
            out.append(node)
            return out
        for meth in ("plan", "executedPlan"):  # QueryStageExec / AQE wrappers
            try:
                walk(getattr(node, meth)(), out)
                return out
            except Exception:  # noqa: BLE001 - py4j missing-method probe
                pass
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), out)
        return out

    scans = walk(df._jdf.queryExecution().executedPlan(), [])  # noqa: SLF001
    result = []
    for s in scans:
        m, it, d = s.metrics(), None, {}
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            d[kv._1()] = kv._2().value()
        result.append(d)
    return result


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more fused).
    Under AQE the final plan only exists after execution — collect/
    materialize the DataFrame first for a meaningful answer."""
    import re

    m = re.search(r"Found (\d+) WholeStageCodegen", explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded) — the metric every at-scale claim reduces to."""
    plan = explain_str(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
