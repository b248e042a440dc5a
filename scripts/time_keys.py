"""Per-key timing harness for optimization iteration: run the named
keys (or a --top N slice of a pool record) through the bench's noop
sink in ONE warm session, best-of-N, and print a compact table.

Faster inner loop than a full bench.py run (no 260-key sweep, no
sentinel battery) for before/after checks on a handful of keys; the
committed BENCH_LOCAL pool record stays the round's evidence of
record — this script is a screwdriver, not a gauge.

Usage:
    python scripts/time_keys.py x96_image_cluster_dedup x47_edit_verify
    python scripts/time_keys.py --runs 3 --sf-dir /root/testdata/sf0.1 KEY...
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from fanstats_producer_spark import registry
from fanstats_producer_spark.session import get_spark

registry.load_all()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None, help="also dump {key: best} JSON here")
    args = ap.parse_args()

    keys = args.keys or sorted(registry.QUERIES)
    unknown = [k for k in keys if k not in registry.QUERIES]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    import os

    from fanstats_producer_spark.session import shuffle_partitions_for_bytes

    total_bytes = sum(
        os.path.getsize(os.path.join(args.sf_dir, f))
        for f in os.listdir(args.sf_dir)
        if f.endswith(".parquet")
    )
    # mirror bench.py's session exactly, or the numbers aren't comparable
    import atexit
    import shutil
    import tempfile

    from fanstats_producer_spark.session import scratch_root

    extra_conf: dict[str, str] = {}
    scr = scratch_root()
    if scr:
        local = tempfile.mkdtemp(prefix="timekeys_local_", dir=scr)
        atexit.register(shutil.rmtree, local, ignore_errors=True)
        extra_conf = {
            "spark.local.dir": local,
            "spark.driver.extraJavaOptions": f"-Djava.io.tmpdir={local}",
        }
    spark = get_spark(
        "time-keys",
        shuffle_partitions=shuffle_partitions_for_bytes(total_bytes),
        extra_conf=extra_conf,
    )
    # same steady-state treatment as bench.py: warm codegen + the tables
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fanstats_producer_spark.io import TABLES, load

    for t in TABLES:
        load(spark, args.sf_dir, t).write.format("noop").mode("overwrite").save()
    from fanstats_producer_spark.operators.layout import ensure_layout

    ensure_layout(spark, args.sf_dir)

    out: dict[str, float] = {}
    for key in keys:
        fn = registry.QUERIES[key]
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"time_keys:{key}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[key] = round(min(runs), 3)
        print(
            f"{key:38s} best {min(runs):7.3f}  runs "
            + " ".join(f"{r:6.2f}" for r in runs),
            flush=True,
        )
    print(f"TOTAL(best) {sum(out.values()):.2f}")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
