#!/bin/bash
# Full local gate: unit+integration tests, oracle differential check at the
# driver's SF, dtype audit, and the benchmark line.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python scripts/check_oracle.py /root/testdata/sf0.01
# bench-SF sweep: catches cardinality-regime drift the sf0.01 gate
# misses (r6: HLL lgConfigK default was exact at sf0.01, wrong at sf0.1)
python scripts/check_oracle.py /root/testdata/sf0.1
python scripts/check_oracle.py --types
python bench.py
