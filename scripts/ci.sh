#!/bin/bash
# Full local gate: unit+integration tests, oracle differential check at the
# driver's SF, dtype audit, and the benchmark line.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python scripts/check_oracle.py /root/testdata/sf0.01
python scripts/check_oracle.py --types
python bench.py
