"""Driver-contract invariants that live outside any single operator:
the README's advertised query count must track the registry (ADVICE r9
— the count drifted 227 vs 228 when q82 landed after the README edit).
"""

from __future__ import annotations

import pathlib
import re

from fanstats_producer_spark import registry

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_readme_count_matches():
    """README's "**N of N**" oracle-coverage claim equals the number of
    registered keys, so the doc can never silently drift again."""
    text = (REPO / "README.md").read_text()
    m = re.search(r"\*\*(\d+) of (\d+)\*\*", text)
    assert m, "README.md lost its '**N of N**' oracle-coverage claim"
    n = len(registry.QUERIES)
    assert (int(m.group(1)), int(m.group(2))) == (n, n), (
        f"README claims {m.group(0)} but registry has {n} keys — "
        "update the README count"
    )
