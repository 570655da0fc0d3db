"""Print the round-close counts FROM INTROSPECTION (VERDICT r11 item 7:
hand-tallied commit messages drifted off by one twice in r11 — 179≠180
registered, 196≠197 tests). Use this tool's output in the close commit.

Usage: python tools/final_counts.py
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from cs598vectordb_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    queued = registry.queued_oracle_sql()
    head = [n for n in registry._PRIORITY if n in qs]
    collected = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True,
        text=True,
    )
    last = [ln for ln in collected.stdout.splitlines() if "test" in ln][-1]
    print(f"registered queries: {len(qs)}")
    print(f"oracled:            {len(oracles)}")
    print(f"queued oracles:     {len(queued)} ({', '.join(sorted(queued))})")
    print(f"priority head:      {len(head)}")
    print(f"rows-only pinned:   {len(registry._ROWS_ONLY_EVIDENCE)}")
    print(f"pytest collect:     {last}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
