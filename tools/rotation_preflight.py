"""Rotation-capacity preflight (VERDICT r8 item 7 / r9 item 4): fails
loudly if the rotation head in plans/__init__.py lists queries that do
not exist, misses driver-sample capacity, or documents a queue that
cannot fit the next head. Run standalone or via the test suite
(tests/test_entry.py::test_rotation_head_invariants).

Usage: python tools/rotation_preflight.py
Exit status: number of problems (0 = sound).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from datapipeline_spike_spark.plans import rotation_preflight  # noqa: E402


def main() -> int:
    problems = rotation_preflight()
    for p in problems:
        print(f"ROTATION PROBLEM: {p}")
    if not problems:
        print("rotation preflight: sound")
    return len(problems)


if __name__ == "__main__":
    raise SystemExit(main())
