"""Per-key wall-clock profile of the full contract registry.

Usage: python tools/profile_keys.py [sf_dir]  (default sf0.01)

Prints total runtime and the slowest keys. Useful before each driver
round: the correctness harness runs every key, so one pathological
entry inflates the whole gate. Note the first key alphabetically
absorbs JVM/codegen warm-up (~3s) — compare against neighbors, not
zero. Known-slow-by-design: q_dedup_clusters (iterative connected
components, eager per-round checkpoints), q_stream_* (real micro-batch
runs with state stores).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trembita_spark import contract  # noqa: E402
from trembita_spark.session import get_session  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    contract.load_all()
    spark = get_session(app_name="key_profile")
    times: dict[str, float] = {}
    for key in sorted(contract.QUERIES):
        t0 = time.perf_counter()
        contract.QUERIES[key](spark, sf_dir).collect()
        times[key] = time.perf_counter() - t0
    print(f"total {sum(times.values()):.1f}s for {len(times)} keys at {sf_dir}")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{k:40s} {v:6.2f}s")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
