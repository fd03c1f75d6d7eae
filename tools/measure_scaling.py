"""Measure wall-clock scaling of registered queries on an N× replica
(SCALE.md "Measured scaling" section — the evidence behind every
100 TB claim).

    python tools/measure_scaling.py q1_pricing_summary flagship_search
    python tools/measure_scaling.py --all-tagged textops
    python tools/measure_scaling.py --n 10 --base /root/testdata/sf0.1 <names>

Builds the replica via tools/make_replica.py if missing, runs each
query twice per scale (min wins — discounts JIT/cache warm-up), prints
a markdown row per query ready to paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from articulation_vector_db_api_spark.registry import load_all  # noqa: E402
from articulation_vector_db_api_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--n", type=int, default=10, help="replica factor")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--all-tagged", help="measure every registered query with this tag"
    )
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    registry = load_all()
    names = args.names
    if args.all_tagged:
        names = sorted(
            n for n, q in registry.items() if args.all_tagged in q.tags
        )
    if not names:
        ap.error("no queries selected")

    replica = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp",
        f"{os.path.basename(os.path.normpath(args.base))}x{args.n}",
    )
    if not os.path.isdir(replica):
        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "make_replica.py"),
                "--n",
                str(args.n),
                "--src",
                args.base,
                "--out",
                replica,
            ],
            check=True,
        )

    spark = get_spark()
    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"| {name} | ? | ? | — | UNKNOWN QUERY |")
            continue
        times = []
        for sf in (args.base, replica):
            best = min(
                _timed(q.fn, spark, sf) for _ in range(args.runs)
            )
            times.append(best)
        ratio = times[1] / times[0] if times[0] else float("inf")
        print(
            f"| {name} (r?) | {times[0]:.1f} s | {times[1]:.1f} s "
            f"| {ratio:.1f}× |  |"
        )
    return 0


def _timed(fn, spark, sf) -> float:
    t0 = time.time()
    fn(spark, sf).collect()
    return time.time() - t0


if __name__ == "__main__":
    sys.exit(main())
