"""Round-boundary helper: fold the latest CORRECTNESS_r{N}.json into the
registry's verified set so the NEXT round's driver window lands on
still-unverified queries.

Usage (start of round N+1, after the driver wrote CORRECTNESS_r{N}):

    python tools/rotate_window.py CORRECTNESS_r02.json

Prints the updated frozenset literal (verified = prior set ∪ newly
hash-matched or legitimately no-oracle queries) to paste over
``_VERIFIED`` in registry.py, plus the predicted next 50-query window
for sanity. Remember to also clear ``_WINDOW_DEFER`` (its members are
meant to LEAD the next window) and rewrite ``_WINDOW_FIRST`` for the
new round's priorities.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r02.json"
    rows = json.load(open(path))
    good: set[str] = set()
    for name, row in rows.items():
        status = str(row.get("status", row)).lower()
        blob = json.dumps(row).lower()
        if row.get("hash_match") is True or "no_oracle" in blob or "pass" in status:
            good.add(name)

    from articulation_vector_db_api_spark import registry

    verified = set(registry._VERIFIED) | good
    body = ",\n".join(
        textwrap.fill(
            ", ".join(f'"{n}"' for n in chunk),
            width=72,
            initial_indent="        ",
            subsequent_indent="        ",
        )
        for chunk in [sorted(verified)]
    )
    print("# paste into registry.py:\n_VERIFIED = frozenset(\n    {\n"
          + body + ",\n    }\n)\n")

    # predict the next window assuming the updated set
    registry._VERIFIED = frozenset(verified)
    registry.REGISTRY.clear()
    order = list(registry.load_all())
    unverified = [n for n in order if n not in verified]
    print(f"checked file: {path}; newly green: {len(good)}; "
          f"total verified: {len(verified)}; still unverified: {len(unverified)}")
    print("predicted next window(50):", order[:50])
    return 0


if __name__ == "__main__":
    sys.exit(main())
