"""Round-boundary helper: fold the latest CORRECTNESS_r{N}.json into the
registry's verified set AND compute the staleness ordering the next
round's 50-seat window should re-verify.

Usage (start of round N+1, after the driver wrote CORRECTNESS_r{N}):

    python tools/rotate_window.py CORRECTNESS_r10.json

Prints:
1. the updated ``_VERIFIED`` frozenset literal (prior ∪ newly green),
2. every query's LATEST driver-contact round (union of all
   CORRECTNESS_r* files, newest row wins) with per-round counts,
3. the suggested ``_WINDOW_RESEAT`` — the stalest rows first — sized
   to the seats left after ``_WINDOW_FIRST`` (new/changed queries).

Remember to clear ``_WINDOW_DEFER`` and rewrite ``_WINDOW_FIRST`` for
the new round's priorities before pasting the reseat list.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW_SEATS = 50


def latest_contact(before_round: int | None = None) -> dict[str, int]:
    """query -> newest round with a driver CORRECTNESS row.

    ``before_round`` caps the scan to rounds STRICTLY BEFORE it — the
    window for round N is seated from the evidence of rounds 1..N-1,
    so the policy tests must ignore any CORRECTNESS file the driver
    writes during round N itself (VERDICT r13 item 1: with an uncapped
    glob the tests flip red the moment the current round's file lands).
    """
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        try:
            rows = json.load(open(path))
        except ValueError:
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_window(
    pins: tuple[str, ...] = (),
    defer: frozenset[str] = frozenset(),
    before_round: int | None = None,
) -> list[str]:
    """THE seating policy, as code (VERDICT r12 item 7).

    The 50-seat driver window is, in order:

    1. ``pins`` — explicit priority seats for queries the round just
       touched (new queries, or queries whose fixtures/operators were
       re-based since their last driver contact). Every query that has
       NEVER been driver-contacted MUST appear here OR in ``defer``
       (the queue for queries registered AFTER this round's window was
       seated — they take next round's priority seats); pins beyond
       that are allowed (e.g. a re-contact of a re-based query).
    2. the stalest driver-contacted queries, ordered by
       ``(latest_contact_round, name)``, filling the remaining seats.

    ``tests/test_window_policy.py`` asserts the registry's actual
    window (the first 50 names of ``load_all()``) equals this
    function's output for the registry's own ``_WINDOW_FIRST`` pins —
    so a future round cannot silently regress to re-rotation or skip
    a never-contacted query.
    """
    from articulation_vector_db_api_spark import registry

    # NO REGISTRY.clear() here: suites register on first import only,
    # so clearing inside an already-imported process (e.g. the full
    # pytest run) would leave the registry empty forever
    order = list(registry.load_all())
    contact = latest_contact(before_round=before_round)

    never = [n for n in order if n not in contact]
    missing = [n for n in never if n not in pins and n not in defer]
    if missing:
        raise ValueError(
            f"never-driver-contacted queries missing from pins: {missing}"
        )
    pinned = list(pins)
    stale = sorted(
        (n for n in order if n in contact and n not in pins),
        key=lambda n: (contact[n], n),
    )
    return pinned + stale[: max(0, WINDOW_SEATS - len(pinned))]


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else None
    good: set[str] = set()
    if path:
        rows = json.load(open(path))
        for name, row in rows.items():
            status = str(row.get("status", row)).lower()
            blob = json.dumps(row).lower()
            if (
                row.get("hash_match") is True
                or "no_oracle" in blob
                or "pass" in status
            ):
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

    registry.REGISTRY.clear()
    order = list(registry.load_all())
    unverified = [n for n in order if n not in verified]
    print(f"newly green: {len(good)}; total verified: {len(verified)}; "
          f"unverified: {len(unverified)} (these MUST get seats)")

    contact = latest_contact()
    by_round: dict[int, int] = {}
    for n in order:
        by_round[contact.get(n, 0)] = by_round.get(contact.get(n, 0), 0) + 1
    print("latest-contact histogram (round -> queries):",
          dict(sorted(by_round.items())))

    # unverified queries already hold _WINDOW_FIRST seats — they must
    # not also occupy reseat slots
    unverified_set = set(unverified)
    stale = sorted(
        (n for n in order if n in contact and n not in unverified_set),
        key=lambda n: (contact[n], n),
    )
    seats = max(0, WINDOW_SEATS - len(unverified))
    print(f"\n# suggested _WINDOW_RESEAT (stalest {seats} after "
          f"{len(unverified)} _WINDOW_FIRST seats):")
    print(textwrap.fill(
        ", ".join(f'"{n}"' for n in stale[:seats]),
        width=72, initial_indent="    ", subsequent_indent="    ",
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
