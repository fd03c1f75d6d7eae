"""Build an N-x replica of a fixture dir for scaling experiments
(SCALE.md "Measured scaling" section).

    python tools/make_replica.py [--n 10] [--src /root/testdata/sf0.1] \
        [--out /root/repo/.tmp/sf0.1x10]

Replication preserves each table's semantic shape:

- keys (orderkey / doc_id / event_id / user_id) offset per replica so
  cardinalities scale and joins stay key-consistent
- documents get a per-replica text suffix -> every doc has N-1 true
  near-duplicates (worst-case input for the dedup family)
- events KEEP their timestamps -> per-day density grows N-x (the hard
  case for the day-partitioned sweep; the day count stays fixed)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = {
    "lineitem": (
        "SELECT l_orderkey + {off} * (SELECT max(l_orderkey) + 1 FROM t) AS l_orderkey, "
        "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM t"
    ),
    "orders": (
        "SELECT o_orderkey + {off} * (SELECT max(o_orderkey) + 1 FROM t) AS o_orderkey, "
        "o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t"
    ),
    "documents": (
        "SELECT doc_id + {off} * (SELECT max(doc_id) + 1 FROM t) AS doc_id, "
        "CASE WHEN {off} = 0 THEN text ELSE text || ' r{off}' END AS text, "
        "lang, source, n_chars FROM t"
    ),
    "events": (
        "SELECT event_id + {off} * (SELECT max(event_id) + 1 FROM t) AS event_id, "
        "ts, user_id + {off} * (SELECT max(user_id) + 1 FROM t) AS user_id, "
        "event_type, value, props FROM t"
    ),
    # embeddings replicate verbatim (offset ids): every vector gains
    # N-1 exact-duplicate twins — worst case for near-dup similarity,
    # neutral for top-k (the query's neighborhood just densifies)
    "embeddings": (
        "SELECT vec_id + {off} * (SELECT max(vec_id) + 1 FROM t) AS vec_id, "
        "embedding, label FROM t"
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tables", nargs="*", default=list(TABLES))
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp",
        f"{os.path.basename(os.path.normpath(args.src))}x{args.n}",
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in args.tables:
        con.sql(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM "
            f"read_parquet('{args.src}/{t}.parquet')"
        )
        parts = " UNION ALL ".join(
            "(" + TABLES[t].replace("{off}", str(i)) + ")" for i in range(args.n)
        )
        dest = os.path.join(out, f"{t}.parquet")
        con.sql(f"COPY ({parts}) TO '{dest}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dest}")
    # tables not replicated (dims etc.) are symlinked so loaders resolve
    for f in os.listdir(args.src):
        if f.endswith(".parquet") and not os.path.exists(os.path.join(out, f)):
            os.symlink(os.path.join(args.src, f), os.path.join(out, f))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
