"""Local replica of the driver's correctness gate.

Runs every registered query in Spark and its DuckDB oracle twin on the
same parquet tables, then compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_parity.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from articulation_vector_db_api_spark.registry import load_all  # noqa: E402
from articulation_vector_db_api_spark.session import get_spark  # noqa: E402
from articulation_vector_db_api_spark.sources.readers import table_names  # noqa: E402


# None → bit-exact repr (the driver hashes full stringified values, so
# two doubles differing by one ulp are a hash MISMATCH; this default
# reproduces that). --tolerant switches to 10-significant-digit
# matching for debugging real-value drift vs stringification drift.
_FLOAT_FMT: str | None = None


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if _FLOAT_FMT is None else format(v, _FLOAT_FMT)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--rows-only", action="store_true", help="include oracle-less queries")
    ap.add_argument(
        "--strict",
        action="store_true",
        help="(now the default) kept for compatibility: bit-exact floats",
    )
    ap.add_argument(
        "--tolerant",
        action="store_true",
        help="10-significant-digit float compare, for separating real "
        "value drift from stringification drift",
    )
    args = ap.parse_args()
    if args.tolerant:
        global _FLOAT_FMT
        _FLOAT_FMT = ".10g"

    registry = load_all()
    names = args.names or sorted(registry)
    spark = get_spark("parity-check")

    con = duckdb.connect()
    for t in table_names():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = []
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ores = con.sql(q.oracle)
            ocols = [d[0] for d in ores.description]
            # The driver's fetch path materializes HUGEINT (int128, the
            # result type of DuckDB integer sums) as float64 — "53.0"
            # vs Spark bigint "53", a guaranteed hash mismatch.
            # duckdb's fetchall() returns Python ints for HUGEINT and
            # would hide that, so coerce those columns to float here.
            hug = {
                i
                for i, t in enumerate(ores.types)
                if "HUGEINT" in str(t).upper()
            }
            orows = [
                tuple(
                    float(v) if i in hug and v is not None else v
                    for i, v in enumerate(r)
                )
                for r in ores.fetchall()
            ]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        ns, no = _norm_rows(scols, srows), _norm_rows(ocols, orows)
        if ns != no:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(ns, no)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark : {ns[bad][:6]}")
            print(f"      oracle: {no[bad][:6]}")
            continue
        print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
