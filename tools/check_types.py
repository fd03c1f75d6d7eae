"""Oracle/builder output-TYPE parity gate.

The driver's comparator stringifies every cell before hashing, so a
value-identical result still FAILS when one engine yields bigint
("44744") and the other double ("44744.0") — exactly what happened to
``math_functions`` and ``events_peak_concurrency`` in round 2. The
local value-parity checker (tools/check_parity.py) normalizes floats
with ``%.10g`` and therefore cannot see that class of bug.

This gate closes the hole without executing either query: it binds
each registered oracle through DuckDB ``DESCRIBE`` (plan-only) and
compares the resulting column types against the Spark builder's lazy
``df.schema``, after normalizing both into the equivalence classes
that actually change stringified output:

    int      (TINYINT..HUGEINT / byte..long)      -> "6"
    float    (REAL/FLOAT/DOUBLE)                  -> "6.0"
    decimal  (fixed scale keeps trailing zeros)   -> "6.00"
    str / bool / bytes / date / ts / interval
    array<T> / map<K,V> / struct<...>             (recursive)

Usage:

    python tools/check_types.py [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def norm_spark(dt) -> object:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        # scale-sensitive: DECIMAL(30,8) prints "6.00000000" while
        # DECIMAL(12,2) prints "6.00" — a scale mismatch hash-FAILs
        return ("decimal", dt.scale)
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, (T.DayTimeIntervalType, T.YearMonthIntervalType)):
        return "interval"
    if isinstance(dt, T.NullType):
        return "null"
    if isinstance(dt, T.ArrayType):
        return ("array", norm_spark(dt.elementType))
    if isinstance(dt, T.MapType):
        return ("map", norm_spark(dt.keyType), norm_spark(dt.valueType))
    if isinstance(dt, T.StructType):
        return (
            "struct",
            tuple((f.name, norm_spark(f.dataType)) for f in dt.fields),
        )
    return f"other:{dt.simpleString()}"


_DUCK_SCALARS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int",
    # HUGEINT is NOT "int": the driver's fetch path materializes int128
    # as float64 ("53.0"), so an uncast sum(INTEGER/BIGINT) hash-FAILs
    # against Spark's bigint "53" even when every value matches — the
    # exact r03 failure class (pack_sequences_token_budget,
    # curation_mixture_weights, text_perplexity_score,
    # text_rake_keywords). Oracles must CAST(... AS BIGINT). It IS
    # "float": against a Spark DOUBLE/FLOAT twin the float64
    # materialization stringifies identically, so that pairing is fine.
    "HUGEINT": "float", "UHUGEINT": "float",
    "FLOAT": "float", "REAL": "float", "DOUBLE": "float",
    # JSON stringifies identically to VARCHAR (driver-proven:
    # struct_map_functions hash-matched in r02 with a DuckDB JSON col)
    "VARCHAR": "str", "TEXT": "str", "JSON": "str",
    "BOOLEAN": "bool", "BLOB": "bytes",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
    "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts", "INTERVAL": "interval",
    '"NULL"': "null", "NULL": "null", "SQLNULL": "null",
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    out, depth, cur, quoted = [], 0, [], False
    for ch in s:
        if ch == '"':
            quoted = not quoted
        elif not quoted:
            if ch in "(<[":
                depth += 1
            elif ch in ")>]":
                depth -= 1
            elif ch == sep and depth == 0:
                out.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def norm_duck(t: str) -> object:
    t = t.strip()
    if t.endswith("[]"):
        return ("array", norm_duck(t[:-2]))
    m = re.fullmatch(r"DECIMAL\s*\(\s*\d+\s*,\s*(\d+)\s*\)", t, re.I)
    if m:
        return ("decimal", int(m.group(1)))
    m = re.fullmatch(r"MAP\s*\((.*)\)", t, re.I | re.S)
    if m:
        k, v = _split_top(m.group(1))
        return ("map", norm_duck(k), norm_duck(v))
    m = re.fullmatch(r"STRUCT\s*\((.*)\)", t, re.I | re.S)
    if m:
        fields = []
        for part in _split_top(m.group(1)):
            name, _, ft = part.partition(" ")
            fields.append((name.strip('"'), norm_duck(ft)))
        return ("struct", tuple(fields))
    up = t.upper()
    if up in _DUCK_SCALARS:
        return _DUCK_SCALARS[up]
    return f"other:{t}"


def compare_all(names: list[str] | None = None, sf_dir: str | None = None):
    """Yield (name, mismatches) where mismatches is a list of
    per-column (col, spark_class, duck_class) triples; empty = OK."""
    from articulation_vector_db_api_spark.registry import load_all
    from articulation_vector_db_api_spark.session import get_spark
    from articulation_vector_db_api_spark.sources.readers import table_names

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_TYPECHECK_SF", "/root/testdata/sf0.001"
    )
    registry = load_all()
    todo = {
        n: q
        for n, q in registry.items()
        if q.oracle is not None and (not names or n in names)
    }
    spark = get_spark("type-parity")
    con = duckdb.connect()
    for t in table_names():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    for name, q in sorted(todo.items()):
        try:
            sfields = [
                (f.name, norm_spark(f.dataType))
                for f in q.fn(spark, sf_dir).schema.fields
            ]
        except Exception as e:  # noqa: BLE001
            yield name, [("<spark-build>", f"error:{e}", "")]
            continue
        try:
            desc = con.sql(f"DESCRIBE ({q.oracle})").fetchall()
        except Exception as e:  # noqa: BLE001
            yield name, [("<duck-bind>", "", f"error:{e}")]
            continue
        dfields = [(r[0], norm_duck(r[1])) for r in desc]
        mism = []
        smap, dmap = dict(sfields), dict(dfields)
        for col in sorted(set(smap) | set(dmap)):
            sv, dv = smap.get(col, "<missing>"), dmap.get(col, "<missing>")
            if sv != dv:
                mism.append((col, sv, dv))
        yield name, mism


def main() -> int:
    names = sys.argv[1:] or None
    bad = 0
    n = 0
    for name, mism in compare_all(names):
        n += 1
        if mism:
            bad += 1
            print(f"TYPE-MISMATCH {name}:")
            for col, sv, dv in mism:
                print(f"    {col}: spark={sv} duck={dv}")
        else:
            print(f"OK    {name}")
    print(f"\n{n - bad}/{n} type-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
