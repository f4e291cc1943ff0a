"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and its oracle_sql()[name] on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from ner_ocr_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def canon(v):
    # type-tagged: a float and an int with equal value must NOT collide —
    # the driver's value hash distinguishes pandas float64 "3.0" from Spark
    # int "3" (round-1 lesson: DuckDB integer sum() -> HUGEINT -> float64)
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}~f"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def row_key(row: dict, cols: list[str]) -> str:
    return "|".join(canon(row[c]) for c in cols)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="check_oracle", master="local[16]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in entry.TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = [r.asDict(recursive=True) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        scols = sorted(sdf.columns)
        dcols = sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL  {name}: schema {scols} vs {dcols}")
            failures += 1
            continue
        if len(srows) != len(ddf):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(ddf)}")
            failures += 1
            continue
        import numpy as np

        drows = ddf.replace({np.nan: None}).to_dict("records")
        skeys = sorted(row_key(r, scols) for r in srows)
        dkeys = sorted(row_key(r, scols) for r in drows)
        if skeys != dkeys:
            bad = [(a, b) for a, b in zip(skeys, dkeys) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            failures += 1
            continue
        print(f"OK    {name}: {len(srows)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
