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


def local_oracles(con) -> dict[str, str]:
    """LOCAL value oracles for queries whose kernel DuckDB lacks natively
    (round-3 verdict #6). The repo's own `kernels/fuzzy.score` registers as
    a DuckDB scalar function, so `semantic_search` — rows-only under the
    driver (its oracle_sql must run on stock DuckDB) — is value-checked
    HERE against a full SQL twin of the query + semi-join. The prefilter
    (operators/search.fuzzy_prefilter_expr, mode='fast') is deliberately
    NOT mirrored: the oracle scores every row, so a heuristic prefilter
    drop of a true match would surface as a value mismatch."""
    from duckdb.typing import DOUBLE, VARCHAR

    from ner_ocr_spark.kernels.fuzzy import score

    con.create_function(
        "fuzzy_score", lambda t, q: float(score(t, q)),
        [VARCHAR, VARCHAR], DOUBLE, null_handling="special",
    )
    return {
        "semantic_search": """
            WITH regions AS (
                SELECT CAST(doc_id % 7 AS VARCHAR) AS doc_id,
                       0 AS page,
                       CAST(doc_id AS INT) AS region_idx,
                       substr(text, 1, 40) AS text,
                       CAST(doc_id % 100 AS DOUBLE) AS x1,
                       CAST((doc_id * 3) % 100 AS DOUBLE) AS y1,
                       CAST(doc_id % 100 + 20 AS DOUBLE) AS x2,
                       CAST((doc_id * 3) % 100 + 10 AS DOUBLE) AS y2
                FROM documents
            ), matches AS (
                SELECT doc_id, page,
                       x1 AS mx1, y1 AS my1, x2 AS mx2, y2 AS my2
                FROM regions
                WHERE fuzzy_score(text, 'window merge spark') >= 0.8
            )
            SELECT r.*, 'semantic' AS search_type, 'bench' AS search_task
            FROM regions r
            WHERE EXISTS (
                SELECT 1 FROM matches m
                WHERE m.doc_id = r.doc_id AND m.page = r.page
                  AND NOT (m.mx1 - 15.0 > r.x2 OR r.x1 > m.mx2 + 15.0
                        OR m.my1 - 15.0 > r.y2 OR r.y1 > m.my2 + 15.0)
            )
        """,
    }


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
    oracles = dict(entry.oracle_sql())
    local = local_oracles(con)
    oracles.update(local)
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
        tag = " (local oracle)" if name in local else ""
        print(f"OK    {name}: {len(srows)} rows{tag}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
