"""Value oracle for `semantic_search` (round-3 verdict #6).

The driver's oracle must run on stock DuckDB, which has no partial_ratio —
so the query is rows-only THERE. Here the repo's own
`kernels/fuzzy.score` registers as a DuckDB scalar function
(`con.create_function`), making the full query + neighbourhood semi-join
value-comparable. The SQL twin scores every row (no prefilter), so a
heuristic prefilter drop of a true match would surface as a mismatch.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"


def test_semantic_search_values_match_duckdb_twin(spark):
    import __spark_entry__ as entry
    from scripts.check_oracle import canon, local_oracles

    sdf = entry.q_semantic_search(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    assert len(srows) == 32  # pinned at sf0.01

    con = duckdb.connect()
    for t in entry.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    sql = local_oracles(con)["semantic_search"]
    import numpy as np

    ddf = con.sql(sql).df().replace({np.nan: None})
    assert sorted(sdf.columns) == sorted(ddf.columns)
    cols = sorted(sdf.columns)
    skeys = sorted("|".join(canon(r[c]) for c in cols) for r in srows)
    dkeys = sorted(
        "|".join(canon(r[c]) for c in cols) for r in ddf.to_dict("records")
    )
    assert skeys == dkeys
