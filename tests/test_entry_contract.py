"""Pin the driver-contract suite shape (round-2 verdict #9): every
queries() entry is either value-oracled or explicitly justified in the
ROWS_ONLY ledger — a future query cannot land unverified without failing
this test. Pure-python (no Spark session): oracle_sql() only builds SQL
strings.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_is_oracled_or_justified():
    q = set(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    rows_only = set(entry.ROWS_ONLY.keys())
    assert o <= q, f"orphan oracles (no matching query): {sorted(o - q)}"
    unaccounted = q - o - rows_only
    assert not unaccounted, (
        f"queries with neither an oracle_sql twin nor a ROWS_ONLY "
        f"justification: {sorted(unaccounted)}"
    )
    stale = rows_only & o
    assert not stale, (
        f"ROWS_ONLY entries that now HAVE an oracle (delete the ledger "
        f"line): {sorted(stale)}"
    )


def test_rows_only_justifications_are_substantive():
    for name, why in entry.ROWS_ONLY.items():
        assert len(why) > 40, f"{name}: justification too thin: {why!r}"


def test_ann_twins_fold_model_state_as_literals():
    """The round-3 promotion: lsh_topk / ivf_topk carry generated value
    oracles whose hyperplanes / centroids are literal arrays."""
    sql = entry.oracle_sql()
    assert "lsh_topk" in sql
    assert "list_dot_product" in sql["lsh_topk"]
    assert "xor(qb, m)" in sql["lsh_topk"]
    # ivf present when the sf0.01 parquet is readable (it is, in CI and
    # the driver container); its centroid literals come from lloyd_kmeans
    assert "ivf_topk" in sql
    assert "list_position(s, list_max(s))" in sql["ivf_topk"]
