"""Oracle-typing lint: every oracle_sql() result schema must be hashable
by the driver's comparator.

The driver hashes oracle values as DuckDB returns them; DuckDB's wide
types (HUGEINT from integer sum(), DECIMAL from literal arithmetic)
stringify differently from the Spark side's BIGINT/DOUBLE and flip the
hash even when the values are numerically identical (round-2
`events_sessions`, round-3 `mixture_plan`/`packing_plan`/
`anchor_text_index`).  Rule: CAST every integer sum / windowed sum to
BIGINT and every DECIMAL-producing expression to DOUBLE in the oracle.

This test binds (plans, does not fully execute) each oracle against the
sf0.001 parquet and fails on any banned type in the *result* schema.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _connect():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no testdata")
def test_no_wide_types_in_any_oracle():
    import __spark_entry__ as entry

    con = _connect()
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)  # binds + plans; schema known without execution
        bad = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
               if any(b in str(t).upper() for b in BANNED)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle result schemas contain driver-unhashable wide types "
        "(CAST sums to BIGINT, decimal arithmetic to DOUBLE): "
        f"{offenders}")


def test_lint_catches_seeded_regression():
    """The lint must flag the exact bug class it guards against."""
    con = _connect()
    rel = con.sql("SELECT sum(doc_id) AS s, 0.5 * 2 AS d FROM documents")
    types = [str(t).upper() for t in rel.types]
    assert any(any(b in t for b in BANNED) for t in types), types


def test_oracle_sql_degrades_without_testdata(monkeypatch):
    """The literal-constants oracles (IVF/PQ/semantic/BPE) read parquet
    at generation time; with the tables absent, oracle_sql() must omit
    those entries (driver then records rows-only) instead of raising."""
    import importlib.util
    import os

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/tmp/nonexistent_sf")
    spec = importlib.util.spec_from_file_location(
        "spark_entry_degrade_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    d = entry.oracle_sql()
    literal_backed = {"ann_ivf_top10", "semantic_dedup", "pq_codes",
                      "ann_pq_top10", "bpe_token_counts", "bpe_merges"}
    assert not literal_backed & set(d)
    assert len(d) >= 80          # everything else still present
