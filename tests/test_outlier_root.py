"""Depth-0 (root-cluster) outlier validation: the SQL-expressible slice
of the conditioning-tree engine, pinned both structurally (flagged sets,
bound consistency) and differentially (DuckDB window-SQL twin — the same
SQL the driver's CORRECTNESS gate runs).

Reference semantics: define_numerical_cluster
(/root/reference/src/clusters.cpp:108-446) and the no-cond categorical
rule (/root/reference/src/cat_outlier.cpp:285-328).
"""

import math

import pytest

SF_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def root_result(spark):
    import __spark_entry__ as e
    rows = e.queries()["outlier_validate_root"](spark, SF_01).collect()
    return rows


def test_root_flagged_sets(root_result):
    """Planted extremes (and only they) are flagged: 5 low + 5 high
    text_len, 3 out-of-window warc_ts, zero lang rows (tot<1000 gate)."""
    by_col = {}
    for r in root_result:
        by_col.setdefault(r.suspicious_column, set()).add(r.doc_id)
    assert by_col["text_len"] == {89, 97, 178, 194, 267, 291, 356, 388,
                                  445, 485}
    assert by_col["warc_ts"] == {127, 254, 381}
    assert "lang" not in by_col


def test_root_bounds_and_scores(root_result):
    """Every flagged value sits outside [lower_lim, upper_lim]; scores
    obey the z>=z_outlier Chebyshev ceiling 1/64."""
    for r in root_result:
        assert r.value_num <= r.lower_lim or r.value_num >= r.upper_lim, r
        assert 0.0 < r.outlier_score <= 1.0 / 64.0 + 1e-12, r
        # bounds must be finite and ordered
        assert math.isfinite(r.lower_lim) and math.isfinite(r.upper_lim)
        assert r.lower_lim < r.upper_lim


def test_root_matches_duckdb_twin(spark):
    """Full differential check vs the oracle SQL at sf0.01 — the same
    comparison the driver's correctness gate performs."""
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_01}/documents.parquet')")
    sql = e.oracle_sql()["outlier_validate_root"]
    want = con.sql(sql)
    wrows, wcols = want.fetchall(), [d[0] for d in want.description]
    got = e.queries()["outlier_validate_root"](spark, SF_01)
    grows, gcols = got.collect(), got.columns
    assert sorted(gcols) == sorted(wcols)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            t = []
            for i in order:
                v = r[i]
                t.append(round(v, 6) if isinstance(v, float) else v)
            out.append(tuple(t))
        return sorted(out, key=repr)

    assert canon([tuple(r) for r in grows], gcols) == canon(wrows, wcols)
