"""Cap-engaged oracle parity: the q24 first-collision + max_bucket
semantics must match the DuckDB oracle on a corpus where the cap actually
fires — the driver's testdata never engages it (max bucket ~16 vs cap
500), so without this test the interaction is gate-invisible."""

from __future__ import annotations

import duckdb
import pytest

from pride_spark import registry


@pytest.fixture()
def adversarial_docs_dir(spark, tmp_path):
    # 600 identical docs (over the 500 cap in every band), a 30-doc
    # near-identical family (under cap), and filler distinct docs
    rows = (
        [(i, "the same boilerplate text repeated for everyone here") for i in range(600)]
        + [(1000 + i, f"shared prefix words alpha beta gamma delta tail{i}") for i in range(30)]
        + [(2000 + i, f"unique document number {i} with its own words {i * 7}") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "adv")
    df.coalesce(2).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_q24_cap_engaged_matches_duckdb_oracle(spark, adversarial_docs_dir):
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in registry.queries()["q24_lsh_near_dup"](
            spark, adversarial_docs_dir
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{adversarial_docs_dir}/documents.parquet/*.parquet'"
    )
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.execute(registry.oracle_sql()["q24_lsh_near_dup"]).fetchall()
    )
    # the 600-dup family must have been capped in every band (else this
    # test is not exercising the interaction at all)
    assert not any(a < 600 and b < 600 for a, b, _ in got)
    # the small families survive and the two engines agree exactly
    assert any(a >= 1000 for a, b, _ in got)
    assert got == want
