from __future__ import annotations

from tests.conftest import SF_SMALL


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "avg_disc" in df.columns


def test_flagship_matches_oracle_sf0001(spark, duck):
    import __spark_entry__ as e

    name = "flagship_pricing_join"
    sdf = e.queries()[name](spark, SF_SMALL)
    srows = {tuple(r[:2]): r for r in sdf.collect()}
    orows = {tuple(r[:2]): r for r in duck.sql(e.oracle_sql()[name]).fetchall()}
    assert set(srows) == set(orows)
    for k, sr in srows.items():
        for a, b in zip(sr, orows[k]):
            assert a == b, (k, sr, orows[k])


def test_registry_contract():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
