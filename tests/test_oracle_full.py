"""The judge's full oracle sweep, in CI shape: ``-m oracle_full``.

Every registered query — the 50 driver-recorded contract entries AND
the extras — runs on Spark at sf0.01 (the driver's correctness scale)
and, where an oracle exists, is compared against DuckDB with the
driver's exact canonicalization (column-name-sorted,
order-insensitive values).  This is ``tools/check_oracle.py`` as a
pytest surface, so the extras gate (sf0.001) and the tool can never
drift apart: same registry, same comparator, one command::

    python -m pytest tests/ -m oracle_full -q

Deselected by default (takes ~4 min on 32 cpus): the regular
``pytest tests/`` run stays the fast gate, and ``test_extra_oracle``
still hash-checks every extra at sf0.001 there.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from plda_spark.oracle import compare_frames, duckdb_connection

SF01 = "/root/testdata/sf0.01"

_QUERIES = entrymod.all_queries()
_ORACLES = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}


@pytest.fixture(scope="module")
def duck01():
    con = duckdb_connection(SF01)
    yield con
    con.close()


@pytest.mark.oracle_full
@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle_at_sf0_01(name, spark, duck01):
    sdf = _QUERIES[name](spark, SF01).toPandas()
    if name not in _ORACLES:
        # the declared-stochastic tail (LDA train/infer/coherence):
        # the driver records rows-only; mirror that
        assert len(sdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    ddf = duck01.sql(_ORACLES[name]).df()
    assert len(sdf) > 0, f"{name}: empty result at {SF01}"
    diff = compare_frames(sdf, ddf)
    assert diff is None, f"{name}: {diff}"
