"""Driver-contract shape checks (cheap, no Spark jobs)."""

from __future__ import annotations


def test_queries_and_oracles_aligned():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(qs) == set(os_), set(qs) ^ set(os_)
    assert len(qs) >= 30
    for name, sql in os_.items():
        assert "SELECT" in sql.upper(), name


def test_bench_headline_subset_of_queries():
    import __spark_entry__ as e
    import bench

    assert set(bench.HEADLINE) <= set(e.queries())


def test_entry_is_lazy():
    """entry() must return a DataFrame without collecting (driver collects)."""
    import inspect

    import __spark_entry__ as e

    src = inspect.getsource(e.entry)
    assert ".collect()" not in src
