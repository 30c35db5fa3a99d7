"""Driver-contract consistency guards (no Spark session needed).

The driver consumes ``__spark_entry__.queries()`` / ``oracle_sql()``;
these tests pin the invariants the correctness gate relies on so a
refactor cannot silently drop an oracle or orphan one.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

#: the only queries allowed to run without a DuckDB oracle (rows-only
#: driver check): IDF-kernel scoring + iterative CC + the full p_53
#: pipeline are non-SQL-expressible; their native-scorer configurations
#: ARE oracled (q93/q94).
ROWS_ONLY = {"q90_er_resolve", "q91_mapping_pipeline", "q92_er_incremental"}


def test_every_oracle_has_a_query():
    qs = set(entry.queries())
    orphans = set(entry.oracle_sql()) - qs
    assert not orphans, f"oracle without query: {sorted(orphans)}"


def test_rows_only_set_is_exactly_documented():
    qs = set(entry.queries())
    unoracled = qs - set(entry.oracle_sql())
    assert unoracled == ROWS_ONLY


def test_queries_are_distinct_callables():
    qs = entry.queries()
    assert len({id(f) for f in qs.values()}) == len(qs)
    assert all(callable(f) for f in qs.values())


def test_oracle_sql_is_nonempty_select():
    for name, sql in entry.oracle_sql().items():
        s = sql.strip().upper()
        assert s.startswith(("SELECT", "WITH")), name
