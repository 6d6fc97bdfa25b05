"""Gate smoke tests: the driver contract must always be importable.

Round-3 postmortem: a consolidation left 11 dangling names in
``queries()``, which zeroed out the entire correctness/bench signal for
the round. These tests make that class of breakage a local pytest
failure instead of a driver-side blackout.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_queries_importable_and_callable():
    q = entry.queries()
    assert len(q) > 0
    for name, fn in q.items():
        assert callable(fn), f"queries()[{name!r}] is not callable"


def test_oracle_keys_match_query_keys():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q - o == set(), f"queries without an oracle: {sorted(q - o)}"
    assert o - q == set(), f"oracles without a query: {sorted(o - q)}"


def test_oracles_are_nonempty_sql():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), (
            f"oracle_sql()[{name!r}] is not a SQL string"
        )




def test_gate_stays_within_driver_verified_window():
    """The driver verifies only the first 50 entries; an entry past the
    cap would be silently ungraded. queries() itself asserts the cap —
    this just pins the contract with a clear local failure."""
    assert len(entry.queries()) <= 50


def test_txn_mutations_gate_entry_cleans_its_temp_table(spark, sf_dir):
    """ADVICE r8: _q_txn_mutations builds a throwaway txn table under
    tempfile.mkdtemp; the result must be pinned (localCheckpoint) and
    the temp root REMOVED before the frame is returned — otherwise
    every gate/bench invocation accretes a full table copy in /tmp."""
    import glob

    before = set(glob.glob("/tmp/txn_gate_*"))
    df = entry.queries()["txn_mutations"](spark, sf_dir)
    leftover = set(glob.glob("/tmp/txn_gate_*")) - before
    assert leftover == set(), f"temp txn table leaked: {sorted(leftover)}"
    # the frame survives the removal (it is checkpointed, not lazy
    # over deleted files)
    assert df.count() > 0
