"""Offline unit tests for the Iceberg adapter's pure metadata logic
(round-5 review findings) — these run WITHOUT an Iceberg runtime jar,
unlike the ``-m iceberg`` conformance scenario.

1. ``dense_total``: the dense version must survive snapshot expiry
   followed by a FOREIGN commit (``rewrite_data_files`` from
   ``compact`` carries no ``etl.version``) — the old retained-count
   fallback renumbered the lineage, reusing dense versions and
   silently stalling relay watermarks.
2. ``lineage_order``: two commits in the same millisecond with random
   snapshot ids can sort child-before-parent under
   ``committed_at, snapshot_id``; the parent-id chain is the truth.
"""

from __future__ import annotations

from etl_framework_spark.lakehouse.iceberg import dense_total, lineage_order


def _snap(sid, parent, version=None, at=0):
    return {
        "snapshot_id": sid,
        "parent_id": parent,
        "committed_at": at,
        "summary": {} if version is None else {"etl.version": str(version)},
    }


# ------------------------------------------------------------ dense_total


def test_dense_total_simple():
    snaps = [_snap(10, None, 1), _snap(11, 10, 2), _snap(12, 11, 3)]
    assert dense_total(snaps) == 3


def test_dense_total_counts_foreign_tail():
    """20 adapter commits, expiry retains the last one (v20), then
    compact's rewrite_data_files lands a snapshot with NO etl.version:
    total must be 21, not len(snaps)=2."""
    snaps = [_snap(90, 89, 20), _snap(91, 90)]  # foreign tail
    assert dense_total(snaps) == 21


def test_dense_total_foreign_between_adapter_commits():
    snaps = [_snap(1, None, 5), _snap(2, 1), _snap(3, 2, 7), _snap(4, 3)]
    # newest etl.version=7 + one foreign after it
    assert dense_total(snaps) == 8


def test_dense_total_all_foreign_or_empty():
    assert dense_total([]) == 0
    assert dense_total([_snap(1, None), _snap(2, 1)]) == 2


# ---------------------------------------------------------- lineage_order


def test_lineage_order_fixes_same_millisecond_inversion():
    """Parent has the LARGER random snapshot id and the same timestamp:
    the timestamp sort puts the child first; the chain corrects it."""
    parent = _snap(900, None, 1, at=1000)
    child = _snap(100, 900, 2, at=1000)
    got = lineage_order([child, parent])  # committed_at,snapshot_id order
    assert [s["snapshot_id"] for s in got] == [900, 100]


def test_lineage_order_expired_root_parent_is_normal():
    """The oldest retained snapshot's parent was expired — its parent_id
    points outside the retained set and it is the chain root."""
    a = _snap(10, 9, 5, at=1)  # 9 not retained
    b = _snap(11, 10, 6, at=2)
    assert [s["snapshot_id"] for s in lineage_order([a, b])] == [10, 11]


def test_lineage_order_falls_back_on_branches():
    """Two children of one parent (a branch): no single linear chain —
    keep the timestamp order rather than guessing."""
    a = _snap(1, None, at=1)
    b = _snap(2, 1, at=2)
    c = _snap(3, 1, at=3)
    assert lineage_order([a, b, c]) == [a, b, c]


def test_lineage_order_falls_back_on_gap():
    """A mid-chain snapshot was removed (corrupt/partial metadata): the
    walk cannot cover every row, so the timestamp order stands."""
    a = _snap(1, None, at=1)
    c = _snap(3, 2, at=3)  # parent 2 missing -> second root
    assert lineage_order([a, c]) == [a, c]
