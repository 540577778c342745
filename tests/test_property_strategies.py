"""Property-based checks: load-strategy composition vs a dict oracle,
and the self-contained xlsx codec roundtrip.

Extends the reference's example-based strategy suite
(reference:tests/integration/pipeline/test_pipeline_integration.py:195-252)
with Hypothesis-generated SEQUENCES of strategy applications — the
invariant is that the table state always equals a trivially-correct
driver-side oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_framework_spark.lakehouse import LakeTable
from etl_framework_spark.operators import LoadStrategy, load

#: one batch: unique keys -> value; one strategy to apply it with
batch = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=999),
    min_size=1,
    max_size=5,
)
# keyed-strategy sequences only: mixing blind APPEND with later keyed ops
# leaves bucket-dependent duplicate-key state (documented caveat in
# ``load``); append accumulation is covered by the example-based suite.
step = st.tuples(st.sampled_from(["replace", "update", "upsert"]), batch)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(steps=st.lists(step, min_size=1, max_size=4))
def test_strategy_sequences_match_oracle(spark, tmp_path_factory, steps):
    tmp = tmp_path_factory.mktemp("strat")
    target = str(tmp / "t")
    # oracle: a multiset of (k, v) rows
    state: list[tuple[int, int]] = []
    first = True
    for strategy, b in steps:
        df = spark.createDataFrame(sorted(b.items()), "k int, v int")
        load(
            spark,
            df,
            target,
            strategy=strategy if not first else "replace",
            key_columns=["k"],
            n_buckets=4,
        )
        s = strategy if not first else "replace"
        if s == "replace" or first:
            state = sorted(b.items())
        elif s == "update":
            # keyed strategies resolve to ONE row per key: duplicates
            # from earlier APPENDs collapse to the max-payload winner
            d: dict[int, int] = {}
            for k, v in state:
                d[k] = max(d.get(k, v), v)
            for k, v in b.items():
                if k in d:
                    d[k] = v  # update matched keys; never inserts
            state = sorted(d.items())
        else:  # upsert: collapse + update-or-insert
            d = {}
            for k, v in state:
                d[k] = max(d.get(k, v), v)
            d.update(b)
            state = sorted(d.items())
        first = False
        got = sorted(
            (r["k"], r["v"]) for r in LakeTable(spark, target).current().collect()
        )
        assert got == state, f"after {s}: {got} != {state}"


#: xlsx cell values: None / bool / int / float / text incl. specials
cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
        ),
        max_size=20,
    ),
)


@settings(max_examples=40, deadline=None)
@given(
    n_cols=st.integers(min_value=1, max_value=5),
    rows=st.lists(st.lists(cell, min_size=5, max_size=5), max_size=6),
)
def test_xlsx_codec_roundtrip_property(tmp_path_factory, n_cols, rows):
    """write_xlsx -> parse_xlsx is the identity on header + cells
    (strings with XML specials and non-ASCII included; floats exact
    because repr round-trips)."""
    from etl_framework_spark.sources.xlsx import parse_xlsx, write_xlsx

    header = [f"col_{i}" for i in range(n_cols)]
    data = [r[:n_cols] for r in rows]
    p = str(tmp_path_factory.mktemp("xlsx") / "t.xlsx")
    write_xlsx(p, header, data)
    got_header, got_rows = parse_xlsx(p)
    if not data:
        assert got_rows == []
        return
    assert got_header == header
    assert len(got_rows) == len(data)
    for got, exp in zip(got_rows, data):
        for g, e in zip(got, exp):
            if isinstance(e, float) and not isinstance(e, bool):
                assert g is not None and abs(g - e) <= 1e-9 * max(1.0, abs(e))
            else:
                assert g == e, (g, e)
