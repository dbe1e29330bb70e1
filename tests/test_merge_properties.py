"""Property-based MERGE semantics: merge_frames vs a pure-Python
reference model over randomized frames — including NULL merge keys
(the ANSI never-match rule fixed in round 9), multiple target rows per
key (all matched rows update/delete), clause subsets, and empty sides.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEY = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
VAL = st.integers(min_value=-4, max_value=4)

TARGET = st.lists(st.tuples(KEY, VAL), max_size=7)
#: source: non-null keys must be unique (merge_frames refuses dups);
#: NULL-key rows may repeat (they only ever insert).
SOURCE = st.lists(st.tuples(KEY, VAL), max_size=7).map(
    lambda rows: [
        r
        for i, r in enumerate(rows)
        if r[0] is None or r[0] not in [x[0] for x in rows[:i]]
    ]
)


def _model(target, source, with_update, with_delete, with_insert):
    """ANSI MERGE over (k, v) rows with clauses:
    update v = t.v + s.v; delete when s.v == 0 (delete wins over
    update); insert by name. NULL keys never match."""
    src = {k: v for k, v in source if k is not None}
    tgt_keys = {k for k, _ in target if k is not None}
    out = []
    for k, v in target:
        if k is not None and k in src:
            sv = src[k]
            if with_delete and sv == 0:
                continue
            out.append((k, v + sv) if with_update else (k, v))
        else:
            out.append((k, v))
    if with_insert:
        for k, sv in source:
            if k is None or k not in tgt_keys:
                out.append((k, sv))
    return sorted(out, key=lambda r: (r[0] is None, r[0] or 0, r[1]))


@pytest.mark.parametrize(
    "with_update,with_delete,with_insert",
    [
        (True, True, True),
        (True, False, False),
        (False, True, True),
        (False, False, True),
    ],
)
@given(target=TARGET, source=SOURCE)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_frames_matches_reference_model(
    spark, target, source, with_update, with_delete, with_insert
):
    from novi_pdq_etl_project_prod_spark.operators.modeling import merge_frames

    tdf = spark.createDataFrame(target, "k int, v int")
    sdf = spark.createDataFrame(source, "k int, v int")
    got = merge_frames(
        tdf,
        sdf,
        on=("k",),
        when_matched_update={"v": "t.v + s.v"} if with_update else None,
        when_matched_delete="s.v = 0" if with_delete else None,
        when_not_matched_insert=with_insert,
    )
    got_rows = sorted(
        ((r.k, r.v) for r in got.collect()),
        key=lambda r: (r[0] is None, r[0] or 0, r[1]),
    )
    assert got_rows == _model(
        target, source, with_update, with_delete, with_insert
    )
