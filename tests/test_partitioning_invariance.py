"""Engine-wide partitioning-invariance sweep.

Every ORACLED catalog query is contractually bit-reproducible (exact
integer/decimal aggregation, tie-broken windows, content-addressed
sampling). That contract is usually checked against DuckDB at a fixed
session config; this sweep checks the OTHER axis a 1000-executor
cluster actually varies: the physical layout. Each query runs under two
deliberately different layouts — the standard test config (32 shuffle
partitions) and a hostile one (7 shuffle partitions, 64 KB
maxPartitionBytes so even the tiny fixtures scan multi-split, AQE
coalescing on) — and the collected results must be IDENTICAL, row for
row, value for value.

Catches the class of bug the oracle can't see when the bug doesn't fire
at the oracle's layout: partition-order-dependent float accumulation,
first/last-without-order, per-partition state leaking into results
(salts from task ids, monotonically_increasing_id), and Arrow-batch-
boundary effects in the vectorized ops.

sf0.001 keeps the sweep minutes-scale; the layout delta, not the data
volume, is what exercises the failure mode.
"""

from __future__ import annotations

import math

import pytest

from novi_pdq_etl_project_prod_spark.catalog import ORACLES, QUERIES
from tests.conftest import SF_SMOKE

#: (conf key, standard value, hostile value)
_LAYOUT = [
    ("spark.sql.shuffle.partitions", "32", "7"),
    ("spark.sql.files.maxPartitionBytes", "8388608", "65536"),
    ("spark.sql.adaptive.coalescePartitions.enabled", "true", "false"),
]

ORACLED = sorted(ORACLES)


def _canon(v):
    """Totally-ordered exact representation: floats by bit pattern (NOT
    approx — the contract is bit-stability; NaN normalized so NaN ==
    NaN), everything else by typed repr so None/str/int mix sorts."""
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else "f:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def _run(spark, name, sf_dir):
    rows = QUERIES[name](spark, sf_dir).collect()
    return sorted(
        tuple(_canon(v) for v in row) for row in rows
    )


@pytest.mark.parametrize("name", ORACLED)
def test_partitioning_invariance(spark, name):
    base = {k: spark.conf.get(k) for k, _, _ in _LAYOUT}
    try:
        for k, std, _ in _LAYOUT:
            spark.conf.set(k, std)
        a = _run(spark, name, SF_SMOKE)
        for k, _, hostile in _LAYOUT:
            spark.conf.set(k, hostile)
        b = _run(spark, name, SF_SMOKE)
    finally:
        for k, v in base.items():
            spark.conf.set(k, v)
    assert a == b, (
        f"{name}: result depends on physical layout "
        f"({len(a)} rows std vs {len(b)} rows hostile)"
    )


#: No-oracle queries are *also* seeded-deterministic by design — LSH/
#: MinHash signatures are pure row functions, top-k windows tie-break on
#: ids, k-means trains on a deterministic sample, zlib/eigh are exact.
#: The two sketch queries are exercised too: HLL partial merges are
#: commutative, and percentile_approx's merge is order-sensitive in
#: principle, so a failure there would be excluded and documented, not
#: hidden — as of this round both pass at fixture scale.
NO_ORACLE = sorted(q for q in QUERIES if q not in ORACLES)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_partitioning_invariance_no_oracle(spark, name):
    test_partitioning_invariance(spark, name)
