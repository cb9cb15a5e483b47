"""Rerun determinism of the driver window (round 10).

The driver contract assumes every registered query is a PURE function
of (fixture content, registration): it hash-compares Spark vs DuckDB
once per round, and the bench/noop runs execute the same callables
again in other sessions.  A query whose output depended on partition
order, wall clock, a leftover temp view, or a mutated staging dir
would pass a single parity check and then drift — this test executes
every window query TWICE in one session at sf0.001 and demands the
exact same typed row multiset both times (the same order-insensitive
hash the driver computes).

Bit-for-bit floats are deliberate: the suite's doctrine is that money
aggregates run in DECIMAL and every emitted double is either
deterministic IEEE or explicitly rounded, so same-engine reruns must
match exactly, not approximately.
"""

from __future__ import annotations

import hashlib

import pytest

from automated_batch_data_pipeline_nyc_spark import suite

from .conftest import SF_SMOKE


def _typed_hash(df) -> str:
    cols = sorted(df.columns)
    lines = []
    for row in df.collect():
        d = row.asDict()
        parts = []
        for c in cols:
            v = d[c]
            if isinstance(v, float):
                parts.append(repr(v))
            elif hasattr(v, "isoformat"):
                parts.append(v.isoformat())
            elif isinstance(v, (bytes, bytearray)):
                parts.append(hashlib.md5(bytes(v)).hexdigest())
            else:
                parts.append(str(v))
        lines.append("\x1f".join(parts))
    lines.sort()
    return hashlib.md5("\x1e".join(lines).encode()).hexdigest()


@pytest.mark.parametrize("name", suite.DRIVER_WINDOW)
def test_window_query_is_rerun_deterministic(spark, name):
    q = suite.QUERIES[name]
    h1 = _typed_hash(q.spark(spark, SF_SMOKE))
    h2 = _typed_hash(q.spark(spark, SF_SMOKE))
    assert h1 == h2, f"{name}: two same-session runs disagree"
