"""Guard band for the 6dp-rounding oracle conversions (ADVICE r10).

``embedding_centroids`` / ``embedding_centroids_udaf`` are HASH-VERIFIED
on the strength of 6dp rounding absorbing cross-engine float
summation-order spread.  Unlike the dyadic-rational mahalanobis recipe
this is probabilistic: a mean within an ulp of a rounding boundary
(x.5 at the 6th decimal) could still flip the rounded digit between
Spark's fold and DuckDB's avg and flake the hash check.  This test
makes the "no boundary-adjacent value exists in the fixtures" claim a
checked invariant instead of an assumption: every per-(label, dim)
mean and per-label squared norm must sit at least GUARD away from the
nearest rounding boundary in scaled (1e6) units — GUARD is ~9 orders
of magnitude above a double ulp at these magnitudes (~1e-11 scaled),
so engine spread can never cross a boundary.

DuckDB-only (no Spark session): the invariant is a property of the
fixture VALUES, not of either engine's execution.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

#: min |frac(x*1e6) - 0.5| measured: 2.9e-4 (sf0.1 means).  Double ulp
#: at these magnitudes is ~1e-11 scaled; 1e-6 leaves 5 orders of
#: margin on both sides.
GUARD = 1e-6


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_centroid_means_clear_of_6dp_boundaries(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    gap_mean, gap_norm = con.execute(
        """
        WITH exploded AS (
          SELECT label, generate_subscripts(embedding,1)-1 AS dim,
            unnest(embedding) AS v
          FROM embeddings),
        m AS (SELECT label, dim, avg(CAST(v AS DOUBLE)) AS mu
              FROM exploded GROUP BY label, dim),
        n AS (SELECT label, SUM(mu*mu) AS nsq FROM m GROUP BY label)
        SELECT
          (SELECT MIN(ABS(ABS(mu*1e6 - floor(mu*1e6)) - 0.5)) FROM m),
          (SELECT MIN(ABS(ABS(nsq*1e6 - floor(nsq*1e6)) - 0.5)) FROM n)
        """
    ).fetchone()
    assert gap_mean > GUARD, (
        f"a per-(label,dim) centroid mean sits {gap_mean:.2e} scaled "
        "units from a 6dp rounding boundary — the hash check can flake"
    )
    assert gap_norm > GUARD, (
        f"a per-label squared norm sits {gap_norm:.2e} scaled units "
        "from a 6dp rounding boundary — the hash check can flake"
    )
