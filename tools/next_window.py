"""Print the suggested next-round DRIVER_WINDOW.

Reads every CORRECTNESS_r*.json in the repo root, collects the queries
that have ever had a driver-green (hash_match, or rows_match for
rows-only entries) row, and prints:

  1. the 50-entry window suggestion — never-verified oracle-backed
     queries first (in current queue order), then never-verified
     rows-only, then (only if slots remain) oldest-verified re-checks;
  2. the leftover never-verified queries that don't fit this round.

Zero-debt maintenance policy (in effect since round 7, when the
never-verified queue drained): with no debt, the emission is PURELY
stale-first — the 50 queries whose most recent driver-green row is
oldest (registration order breaks ties), so every registered query
re-verifies at least every ceil(n_registered / 50) ≈ 6 rounds.  New
registrations (always appended to suite._NEXT_WINDOW_QUEUE) count as
never-verified and jump the stale queue the following round.

Advisory only — it rewrites nothing.  Apply by editing
``suite.DRIVER_WINDOW`` (+ the queue / previously-verified lists) and
``tests/test_suite_contract.py::EXPECTED_WINDOW`` together, then
regenerate QUERIES.md (tools/gen_queries_md.py).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from automated_batch_data_pipeline_nyc_spark import suite  # noqa: E402


def main() -> None:
    # name -> round index of the MOST RECENT driver-green row
    last_green: dict[str, int] = {}
    for rnd, path in enumerate(
        sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    ):
        for name, row in json.load(open(path)).items():
            ok = row.get("hash_match")
            if ok is None:  # rows-only driver check
                ok = row.get("rows_match")
            if ok is None:
                # Rows-only-by-design queries record spark_rows with
                # err == "no_oracle" and null match fields; the driver
                # DID execute them, so they are not "never-verified".
                ok = (
                    row.get("spark_rows") is not None
                    and row.get("err") in (None, "no_oracle")
                )
            if ok:
                last_green[name] = rnd
    green = set(last_green)

    registered = list(suite.QUERIES)
    oracle = {n for n, q in suite.QUERIES.items() if q.oracle is not None}
    never = [n for n in registered if n not in green]
    never_oracle = [n for n in never if n in oracle]
    never_rows = [n for n in never if n not in oracle]

    window = (never_oracle + never_rows)[:50]
    # Standing SS2 reference-pipeline canary (VERDICT r7 item 3): the
    # clean_nyc_taxi_pipeline surface re-verifies EVERY round, so it is
    # never more than one round stale — even when never-verified debt
    # fills all 50 slots, the canary displaces the last one (the
    # displaced query surfaces in the leftover list below).
    if "clean_pipeline" not in window:
        if len(window) >= 50:
            window = window[:49]
        window.append("clean_pipeline")
    if len(window) < 50:
        # top up with already-verified queries: the one whose most recent
        # driver-green row is OLDEST re-verifies first (registration
        # order breaks ties within a round)
        seen = set(window)
        stale_first = sorted(
            (n for n in registered if n not in seen),
            key=lambda n: (last_green.get(n, -1), registered.index(n)),
        )
        window += stale_first[: 50 - len(window)]
    leftover = [n for n in never_oracle + never_rows if n not in set(window)]

    print(f"# registered: {len(registered)}  driver-green ever: {len(green)}")
    print(f"# never-verified: {len(never)} "
          f"({len(never_oracle)} oracle-backed, {len(never_rows)} rows-only)")
    print("\nDRIVER_WINDOW = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    if leftover:
        print(f"\n# leftover for the round after ({len(leftover)}):")
        for n in leftover:
            print(f"#   {n}")


if __name__ == "__main__":
    main()
