"""Registry-wide plan audit pin: every registered query's physical plan
is free of unexplained CartesianProduct / conditioned-BNLJ /
single-partition-WindowExec nodes. The whitelist in tools/plan_audit.py
is the reviewed ledger of bounded exceptions (grid-scale inputs, k-row
frames, scalar threshold joins, the documented exact-rank family) — a
NEW flag means a new operator shipped a false-scale plan shape, which
is exactly the regression this repo's SCALING.md promises cannot land
silently."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_plan_audit_no_unexplained_flags(sf_dir):
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "plan_audit.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["errors"] == {}, d["errors"]
    assert d["flagged"] == {}, d["flagged"]
