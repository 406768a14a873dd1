"""CI pin for the bucketed-rank scale twins' error bound (VERDICT r11 #5).

tools/bucket_resolution_study.py MEASURES how far the B=1e4 histogram
quantization (the grid every *_bucketed twin registers with) moves the
Gini / MWU-z statistics from their exact-rank values; r11 recorded
3.0e-5 / 6.9e-5 at sf0.1 (BASELINE.md row). That was a study — nothing
failed if a future edit to the quantization spelling (bw = max DIV B +
1, v = x - x % bw) silently degraded it. This test promotes the
headline numbers to a pin: it re-runs the study (pure DuckDB, ~2.5 s)
and fails if the B=1e4 error leaves a ~3x-headroom band around the
recorded values, or if the first-order error DECAY (B=1e3 -> 1e4 must
shrink the Gini error) breaks.

The pinned bounds are fixture-specific (sf0.1 orders/customer); the
test skips if that fixture is absent rather than pin a different
surface.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

SF_DIR = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r11 measured values at B=1e4: gini_err 2.978e-5, mwu_z_err 6.913e-5.
# Pin with ~3x headroom: a real quantization regression (e.g. losing a
# decimal digit of bucket resolution) lands an order of magnitude out.
GINI_ERR_MAX = 1e-4
MWU_Z_ERR_MAX = 2.5e-4


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "orders.parquet")),
    reason="sf0.1 fixture absent",
)
def test_bucketed_twin_error_pinned():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bucket_resolution_study.py"), SF_DIR],
        capture_output=True,
        text=True,
        check=True,
        timeout=300,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    b4 = res["stats"]["B=10000"]
    assert b4["gini_err"] <= GINI_ERR_MAX, b4
    assert b4["mwu_z_err"] <= MWU_Z_ERR_MAX, b4
    # The error must be first-order in bucket width: a 10x finer grid
    # (1e3 -> 1e4) shrinks the Gini error by ~10x; pin the direction
    # with slack (>=2x shrink) so the curve's shape is also guarded.
    b3 = res["stats"]["B=1000"]
    assert b3["gini_err"] >= 2 * b4["gini_err"], (b3, b4)
    # Sanity: the exact anchors themselves (fixture constants).
    assert abs(res["gini_exact"] - 0.20550241) < 1e-6
    assert abs(res["mwu_z_exact"] - (-1.50329114)) < 1e-6
