"""The Scala Catalyst extension (SURVEY §4.3) — run in a SUBPROCESS
because spark.sql.extensions binds at session creation and the shared
test session must stay vanilla (driver parity)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "native", "presto-truffle-ext.jar")


@pytest.mark.skipif(
    not os.path.exists(JAR),
    reason="extension jar not built (tools/build_native.sh)",
)
def test_catalyst_extension_end_to_end():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "native_ext_check.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "NATIVE_EXT_OK" in proc.stdout
