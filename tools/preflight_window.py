"""Pre-flight the derived driver window: selfcheck exactly the 50 keys
the driver will hard-verify next round (the _FORCE_HEAD pins,
never-green registrations, and the oldest-green cohort, in the same
priority order registry.py derives).

The rotation exists to re-confirm stale driver evidence; this tool
closes the loop BEFORE the driver runs — a key that stales (a shared
helper edit, a session-conf leak, an engine-default change) gets
caught in-session instead of as a red CORRECTNESS row. r15 ran this
by hand on the r5 cohort (24/24); this makes it one command.

Usage: python tools/preflight_window.py [sf_dir] [n]
  sf_dir  fixture dir (default /root/testdata/sf0.01 — the driver's)
  n       how many window keys to check (default all 50)

Exit code 0 iff every checked key passes. Delegates the comparison to
tools/selfcheck.py (same canonicalization the driver uses).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from presto_truffle_spark import registry

    registry.load_all_modules()
    window = list(registry._verify_first())[:n]
    print(f"pre-flighting {len(window)} window keys against {sf_dir}")
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "selfcheck.py"),
         sf_dir, *window],
    )
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
