"""Driver-environment equivalence check: vanilla session vs engine session.

The driver imports __spark_entry__ with its OWN SparkSession — no AQE
tuning, no timezone pin, no shuffle-partition sizing, cwd outside the
repo. Every round-3..5 "works locally, fails in the driver" incident
was an environment divergence of exactly this kind (session timezone,
nanos handling, conf-dependent plans). This harness runs a query set
through BOTH environments and requires canonically identical rows:

  phase vanilla — SparkSession.builder.master(local[8]) and NOTHING
      else, launched from a cwd outside the repo;
  phase engine  — presto_truffle_spark.session.get_spark (the tuned
      session selfcheck and bench use).

Each phase is a SEPARATE subprocess: PySpark bakes the first session's
conf into the JVM launch args, so an in-process A/B would compare the
engine JVM against itself (the native_ext_bench lesson). Rows are
canonicalized with selfcheck's driver-faithful canon() and hashed.

Usage: python tools/driver_env_sim.py [n_queries]    (default: the
driver's 50-query verify window)  — prints one JSON line; exit 1 on
any hash divergence or error.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")


def _phase(which: str, names: list[str]) -> None:
    os.chdir("/tmp")  # driver cwd is outside the repo
    if which == "vanilla":
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("driver-env-sim-vanilla")
            .getOrCreate()
        )
    else:
        from presto_truffle_spark.session import get_spark

        spark = get_spark("driver-env-sim-engine", cpus="8")

    import __spark_entry__ as entry
    from tools.selfcheck import canon

    out: dict[str, str] = {}
    for name in names:
        try:
            df = entry.queries()[name](spark, SF_DIR)
            cols = [c.lower() for c in df.columns]
            rows = [tuple(r) for r in df.collect()]
            canonical = canon(rows, cols)
            h = hashlib.md5(
                "\n".join(map(str, canonical)).encode()
            ).hexdigest()
            out[name] = f"{len(rows)}:{h}"
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERROR:{type(e).__name__}:{str(e)[:120]}"
    spark.stop()
    print("PHASE_JSON " + json.dumps(out))


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] in ("vanilla", "engine"):
        _phase(sys.argv[1], json.loads(sys.argv[2]))
        return 0

    from presto_truffle_spark import registry

    registry.load_all_modules()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(registry.get_queries())[:n]

    results = {}
    for which in ("vanilla", "engine"):
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                which,
                json.dumps(names),
            ],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        line = next(
            l for l in proc.stdout.splitlines() if l.startswith("PHASE_JSON ")
        )
        results[which] = json.loads(line[len("PHASE_JSON "):])

    # an ERROR is a failure even when both phases error IDENTICALLY —
    # a missing fixture dir would otherwise hash-match on the error
    # string and report a false 50/50 green
    errored = sorted(
        name
        for name in names
        if results["vanilla"][name].startswith("ERROR")
        or results["engine"][name].startswith("ERROR")
    )
    diverged = sorted(
        name
        for name in names
        if name not in errored
        and results["vanilla"][name] != results["engine"][name]
    )
    print(
        json.dumps(
            {
                "queries": len(names),
                "identical": len(names) - len(diverged) - len(errored),
                "diverged": diverged,
                "errored": errored,
                "errors": {
                    n: {
                        "vanilla": results["vanilla"][n],
                        "engine": results["engine"][n],
                    }
                    for n in (diverged + errored)
                },
                "sf_dir": SF_DIR,
            }
        )
    )
    return 1 if diverged or errored else 0


if __name__ == "__main__":
    sys.exit(main())
