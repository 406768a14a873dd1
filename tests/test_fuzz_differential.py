"""Bounded CI slice of the random-query differential fuzzer
(tools/fuzz_differential.py — 100 seeds passed at authoring time; this
keeps a fast deterministic sample in the suite so grammar or
canonicalization regressions surface in CI)."""

from __future__ import annotations

import random
import shutil
import tempfile

import duckdb

from tools.fuzz_differential import run_case


def test_fuzz_differential_sample(spark):
    con = duckdb.connect()
    tmp = tempfile.mkdtemp(prefix="fuzz_ci_")
    try:
        failures = []
        for i in range(10):
            rng = random.Random(424242 + i)
            err = run_case(spark, con, rng, tmp, i)
            if err:
                failures.append((i, err))
        assert failures == []
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
