"""Arbitrary stateful streaming: ``applyInPandasWithState``.

The custom-stateful-operator escape hatch (SURVEY.md §2.2): per-key state
that survives across micro-batches, with timeout-based expiry. The demo
operator maintains a per-user running profile (event count, value sum,
last-seen timestamp) — the canonical online-feature-store update job.

Rows-only check: arbitrary state has no SQL twin by construction (that is
the point of the operator); a batch-equivalence pytest covers correctness
for the single-batch case.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from presto_truffle_spark.registry import query
from presto_truffle_spark.streaming.windows import _events_stream, checkpoint_dir

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen timestamp"
_STATE_SCHEMA = "n bigint, total double, last long"


@query("streaming_stateful_profile")  # rows-only: arbitrary state has no SQL twin
def streaming_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running profile via applyInPandasWithState. State is one
    tiny tuple per user — bounded by key cardinality, not stream length;
    NoTimeout here, production uses event-time timeout for key expiry.

    The state-update function is NESTED deliberately: module-level
    functions pickle by reference, and the driver's Python workers cannot
    import this package when the driver runs from a different cwd. Nested
    functions ship by value inside the task closure.
    """

    def update_profile(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # fold each micro-batch of one user's events into persistent state
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].astype("int64").max()))
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_seen": [pd.Timestamp(last)],
            }
        )

    stream = _events_stream(spark, sf_dir).select("user_id", "ts", "value")
    profiled = stream.groupBy("user_id").applyInPandasWithState(
        update_profile,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "s" + uuid.uuid4().hex[:12]
    # Pin state-store partition count low for the fixture run (see
    # streaming.windows._run_to_memory for rationale).
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            profiled.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint_dir())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)
