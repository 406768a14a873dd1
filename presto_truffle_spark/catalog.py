"""Table catalog over the driver's parquet fixtures.

The reference's "catalog" is an in-memory ``List<Page>`` built once per
process (``PureJavaTest.java:12``; page model ``Page.java:5-30``). Ours is
the Parquet-backed star schema under ``/root/testdata/sf*`` (TESTDATA.md):
``spark.read.parquet`` gives us the columnar-batch-over-raw-buffers scan the
reference hand-wrote, plus predicate pushdown / column pruning for free.

At 100 TB each table would be a directory of many files (ideally
partitioned by date for ``lineitem``/``orders``/``events``); reading a
directory vs a single file is the same one-line call, so nothing here
changes at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at EVERY scale factor (fixed
# cardinality: 5 regions, 25 nations). `supplier`/`customer`/`part` all
# grow LINEARLY with scale factor (TPC-H: 10k/150k/200k rows per SF — and
# visibly in the fixtures: supplier is 10/100/1,000 rows at
# sf0.001/0.01/0.1), so at 100 TB none of them is broadcastable — joins on
# those go through `broadcast_if_dim`, i.e. AQE's runtime size-based pick
# of broadcast vs shuffle-hash vs sort-merge.
ALWAYS_BROADCAST = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning/pushdown happen in Catalyst.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    we read it via the legacy nanos-as-long path and convert to a proper
    TimestampType (microseconds). The division MUST be integer `div` —
    epoch-nanos (~1.7e18) exceed a double's 2^53 exact-integer range, so a
    float divide corrupts the microsecond digits. Truncation matches
    DuckDB's CAST(ts_ns AS TIMESTAMP), which the oracles use.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Set at call time: the driver owns the SparkSession, so we cannot
        # rely on session-creation configs being present.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # PySpark 4.1 resolves parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ
            # (ignoring nanosAsLong). The session timezone is pinned UTC
            # (session.py), so casting NTZ -> TIMESTAMP is value-preserving
            # and matches the DuckDB oracles' CAST(ts AS TIMESTAMP).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can use spark.sql."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
