"""presto_truffle_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``dain/presto-truffle`` (a fused columnar scan→filter→project→aggregate
micro-engine, see ``/root/reference``) as an idiomatic Spark SQL / Catalyst
engine, and extends it with the relational, time-series and LLM-data-pipeline
operator surface documented in SURVEY.md §2.2.

Design stance (SURVEY.md §7.0):
  * No custom execution engine or memory format. The reference's entire
    contribution — a hand-fused columnar loop JIT-specialized by Truffle
    (reference ``TpchQuery6.java:24-41``, ``TruffleTest.java:30-45``) — is
    exactly what Spark's whole-stage codegen + vectorized Parquet reader
    already do. We declare logical plans with the DataFrame API and let
    Catalyst/Tungsten pick the physical strategy.
  * Every operator is a pure function ``(spark, sf_dir) -> DataFrame``:
    no ``collect()``, no driver-side loops — everything stays
    partition-parallel so the same code runs on local[32] and on a
    1000-executor cluster over 100 TB.
  * UDFs are the slow path: built-in ``pyspark.sql.functions`` first,
    Arrow-batched pandas UDFs second, never row-at-a-time Python in a hot
    path.
"""

from presto_truffle_spark.session import get_spark  # noqa: F401
from presto_truffle_spark.catalog import load_table, TABLES  # noqa: F401

__version__ = "0.1.0"
