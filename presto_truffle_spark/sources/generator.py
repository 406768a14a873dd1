"""Reference-parity data generator.

Reimplements (from observed semantics, not code) the reference's
deterministic TPC-H lineitem generator — ``TpchDataGenerator.java`` — in
two forms:

  1. ``golden_q6()``: a seed-exact pure-Python replica (java.util.Random
     LCG included, with Java's int32-overflow rejection semantics). Its
     5M-row output is bit-identical to an independent standalone Java
     replica using the REAL ``java.util.Random``
     (``tools/golden_replica/Golden.java``):
     ``revenue = 1.0316412119370338E8 over 95,326 rows``.

     FINDING: the reference's in-code comment claims
     ``3.0645958657700088E7 / 28201`` (``TpchQuery6.java:38-39``) — a
     0.56% selectivity that does NOT correspond to the current reference
     code under either replica; our measured 1.91% selectivity matches
     official TPC-H Q6 (the comment evidently predates the current
     generator). Differential testing (Python vs real-JDK Java) is what
     isolates the discrepancy to the reference's comment rather than our
     semantics.
  2. ``generate_lineitem_df()``: a distribution-faithful Spark generator
     (``spark.range`` + column expressions — rows synthesized on
     executors, any scale, no driver memory).

Semantics replicated (with citations):
  * quantity ~ U[1,50]; discount ~ U{0..10}/100 — ``TpchDataGenerator.java:39-42,77-79``
  * partkey ~ U[1, 2,000,000] via unbiased bounded nextLong (rejection on
    modulo overflow) — ``:47-48,81,104-120``
  * extendedprice = partPrice(partkey)*quantity/100 with partPrice =
    90000 + (pk/10)%20001 + (pk%1000)*100 cents — ``:82-83,122-130``
  * orderdate ~ U[92001, 94405] DENSE day offsets (not YYddd despite the
    julian-looking constants: ``toDateString`` indexes a dense 2557-day
    list at ``date - START_DATE``) — ``:50-53,85,148-163``
  * shipdate = orderdate + U[1,121] days; date index i ≡ 1992-01-01 + i
    days under the reference's y%4/y%100 leap rule, which coincides with
    the real calendar for 1992-1998 — ``:86-87,165-205``
"""

from __future__ import annotations

import datetime as dt

_MASK48 = (1 << 48) - 1
_MULT = 0x5DEECE66D
_ADD = 0xB


class JavaRandom:
    """java.util.Random's 48-bit LCG (public algorithm, JDK spec)."""

    def __init__(self, seed: int):
        self.seed = (seed ^ _MULT) & _MASK48

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * _MULT + _ADD) & _MASK48
        r = self.seed >> (48 - bits)
        # Java casts to signed 32-bit int: only bits=32 can go negative.
        return r - (1 << 32) if r >= (1 << 31) else r

    def next_int_bound(self, bound: int) -> int:
        """Java nextInt(bound): power-of-two fast path + rejection loop."""
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of 2
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java's rejection test `bits - val + (bound-1) < 0` relies on
            # int32 overflow; emulate it explicitly.
            if bits - val + (bound - 1) < (1 << 31):
                return val

    def next_long(self) -> int:
        hi = self._next(32)
        lo = self._next(32)
        v = (hi << 32) + lo
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v


def _bounded_long(rng: JavaRandom, n: int) -> int:
    """The reference's unbiased bounded nextLong: clear the sign bit, take
    a modulo, reject on wraparound (``TpchDataGenerator.java:109-120``)."""
    while True:
        bits = rng.next_long() & ((1 << 63) - 1)  # (x << 1) >>> 1 ≡ clear sign bit
        val = bits % n
        # overflow test in 64-bit signed arithmetic
        t = bits - val + (n - 1)
        if not (t >= (1 << 63)):
            return val


def part_price_cents(partkey: int) -> int:
    """``TpchDataGenerator.java:122-130``."""
    return 90000 + (partkey // 10) % 20001 + (partkey % 1000) * 100


_START = 92001
_QTY_MIN, _QTY_MAX = 1, 50
_DCNT_MAX = 10
_PKEY_MAX = 200000 * 10
_ODATE_MAX = _START + 2557 - (121 + 30) - 1  # 94405

# Q6 date window [1994-01-01, 1995-01-01) as dense day offsets:
# 1992 (366) + 1993 (365) = 731 days after 1992-01-01.
_D1994 = _START + 731
_D1995 = _D1994 + 365


def golden_q6(n_rows: int = 5_000_000) -> tuple[float, int]:
    """Run the reference's exact generation + Q6 semantics
    (``TpchQuery6.java:19-50``): returns (revenue, passing_rows).

    With the default 5M rows this is bit-identical to the standalone
    real-JDK replica: ``(1.0316412119370338E8, 95326)`` — same seed, same
    call order (quantity, discount, partkey, orderdate, shipdate per row,
    ``TpchDataGenerator.java:76-87``), same accumulation order. See the
    module docstring for why this differs from the reference's stale
    golden comment.
    """
    rng = JavaRandom(0)
    revenue = 0.0
    passing = 0
    qty_span = 1 + _QTY_MAX - _QTY_MIN
    odate_span = 1 + _ODATE_MAX - _START
    for _ in range(n_rows):
        quantity = rng.next_int_bound(qty_span) + _QTY_MIN
        discount = rng.next_int_bound(_DCNT_MAX + 1) / 100.0
        partkey = _bounded_long(rng, _PKEY_MAX) + 1
        extended_price = part_price_cents(partkey) * quantity / 100.0
        orderdate = rng.next_int_bound(odate_span) + _START
        shipdate = orderdate + rng.next_int_bound(121) + 1
        if _D1994 <= shipdate < _D1995 and 0.05 <= discount <= 0.07 and quantity < 24:
            revenue += extended_price * discount
            passing += 1
    return revenue, passing


def shipdate_string(day_value: int) -> str:
    """Dense day offset → 'YYYY-MM-DD' (≡ the reference's precomputed
    DATE_STRING_INDEX, ``TpchDataGenerator.java:148-177``)."""
    return (dt.date(1992, 1, 1) + dt.timedelta(days=day_value - _START)).isoformat()


def generate_lineitem_df(spark, n_rows: int, seed: int = 0, partitions: int = 32):
    """Distribution-faithful lineitem generator ON SPARK: same value
    distributions as the reference (not seed-sequence-identical — a
    sequential LCG cannot be partition-parallel; at 100 TB determinism
    comes from (seed, row id) hashing instead).
    """
    from pyspark.sql import functions as F

    df = spark.range(0, n_rows, numPartitions=partitions)
    h = lambda k: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(k)))  # noqa: E731
    quantity = (h(1) % (_QTY_MAX - _QTY_MIN + 1) + _QTY_MIN).alias("l_quantity")
    discount = ((h(2) % (_DCNT_MAX + 1)) / 100.0).alias("l_discount")
    partkey = (h(3) % _PKEY_MAX + 1).alias("l_partkey")
    price_cents = (
        90000 + (F.col("l_partkey") / 10).cast("long") % 20001 + (F.col("l_partkey") % 1000) * 100
    )
    orderdate = (h(4) % (_ODATE_MAX - _START + 1)).alias("_odate_off")
    shipoff = (h(5) % 121 + 1).alias("_ship_off")
    return (
        df.select("id", quantity, discount, partkey, orderdate, shipoff)
        .withColumn("l_extendedprice", price_cents * F.col("l_quantity") / 100.0)
        .withColumn(
            "l_shipdate",
            F.date_add(F.lit("1992-01-01").cast("date"), (F.col("_odate_off") + F.col("_ship_off")).cast("int")),
        )
        .select("l_quantity", "l_discount", "l_extendedprice", "l_shipdate")
    )
