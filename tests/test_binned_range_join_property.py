"""binned_range_join correctness, property-tested against the naive
nested-loop join over randomized points, intervals, and bin widths.

The fixed adversarial battery (test_rewrites_equivalence) covers the
known edges; this drives the SAME invariant — exact multiset equality
with the BETWEEN spelling for ANY inputs — through hypothesis-chosen
geometry: arbitrary signed coordinates, arbitrary (including inverted
and NULL) intervals, and bin widths from smaller-than-every-interval to
larger-than-the-whole-domain. Width must never change the ANSWER, only
the explode factor.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_coord = st.integers(min_value=-500, max_value=500)
_maybe_coord = st.one_of(st.none(), _coord)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(_coord, min_size=0, max_size=60),
    ivals=st.lists(
        st.tuples(_maybe_coord, _maybe_coord), min_size=0, max_size=15
    ),
    width=st.sampled_from([1.0, 3.0, 7.5, 64.0, 10_000.0]),
)
def test_binned_range_join_matches_nested_loop(spark_prop, points, ivals, width):
    from presto_truffle_spark.plans.rewrites import binned_range_join

    spark = spark_prop
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid long, p long"
    )
    idf = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(ivals)],
        "iid long, lo long, hi long",
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pdf.join(idf, (pdf.p >= idf.lo) & (pdf.p <= idf.hi))
        .select("pid", "iid")
        .collect()
    )
    fast = sorted(
        (r.pid, r.iid)
        for r in binned_range_join(pdf, idf, "p", "lo", "hi", width)
        .select("pid", "iid")
        .collect()
    )
    assert fast == naive


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.tuples(_coord, st.integers(0, 4)), min_size=0, max_size=60),
    ivals=st.lists(
        st.tuples(_maybe_coord, _maybe_coord, st.integers(0, 4)),
        min_size=0,
        max_size=15,
    ),
    width=st.sampled_from([1.0, 7.5, 64.0, 10_000.0]),
)
def test_keyed_binned_range_join_matches_key_only_join(
    spark_prop, points, ivals, width
):
    """The keys= variant (r7 — the DataFrame twin of BinKeyedRangeJoin)
    must reproduce the key-equi + BETWEEN join exactly for ANY geometry,
    key distribution, and width — including keys present on only one
    side and NULL/inverted intervals."""
    from presto_truffle_spark.plans.rewrites import binned_range_join

    spark = spark_prop
    pdf = spark.createDataFrame(
        [(i, p, k) for i, (p, k) in enumerate(points)],
        "pid long, p long, pk long",
    )
    idf = spark.createDataFrame(
        [(i, lo, hi, k) for i, (lo, hi, k) in enumerate(ivals)],
        "iid long, lo long, hi long, ik long",
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pdf.join(
            idf,
            (pdf.pk == idf.ik) & (pdf.p >= idf.lo) & (pdf.p <= idf.hi),
        )
        .select("pid", "iid")
        .collect()
    )
    fast = sorted(
        (r.pid, r.iid)
        for r in binned_range_join(
            pdf, idf, "p", "lo", "hi", width, keys=[("pk", "ik")]
        )
        .select("pid", "iid")
        .collect()
    )
    assert fast == naive
