"""Bounded CI slice of the random-query differential fuzzer
(tools/fuzz_differential.py — 100 seeds passed at authoring time; this
keeps a fast deterministic sample in the suite so grammar or
canonicalization regressions surface in CI)."""

from __future__ import annotations

import random
import shutil
import tempfile

import duckdb
import pytest

from tools.fuzz_differential import run_case


def test_empty_input_grouping_sets_divergence_pinned(spark):
    """FIXTURES.md r6: on EMPTY input, DuckDB emits the SQL-standard ()
    super-aggregate row for ROLLUP/CUBE while Spark emits zero rows.
    The fuzzer's grouping family relies on exactly this shape; if either
    engine changes, this pin fails before a fuzz seed silently does."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([], "k1 string, k2 string, m1 long")
    assert df.cube("k1", "k2").agg(F.count(F.lit(1))).count() == 0
    assert df.rollup("k1", "k2").agg(F.count(F.lit(1))).count() == 0
    assert df.agg(F.count(F.lit(1))).count() == 1  # plain global agg

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k1 VARCHAR, k2 VARCHAR, m1 BIGINT)")
    for sets in ("ROLLUP (k1, k2)", "CUBE (k1, k2)",
                 "GROUPING SETS ((k1), (k2), ())"):
        rows = con.execute(
            f"SELECT k1, k2, count(*) FROM t GROUP BY {sets}"
        ).fetchall()
        assert len(rows) == 1 and rows[0][2] == 0, (sets, rows)


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


def test_family_weight_table_fully_reachable():
    """r14 pin (ADVICE r13): the r13 weight table's absolute weights
    summed to ~1.285, so run_case's cumulative scan crossed 1.0 at
    fold_order and every later family — all 13 r13 additions — was
    unreachable in mixed mode. Weights are now normalized at pick
    time; this asserts every family owns a nonempty slice of [0,1)."""
    from tools.fuzz_differential import _CORE_FAMILIES, pick_family

    names = [n for n, _ in _CORE_FAMILIES]
    assert all(w is not None and w > 0 for _, w in _CORE_FAMILIES)
    n = 200_000
    hit = {pick_family(i / n) for i in range(n)}
    assert hit == set(names), sorted(set(names) - hit)


def test_date_function_divergences_pinned(spark):
    """FIXTURES.md r6 date conventions, probed cross-engine:
    1. extract(dow) is OFF BY ONE — Spark numbers Sunday=1..Saturday=7,
       DuckDB Sunday=0..Saturday=6. Never use bare dow in shared SQL.
    2. Result-TYPE divergences the fuzzer casts away: Spark's
       date_trunc returns TIMESTAMP where DuckDB returns DATE, and
       DuckDB widens DATE ± INTERVAL to TIMESTAMP where Spark keeps
       DATE — values agree, types don't (exactly the dtype-gate class).
    3. The SAFE set the fuzz grammar uses: date_trunc month/week/
       quarter/year (Monday-start weeks BOTH engines), extract year/
       month/day/quarter/week/doy, last_day (leap-day clamping), date ±
       INTERVAL DAY/MONTH under CAST, greatest/least."""
    import datetime

    # 1969-12-31 was a WEDNESDAY
    wed = "DATE '1969-12-31'"
    s_dow = spark.sql(f"SELECT extract(dow FROM {wed}) AS v").collect()[0].v
    con = duckdb.connect()
    d_dow = con.execute(f"SELECT extract(dow FROM {wed}) AS v").fetchall()[0][0]
    assert (s_dow, d_dow) == (4, 3), (s_dow, d_dow)

    s_tr = spark.sql("SELECT date_trunc('month', DATE '2024-02-29') AS v")
    assert dict(s_tr.dtypes)["v"] == "timestamp"
    assert "DATE" in str(
        con.execute(
            "DESCRIBE SELECT date_trunc('month', DATE '2024-02-29') AS v"
        ).fetchall()[0][1]
    )

    s_add = spark.sql("SELECT DATE '2024-02-29' + INTERVAL 1 DAY AS v")
    assert dict(s_add.dtypes)["v"] == "date"
    assert "TIMESTAMP" in str(
        con.execute(
            "DESCRIBE SELECT DATE '2024-02-29' + INTERVAL 1 DAY AS v"
        ).fetchall()[0][1]
    )

    # Monday-start weeks agree in both engines (safe-set membership)
    for d, monday in [("2024-12-30", "2024-12-30"), ("2025-01-01", "2024-12-30")]:
        sv = spark.sql(
            f"SELECT CAST(date_trunc('week', DATE '{d}') AS DATE) AS v"
        ).collect()[0].v
        dv = con.execute(
            f"SELECT CAST(date_trunc('week', DATE '{d}') AS DATE) AS v"
        ).fetchall()[0][0]
        assert sv == dv == datetime.date.fromisoformat(monday)


def test_string_literal_backslash_divergence_pinned(spark):
    """FIXTURES.md r6: Spark SQL processes C-style escapes inside string
    literals by default ('a\\c' is a 3-char string) while DuckDB is
    SQL-standard (the same text is 4 chars) — identical shared SQL text
    denotes DIFFERENT strings the moment a backslash appears. The LIKE
    fuzz family therefore builds patterns backslash-free and escapes
    metacharacters with ESCAPE '!' (no escape meaning in either
    engine's literal syntax)."""
    s_len = spark.sql(r"SELECT length('a\\c') AS n").collect()[0].n
    con = duckdb.connect()
    d_len = con.execute(r"SELECT length('a\\c') AS n").fetchall()[0][0]
    assert (s_len, d_len) == (3, 4), (s_len, d_len)
    # the '!' escape spelling agrees exactly
    q = "SELECT count(*) AS n FROM (VALUES ('a%b'), ('axb'), ('a!b')) "\
        "AS t(s) WHERE s LIKE 'a!%b' ESCAPE '!'"
    assert spark.sql(q).collect()[0].n == con.execute(q).fetchall()[0][0] == 1


def test_regex_function_divergences_pinned(spark):
    """FIXTURES.md r6 regex conventions, probed cross-engine:
    1. regexp_replace replaces ALL matches in Spark but only the FIRST
       in DuckDB — DuckDB needs the explicit 'g' flag for the same
       semantics, so the function is never shared verbatim.
    2. split() is regex-delimited in Spark, LITERAL in DuckDB
       (string_split) — never share split over a pattern.
    3. RLIKE and regexp_count don't exist in DuckDB.
    4. regexp_extract with bracket classes agrees exactly ('' on
       no-match, NULL propagation) and is the shared-verbatim citizen;
       Spark's regexp_extract_all requires an explicit group 0 when the
       pattern has no capture group."""
    con = duckdb.connect()
    s_all = spark.sql(
        "SELECT regexp_replace('a1b2c3', '[0-9]', '#') AS v"
    ).collect()[0].v
    d_first = con.execute(
        "SELECT regexp_replace('a1b2c3', '[0-9]', '#') AS v"
    ).fetchall()[0][0]
    d_glob = con.execute(
        "SELECT regexp_replace('a1b2c3', '[0-9]', '#', 'g') AS v"
    ).fetchall()[0][0]
    assert (s_all, d_first, d_glob) == ("a#b#c#", "a#b2c3", "a#b#c#")

    s_split = spark.sql("SELECT split('a1b2', '[0-9]') AS v").collect()[0].v
    d_split = con.execute("SELECT split('a1b2', '[0-9]') AS v").fetchall()[0][0]
    assert s_split == ["a", "b", ""] and d_split == ["a1b2"]

    s_x = spark.sql(
        "SELECT regexp_extract('abc123', '([0-9]+)', 1) AS v"
    ).collect()[0].v
    d_x = con.execute(
        "SELECT regexp_extract('abc123', '([0-9]+)', 1) AS v"
    ).fetchall()[0][0]
    assert s_x == d_x == "123"

    # point 3 pinned by ABSENCE: if a DuckDB upgrade grows regexp_count
    # or RLIKE, this fails and the convention must be re-probed (same
    # or different semantics both matter)
    for bad in (
        "SELECT regexp_count('a1b2', '[0-9]')",
        "SELECT 'a1' RLIKE '[0-9]'",
    ):
        try:
            con.execute(bad)
            raise AssertionError(f"DuckDB now accepts: {bad}")
        except duckdb.Error:
            pass
    # ...and the documented substitutes agree with Spark's spelling
    s_n = spark.sql(
        "SELECT CAST(regexp_count('a1b2c3', '[0-9]') AS BIGINT) AS v"
    ).collect()[0].v
    d_n = con.execute(
        "SELECT CAST(len(regexp_extract_all('a1b2c3', '[0-9]')) AS BIGINT) AS v"
    ).fetchall()[0][0]
    assert s_n == d_n == 3


def test_empty_array_serialization_divergence_pinned(spark):
    """FIXTURES.md r6: serializing an EMPTY array yields '' from
    Spark's array_join but NULL from DuckDB's array_to_string — any
    oracle stringifying a possibly-empty array must coalesce the
    DuckDB side (found live by the HOF fuzz family, seed 72000/63)."""
    sv = spark.sql(
        "SELECT array_join(filter(array(1), x -> x > 5), ',') AS v"
    ).collect()[0].v
    con = duckdb.connect()
    dv = con.execute(
        "SELECT array_to_string(list_filter([1], x -> x > 5), ',') AS v"
    ).fetchall()[0][0]
    assert sv == "" and dv is None
    dv2 = con.execute(
        "SELECT coalesce(array_to_string(list_filter([1], x -> x > 5),"
        " ','), '') AS v"
    ).fetchall()[0][0]
    assert dv2 == ""


def test_map_extraction_divergence_pinned(spark):
    """FIXTURES.md r7: DuckDB map extraction returns a ONE-ELEMENT LIST
    where Spark returns the value — the DuckDB side of any shared map
    lookup appends [1], which also aligns missing-key NULLs (found live
    on landing the map-HOF fuzz family)."""
    sv = spark.sql("SELECT map('a', 7)['a'] AS v").collect()[0].v
    assert sv == 7
    con = duckdb.connect()
    raw = con.execute("SELECT map(['a'], [7])['a'] AS v").fetchall()[0][0]
    assert raw == [7], raw  # the divergence: a list, not 7
    fixed = con.execute("SELECT map(['a'], [7])['a'][1] AS v").fetchall()[0][0]
    assert fixed == 7
    # missing key: [][1] = NULL on the DuckDB side = Spark's NULL
    s_missing = spark.sql("SELECT map('a', 7)['z'] AS v").collect()[0].v
    d_missing = con.execute(
        "SELECT map(['a'], [7])['z'][1] AS v"
    ).fetchall()[0][0]
    assert s_missing is None and d_missing is None


def test_month_interval_spelling_divergences_pinned(spark):
    """FIXTURES.md r7: DuckDB rejects negative INTERVAL literals and has
    no add_months — to_months(k) is the portable spelling; the CLAMPING
    semantics themselves agree (Jan 31 + 1 month = leap-aware Feb end)."""
    import datetime

    con = duckdb.connect()
    with pytest.raises(duckdb.Error):
        con.execute("SELECT DATE '2024-03-31' + INTERVAL -1 MONTH")
    with pytest.raises(duckdb.Error):
        con.execute("SELECT add_months(DATE '2024-03-31', -1)")
    for y, mo, day, k in [
        (2024, 1, 31, 1),   # leap Feb 29
        (2023, 1, 31, 1),   # non-leap Feb 28
        (2100, 1, 31, 1),   # century non-leap Feb 28
        (2024, 3, 31, -1),  # backward into leap Feb
        (2024, 10, 31, -4), # backward across months
        (2024, 2, 29, 12),  # leap day + 1 year -> Feb 28
    ]:
        s = spark.sql(
            f"SELECT add_months(make_date({y}, {mo}, {day}), {k}) AS d"
        ).collect()[0].d
        s2 = spark.sql(
            f"SELECT CAST(make_date({y}, {mo}, {day})"
            f" + INTERVAL {k} MONTH AS DATE) AS d"
        ).collect()[0].d
        d = con.execute(
            f"SELECT CAST(make_date({y}, {mo}, {day})"
            f" + to_months({k}) AS DATE) AS d"
        ).fetchall()[0][0]
        assert s == s2 == d, (y, mo, day, k, s, s2, d)
        assert isinstance(d, datetime.date)


def test_array_setop_null_divergence_pinned(spark):
    """FIXTURES.md r7: DuckDB's list_distinct / list_intersect DROP NULL
    elements; Spark's array_distinct / array_intersect keep NULL as a
    distinct value. Any shared oracle running set ops over a
    possibly-NULL-bearing array must coalesce elements non-null first
    (the array-setop fuzz family does exactly that)."""
    sv = spark.sql(
        "SELECT array_sort(array_distinct(array(1, 2, 2, CAST(NULL AS INT)))) AS v"
    ).collect()[0].v
    assert sv == [1, 2, None]
    con = duckdb.connect()
    dv = con.execute(
        "SELECT list_sort(list_distinct([1, 2, 2, NULL])) AS v"
    ).fetchall()[0][0]
    assert dv == [1, 2]  # the divergence: NULL dropped
    si = spark.sql(
        "SELECT array_sort(array_intersect(array(1, NULL, 2), array(NULL, 2, 3))) AS v"
    ).collect()[0].v
    di = con.execute(
        "SELECT list_sort(list_intersect([1, NULL, 2], [NULL, 2, 3])) AS v"
    ).fetchall()[0][0]
    assert si == [2, None] and di == [2]


def test_try_cast_parsing_divergences_pinned(spark):
    """FIXTURES.md r7: try_cast(string AS BIGINT) parsing classes that
    DIVERGE — DuckDB ROUNDS decimal strings, parses hex 0x literals and
    scientific notation; Spark yields NULL for all three. The agreeing
    classes (sign, surrounding whitespace, garbage, empty, int64
    overflow) are what the try_cast fuzz family draws from."""
    con = duckdb.connect()
    for s, duck_val in [("1.5", 2), ("0x1A", 26), ("1e3", 1000)]:
        sv = spark.sql(f"SELECT try_cast('{s}' AS BIGINT) AS v").collect()[0].v
        dv = con.execute(f"SELECT try_cast('{s}' AS BIGINT) AS v").fetchall()[0][0]
        assert sv is None and dv == duck_val, (s, sv, dv)
    for s in [" 12 ", "+12", "-7", "", "abc", "12a", "--5",
              str(2**63)]:  # agreeing classes
        sv = spark.sql(f"SELECT try_cast('{s}' AS BIGINT) AS v").collect()[0].v
        dv = con.execute(f"SELECT try_cast('{s}' AS BIGINT) AS v").fetchall()[0][0]
        assert sv == dv, (s, sv, dv)


def test_explode_position_base_divergence_pinned(spark):
    """FIXTURES.md r7: positional array expansion is 0-BASED in Spark's
    posexplode but 1-BASED in DuckDB's generate_subscripts — shared
    oracles must offset one side (the explode fuzz family spells
    `pos + 1` on the Spark side). Inner/outer multiplicity semantics
    (empty array and NULL array: row dropped / null-extended) agree."""
    s = spark.sql(
        "SELECT pos, u FROM VALUES ('a', array(10, 20)) t(k, arr) "
        "LATERAL VIEW posexplode(arr) x AS pos, u"
    ).collect()
    assert [tuple(r) for r in s] == [(0, 10), (1, 20)]
    con = duckdb.connect()
    d = con.execute(
        "SELECT generate_subscripts(arr, 1) AS pos, unnest(arr) AS u "
        "FROM (VALUES ('a', [10, 20])) t(k, arr)"
    ).fetchall()
    assert d == [(1, 10), (2, 20)]
    # multiplicity agreement: inner drops empty/NULL, outer null-extends
    si = spark.sql(
        "SELECT k, u FROM VALUES ('a', array(1)), ('b', array()), "
        "('c', NULL) t(k, arr) LATERAL VIEW OUTER explode(arr) x AS u"
    ).collect()
    di = con.execute(
        "SELECT k, u FROM (VALUES ('a', [1]), ('b', []), ('c', NULL)) "
        "t(k, arr) LEFT JOIN UNNEST(arr) AS x(u) ON true"
    ).fetchall()
    assert sorted(map(tuple, si)) == sorted(di) == [
        ("a", 1), ("b", None), ("c", None)
    ]


def test_window_exclude_parse_divergence_pinned(spark):
    """FIXTURES.md r9: Spark does not parse the SQL-standard window frame
    EXCLUDE clause at all; DuckDB implements it natively, returning NULL
    sums (count 0) on a fully-excluded frame. The fuzzer's EXCLUDE
    family therefore runs a compositional frame-minus-peer-group rewrite
    on the Spark side — if Spark ever learns EXCLUDE, this pin fails and
    the family should switch to identical SQL text."""
    from pyspark.errors import ParseException

    with pytest.raises(ParseException):
        spark.sql(
            "SELECT sum(id) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING "
            "AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM range(3)"
        ).collect()
    con = duckdb.connect()
    rows = con.execute(
        "SELECT r, sum(v) OVER (ORDER BY r RANGE BETWEEN 0 PRECEDING AND "
        "0 FOLLOWING EXCLUDE GROUP) s, count(*) OVER (ORDER BY r RANGE "
        "BETWEEN 0 PRECEDING AND 0 FOLLOWING EXCLUDE GROUP) c "
        "FROM (SELECT range r, range * 2 v FROM range(2)) ORDER BY r"
    ).fetchall()
    assert rows == [(0, None, 0), (1, None, 0)]


def test_collation_distinct_divergence_pinned(spark):
    """FIXTURES.md r9: a COLLATE inside count(DISTINCT ...) participates
    in distinctness on Spark (UTF8_LCASE folds 'a'/'A') but is silently
    IGNORED by DuckDB's NOCASE there — the collation fuzz family spells
    the DuckDB side with lower() instead. Plain ORDER BY ... COLLATE
    agrees for the ASCII alphabet (probed r9, ordering shape in-family)."""
    s = spark.sql(
        "SELECT count(DISTINCT c COLLATE UTF8_LCASE) AS n "
        "FROM VALUES ('a'), ('A'), ('b'), ('B') t(c)"
    ).collect()
    assert s[0][0] == 2
    con = duckdb.connect()
    d = con.execute(
        "SELECT count(DISTINCT c COLLATE NOCASE) "
        "FROM (VALUES ('a'), ('A'), ('b'), ('B')) t(c)"
    ).fetchall()
    assert d[0][0] == 4  # collation ignored inside the aggregate
    d2 = con.execute(
        "SELECT count(DISTINCT lower(c)) "
        "FROM (VALUES ('a'), ('A'), ('b'), ('B')) t(c)"
    ).fetchall()
    assert d2[0][0] == 2  # the spelling shared oracles must use


def test_qualify_and_distinct_on_divergence_pinned(spark):
    """FIXTURES.md r9: Spark parses neither QUALIFY nor DISTINCT ON;
    DuckDB runs both. The qualify fuzz family spells the Spark side as
    the standard windowed-subquery expansion."""
    from pyspark.errors import ParseException
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises((ParseException, AnalysisException)):
        spark.sql(
            "SELECT id, row_number() OVER (ORDER BY id) rn "
            "FROM range(3) QUALIFY rn = 1"
        ).collect()
    with pytest.raises((ParseException, AnalysisException)):
        spark.sql(
            "SELECT DISTINCT ON (id % 2) id FROM range(4) ORDER BY id % 2, id"
        ).collect()
    con = duckdb.connect()
    assert con.execute(
        "SELECT id, row_number() OVER (ORDER BY id) rn FROM range(3) t(id) "
        "QUALIFY rn = 1"
    ).fetchall() == [(0, 1)]
    assert con.execute(
        "SELECT DISTINCT ON (id % 2) id FROM range(4) t(id) ORDER BY id % 2, id"
    ).fetchall() == [(0,), (1,)]


def test_window_aggregate_filter_divergence_pinned(spark):
    """FIXTURES.md r9: agg(x) FILTER (WHERE p) OVER (...) is an
    AnalysisException in Spark ('not supported yet'); DuckDB evaluates
    it natively. The fuzz family uses the CASE-WHEN rewrite on the Spark
    side — exact for null-skipping aggregates."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT sum(id) FILTER (WHERE id > 0) OVER (ORDER BY id) "
            "FROM range(3)"
        ).collect()
    con = duckdb.connect()
    got = con.execute(
        "SELECT sum(id) FILTER (WHERE id > 0) OVER (ORDER BY id) "
        "FROM range(3) t(id) ORDER BY id"
    ).fetchall()
    assert got == [(None,), (1,), (3,)]
    # the rewrite both sides of the family rely on, checked in Spark
    s = spark.sql(
        "SELECT sum(CASE WHEN id > 0 THEN id END) OVER (ORDER BY id) AS v "
        "FROM range(3) ORDER BY id"
    ).collect()
    assert [r.v for r in s] == [None, 1, 3]


def test_order_by_all_null_placement_divergence_pinned(spark):
    """FIXTURES.md r9: bare ORDER BY ALL places NULLs differently (Spark
    ASC defaults NULLS FIRST, DuckDB NULLS LAST); the explicit NULLS
    FIRST/LAST forms are shared syntax and agree — the fuzz family
    always spells them."""
    s = spark.sql(
        "SELECT c FROM VALUES ('a'), (NULL), ('b') t(c) ORDER BY ALL"
    ).collect()
    assert [r.c for r in s] == [None, "a", "b"]
    con = duckdb.connect()
    d = con.execute(
        "SELECT c FROM (VALUES ('a'), (NULL), ('b')) t(c) ORDER BY ALL"
    ).fetchall()
    assert [r[0] for r in d] == ["a", "b", None]
    # explicit placement: identical
    s2 = spark.sql(
        "SELECT c FROM VALUES ('a'), (NULL), ('b') t(c) "
        "ORDER BY ALL NULLS LAST"
    ).collect()
    d2 = con.execute(
        "SELECT c FROM (VALUES ('a'), (NULL), ('b')) t(c) "
        "ORDER BY ALL NULLS LAST"
    ).fetchall()
    assert [r.c for r in s2] == [r[0] for r in d2] == ["a", "b", None]


def test_try_arithmetic_overflow_divergence_pinned(spark):
    """FIXTURES.md r9: division/modulo by zero yields NULL on both
    engines (Spark via try_divide/try_mod, DuckDB natively) — but int64
    OVERFLOW splits them: Spark's try_add/try_multiply return NULL,
    DuckDB's +/* RAISE unless explicitly promoted to HUGEINT. The
    try-arith fuzz family therefore keeps operands in range; this pin
    guards the boundary behavior."""
    s = spark.sql(
        "SELECT try_add(9223372036854775807, 1) a, "
        "try_multiply(9223372036854775807, 2) b, try_divide(1, 0) c"
    ).collect()[0]
    assert s.a is None and s.b is None and s.c is None
    con = duckdb.connect()
    assert con.execute("SELECT 1 / 0").fetchone()[0] is None
    assert con.execute("SELECT 1 % 0").fetchone()[0] is None
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute("SELECT 9223372036854775807 + CAST(1 AS BIGINT)").fetchall()
    # the explicit promotion DuckDB oracles must spell if overflow is real
    assert con.execute(
        "SELECT CAST(9223372036854775807 AS HUGEINT) + 1"
    ).fetchone()[0] == 9223372036854775808


def test_ordered_agg_spelling_divergence_pinned(spark):
    """FIXTURES.md r9: ordered aggregation is mirrored syntax — Spark
    rejects ORDER BY inside array_agg/string_agg but accepts SQL:2016
    listagg(...) WITHIN GROUP; DuckDB rejects listagg but accepts the
    in-aggregate ORDER BY. Same semantics either way (probed, fuzzed)."""
    from pyspark.errors import ParseException

    with pytest.raises(ParseException):
        spark.sql(
            "SELECT array_agg(x ORDER BY x) FROM VALUES (1), (2) t(x)"
        ).collect()
    got = spark.sql(
        "SELECT listagg(CAST(x AS STRING), ',') WITHIN GROUP (ORDER BY x DESC)"
        " FROM VALUES (1), (3), (2) t(x)"
    ).collect()[0][0]
    assert got == "3,2,1"
    con = duckdb.connect()
    with pytest.raises(duckdb.ParserException):
        con.execute(
            "SELECT listagg(x::VARCHAR, ',') WITHIN GROUP (ORDER BY x) "
            "FROM (VALUES (1)) t(x)"
        ).fetchall()
    assert con.execute(
        "SELECT string_agg(x::VARCHAR, ',' ORDER BY x DESC) "
        "FROM (VALUES (1), (3), (2)) t(x)"
    ).fetchone()[0] == "3,2,1"


def test_pivot_count_and_union_by_name_divergences_pinned(spark):
    """FIXTURES.md r9: (a) a COUNT pivot over an absent (key, value)
    combination is NULL in Spark but 0 in DuckDB (found live by a fuzz
    seed) — shared PIVOT text must stick to sum/min/max or coalesce;
    (b) UNION BY NAME is SQL in DuckDB but DataFrame-only in Spark."""
    from pyspark.errors import ParseException

    s = spark.sql(
        "SELECT * FROM VALUES ('a', 'x', 1) t(k, c, v) "
        "PIVOT (count(v) FOR c IN ('x', 'y'))"
    ).collect()[0]
    assert s.x == 1 and s.y is None
    con = duckdb.connect()
    d = con.execute(
        "SELECT * FROM (SELECT 'a' k, 'x' c, 1 v) "
        "PIVOT (count(v) FOR c IN ('x', 'y'))"
    ).fetchall()[0]
    assert d[1] == 1 and d[2] == 0  # DuckDB: 0, not NULL
    # sum agrees: absent cell NULL on both
    s2 = spark.sql(
        "SELECT * FROM VALUES ('a', 'x', 1) t(k, c, v) "
        "PIVOT (sum(v) FOR c IN ('x', 'y'))"
    ).collect()[0]
    d2 = con.execute(
        "SELECT * FROM (SELECT 'a' k, 'x' c, 1 v) "
        "PIVOT (sum(v) FOR c IN ('x', 'y'))"
    ).fetchall()[0]
    assert s2.y is None and d2[2] is None

    with pytest.raises(ParseException):
        spark.sql("SELECT 1 a UNION ALL BY NAME SELECT 2 a").collect()
    assert con.execute(
        "SELECT 1 a, 2 b UNION ALL BY NAME SELECT 3 b, 4 a ORDER BY a"
    ).fetchall() == [(1, 2), (4, 3)]


def test_groups_frame_mode_unimplemented_both_engines_pinned(spark):
    """FIXTURES.md r9: the SQL-standard GROUPS frame mode is implemented
    by NEITHER engine — Spark fails to parse it, DuckDB raises a
    ParserException ("GROUPS mode ... not implemented yet"). The fuzzer's
    GROUPS family therefore runs the dense_rank()+RANGE compositional
    rewrite as IDENTICAL SQL on both engines (the rewrite is an exact
    identity: peer groups are numbered consecutively by dense_rank). If
    either engine learns GROUPS, this pin fails and the family should
    switch that side to native syntax."""
    from pyspark.errors import ParseException

    with pytest.raises(ParseException):
        spark.sql(
            "SELECT sum(id) OVER (ORDER BY id GROUPS BETWEEN 1 PRECEDING "
            "AND 1 FOLLOWING) FROM range(3)"
        ).collect()
    con = duckdb.connect()
    with pytest.raises(duckdb.ParserException):
        con.execute(
            "SELECT sum(r) OVER (ORDER BY r GROUPS BETWEEN 1 PRECEDING "
            "AND 1 FOLLOWING) FROM (SELECT range r FROM range(3))"
        )


def test_fuzz_limit_offset_and_groups_frame_sample(spark):
    """Deterministic CI slice of the two r9-late families: LIMIT/OFFSET
    paging (both SQL and .offset() DataFrame spellings) and the GROUPS
    dense_rank+RANGE rewrite differential."""
    from tools.fuzz_differential import (
        run_groups_frame_case,
        run_limit_offset_case,
    )

    con = duckdb.connect()
    tmp = tempfile.mkdtemp(prefix="fuzz_ci_lo_")
    try:
        failures = []
        for i in range(4):
            err = run_limit_offset_case(
                spark, con, random.Random(7000 + i), tmp, i
            )
            if err:
                failures.append(("limit_offset", i, err))
            err = run_groups_frame_case(
                spark, con, random.Random(8000 + i), tmp, 100 + i
            )
            if err:
                failures.append(("groups_frame", i, err))
        assert failures == []
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_fuzz_lateral_sample(spark):
    """Deterministic CI slice of the correlated-LATERAL family (shared
    SQL text both engines; 30 seeds passed at authoring time)."""
    from tools.fuzz_differential import run_lateral_case

    con = duckdb.connect()
    tmp = tempfile.mkdtemp(prefix="fuzz_ci_lat_")
    try:
        failures = []
        for i in range(4):
            err = run_lateral_case(spark, con, random.Random(9900 + i), tmp, i)
            if err:
                failures.append((i, err))
        assert failures == []
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_array_index_conventions_pinned(spark):
    """FIXTURES.md r9: array indexing parity — OOB yields NULL on both
    (Spark try_element_at(a, 5) == DuckDB a[5]), negative indexes count
    from the end on both, slice clamps past-the-end on both. The ONE
    asymmetry: index ZERO — Spark's try_element_at STILL raises
    INVALID_INDEX_OF_ZERO (the try_ guards out-of-range, not
    zero), while DuckDB a[0] is NULL. Shared oracles must never
    generate index 0."""
    from pyspark.errors import PySparkValueError, PySparkRuntimeError

    assert spark.sql("SELECT try_element_at(array(1,2), 5) v").collect()[0].v is None
    assert spark.sql("SELECT element_at(array(1,2), -1) v").collect()[0].v == 2
    assert spark.sql("SELECT slice(array(1,2,3), 2, 99) v").collect()[0].v == [2, 3]
    with pytest.raises(Exception) as ei:
        spark.sql("SELECT try_element_at(array(1,2), 0) v").collect()
    assert "INVALID_INDEX_OF_ZERO" in str(ei.value)
    con = duckdb.connect()
    assert con.execute("SELECT ([1,2])[5]").fetchone()[0] is None
    assert con.execute("SELECT ([1,2])[0]").fetchone()[0] is None  # NULL, no error
    assert con.execute("SELECT ([1,2])[-1]").fetchone()[0] == 2
    assert con.execute("SELECT list_slice([1,2,3], 2, 99)").fetchone()[0] == [2, 3]


def test_moment_bias_convention_divergence_pinned(spark):
    """FIXTURES.md r9: Spark's skewness/kurtosis built-ins compute
    POPULATION moments — Spark kurtosis equals DuckDB's kurtosis_pop —
    while DuckDB's default skewness/kurtosis apply the sample bias
    correction. Shared oracles must derive moments from raw power sums
    (agg_higher_moments) or match _pop variants explicitly."""
    import math

    vals = [1.0, 2.0, 2.5, 7.0, 9.5]
    r = spark.sql(
        "SELECT skewness(v) s, kurtosis(v) k FROM VALUES (1.0),(2.0),(2.5),(7.0),(9.5) t(v)"
    ).collect()[0]
    con = duckdb.connect()
    d_kpop = con.execute(
        "SELECT kurtosis_pop(v) FROM (VALUES (1.0),(2.0),(2.5),(7.0),(9.5)) t(v)"
    ).fetchone()[0]
    d_k = con.execute(
        "SELECT kurtosis(v) FROM (VALUES (1.0),(2.0),(2.5),(7.0),(9.5)) t(v)"
    ).fetchone()[0]
    assert math.isclose(r.k, d_kpop, rel_tol=1e-9)  # population == _pop
    assert not math.isclose(r.k, d_k, rel_tol=1e-3)  # default diverges
    # and the population values recompute from raw moments
    n = len(vals)
    m1 = sum(vals) / n
    m2 = sum((x - m1) ** 2 for x in vals) / n
    m3 = sum((x - m1) ** 3 for x in vals) / n
    assert math.isclose(r.s, m3 / m2 ** 1.5, rel_tol=1e-9)


def test_implicit_coercion_divergences_pinned(spark):
    """FIXTURES.md r9: implicit-coercion lattice differences probed.
    (a) string-vs-int comparison: BOTH engines agree on integer-shaped
    strings ('5' = 5, '05' = 5 are TRUE), but Spark coerces the string
    to the INTEGER side and RAISES CAST_INVALID_INPUT on '5.0' = 5,
    where DuckDB widens both to double (TRUE). (b) 1 = true: Spark
    rejects the int/boolean comparison at analysis; DuckDB accepts.
    (c) greatest(1, 2.5, '3'): Spark requires one common type and
    rejects; DuckDB coerces to double. Shared oracle SQL must cast
    explicitly at every cross-type comparison."""
    assert spark.sql("SELECT '5' = 5 v").collect()[0].v is True
    assert spark.sql("SELECT '05' = 5 v").collect()[0].v is True
    with pytest.raises(Exception) as e1:
        spark.sql("SELECT '5.0' = 5 v").collect()
    assert "CAST_INVALID_INPUT" in str(e1.value)
    with pytest.raises(Exception) as e2:
        spark.sql("SELECT 1 = true v").collect()
    assert "DATATYPE_MISMATCH" in str(e2.value)
    with pytest.raises(Exception) as e3:
        spark.sql("SELECT greatest(1, 2.5, '3') v").collect()
    assert "DATATYPE_MISMATCH" in str(e3.value)
    con = duckdb.connect()
    assert con.execute("SELECT '5.0' = 5").fetchone()[0] is True
    assert con.execute("SELECT 1 = true").fetchone()[0] is True
    assert con.execute("SELECT greatest(1, 2.5, '3')").fetchone()[0] == 3.0
    # shared ground the families rely on: || stringifies, / is true
    # division, % keeps the dividend sign — all agree
    assert spark.sql("SELECT '1' || 2 v").collect()[0].v == "12"
    assert con.execute("SELECT '1' || 2").fetchone()[0] == "12"
    assert spark.sql("SELECT 5 / 2 v").collect()[0].v == 2.5
    assert spark.sql("SELECT -7 % 2 v").collect()[0].v == -1
    assert con.execute("SELECT -7 % 2").fetchone()[0] == -1


def test_regex_backslash_escape_divergence_pinned(spark):
    """FIXTURES.md r9 continuation: the SAME SQL text containing a
    regex backslash parses differently — Spark's string literal
    consumes one escape level before the regex compiler sees the
    pattern, DuckDB's standard-SQL string does not. For the text
    '([a-z])\\\\.' over 'a-b.c d', Spark compiles ([a-z])\\. (letter
    before a literal dot -> 'b'... group semantics differ) while DuckDB
    compiles the two-character escape -> a different match. The fuzz
    family (run_regex_case) therefore EXCLUDES backslashes; the
    no-backslash subset (classes, quantifiers, bounded repetition,
    non-capturing alternation) agrees — spot-checked here."""
    sql = "SELECT regexp_extract('a-b.c d', '([a-z])\\\\.', 1) v"
    sp = spark.sql(sql).collect()[0].v
    du = duckdb.connect().execute(sql).fetchone()[0]
    assert sp != du, "backslash escape-level fork disappeared — re-enable in fuzzer"
    # the safe subset agrees:
    for pat, s in [
        ("([0-9]+)", "abc123def"),
        ("[a-z]+([0-9]+)", "abc123def"),
        ("([A-Za-z]{2,4})", "abAB12"),
        ("(?:ab|ba)(x|yy)", "abyyz"),
    ]:
        q = f"SELECT regexp_extract('{s}', '{pat}', 1) v"
        assert (
            spark.sql(q).collect()[0].v
            == duckdb.connect().execute(q).fetchone()[0]
        ), (pat, s)


def test_regexp_replace_first_vs_all_divergence_pinned(spark):
    """FIXTURES.md r9 continuation: regexp_replace over the SAME SQL
    text replaces ALL matches in Spark but only the FIRST in DuckDB
    ('aaa','a','b' -> 'bbb' vs 'baa'), and the two engines' 4th
    argument is DIFFERENT TYPES: DuckDB takes an options string ('g'
    -> replace all) where Spark takes the integer start position — so
    the 4-arg call cannot even be spelled shared (Spark raises
    CAST_INVALID_INPUT on 'g'). Shared oracles must avoid
    regexp_replace entirely or guarantee at most one match per input
    (text_pii_redact's discipline)."""
    sql = "SELECT regexp_replace('aaa', 'a', 'b') v"
    assert spark.sql(sql).collect()[0].v == "bbb"
    con = duckdb.connect()
    assert con.execute(sql).fetchone()[0] == "baa"
    assert con.execute(
        "SELECT regexp_replace('aaa', 'a', 'b', 'g')"
    ).fetchone()[0] == "bbb"
    with pytest.raises(Exception) as e:
        spark.sql("SELECT regexp_replace('aaa', 'a', 'b', 'g') v").collect()
    assert "CAST_INVALID_INPUT" in str(e.value)


def test_daytime_interval_diff_semantics_pinned(spark):
    """Pin the whole-unit timestamp-difference fork: Spark timestampdiff
    counts COMPLETE units; DuckDB date_sub matches it, DuckDB date_diff
    counts boundary crossings and does NOT (FIXTURES.md r9)."""
    import duckdb

    s = spark.sql(
        "SELECT timestampdiff(HOUR, TIMESTAMP_NTZ '2020-01-01 10:59:00', "
        "TIMESTAMP_NTZ '2020-01-01 11:58:59') AS d"
    ).collect()[0].d
    con = duckdb.connect()
    d_sub, d_diff = con.execute(
        "SELECT date_sub('hour', TIMESTAMP '2020-01-01 10:59:00', "
        "TIMESTAMP '2020-01-01 11:58:59'), "
        "date_diff('hour', TIMESTAMP '2020-01-01 10:59:00', "
        "TIMESTAMP '2020-01-01 11:58:59')"
    ).fetchone()
    assert s == 0 and d_sub == 0, (s, d_sub)
    assert d_diff == 1, d_diff  # boundary crossing — the divergent twin


def test_string_edge_divergences_pinned(spark):
    """Pin the six string-edge forks the r9 string family probed (plus
    the NULL-propagation fork its first live run caught) — FIXTURES.md:
      * substring start 0: Spark clamps to position 1 keeping the full
        requested length; DuckDB spends part of the length reaching 1.
      * left/right negative n: DuckDB drops |n| from the other end;
        Spark returns ''.
      * split_part: index 0 raises on Spark / '' on DuckDB; empty
        delimiter splits per-char on DuckDB / '' on Spark; and DuckDB
        is NOT null-propagating (NULL string -> '', NULL delim -> the
        whole input) where Spark yields NULL.
      * lpad with empty pad raises on DuckDB; Spark truncates or
        returns the input unchanged.
    """
    import duckdb

    con = duckdb.connect()

    def sp(e):
        return spark.sql(f"SELECT {e} AS v").collect()[0].v

    def dk(e):
        return con.execute(f"SELECT {e}").fetchone()[0]

    assert sp("substring('hello', 0, 3)") == "hel"
    assert dk("substring('hello', 0, 3)") == "he"
    assert sp("left('hello', -2)") == "" and sp("right('hello', -2)") == ""
    assert dk("left('hello', -2)") == "hel"
    assert dk("right('hello', -2)") == "llo"
    try:
        sp("split_part('a,b', ',', 0)")
        raise AssertionError("Spark split_part index 0 must raise")
    except Exception as ex:
        assert "INVALID_INDEX_OF_ZERO" in str(ex)
    assert dk("split_part('a,b', ',', 0)") == ""
    assert sp("split_part('a,b', '', 2)") == ""
    assert dk("split_part('a,b', '', 2)") == ","
    assert sp("split_part(CAST(NULL AS STRING), ',', 1)") is None
    assert dk("split_part(NULL, ',', 1)") == ""
    assert dk("split_part('a,b', NULL, 1)") == "a,b"
    assert sp("lpad('ab', 5, '')") == "ab"
    try:
        dk("lpad('ab', 5, '')")
        raise AssertionError("DuckDB lpad empty pad must raise")
    except AssertionError:
        raise
    except Exception:
        pass


def test_where_alias_visibility_divergence_pinned(spark):
    """Pin the alias-in-WHERE fork (FIXTURES.md r9): DuckDB resolves a
    SELECT-list alias referenced from WHERE; Spark raises
    UNRESOLVED_COLUMN (ANSI scoping — WHERE evaluates before the
    projection). GROUP BY / HAVING / ORDER BY aliases, lateral alias
    reuse, and ordinal references agree (fuzzed, 40 seeds)."""
    import duckdb

    con = duckdb.connect()
    assert con.execute(
        "SELECT id * 2 AS e FROM range(3) t(id) WHERE e > 2"
    ).fetchall() == [(4,)]
    try:
        spark.sql("SELECT id * 2 AS e FROM range(3) WHERE e > 2").collect()
        raise AssertionError("Spark must reject alias in WHERE")
    except AssertionError:
        raise
    except Exception as ex:
        assert "UNRESOLVED_COLUMN" in str(ex)


def test_month_diff_clamped_end_divergence_pinned(spark):
    """Pin the month-unit timestamp DIFF fork (FIXTURES.md r9): for the
    clamped month-end pair Jan-31 -> Feb-29, Spark timestampdiff(MONTH)
    says 0 complete months (ChronoUnit.MONTHS never treats a clamped
    landing as completing the month) while DuckDB date_sub('month')
    says 1 (clamp-aware: Jan-31 + 1 month == Feb-29). Month ADDS agree
    exactly, time-of-day preserved (ts-month fuzz family, 40 seeds)."""
    import duckdb

    s = spark.sql(
        "SELECT timestampdiff(MONTH, TIMESTAMP_NTZ '2024-01-31 00:00:00', "
        "TIMESTAMP_NTZ '2024-02-29 00:00:00') AS d"
    ).collect()[0].d
    d = duckdb.connect().execute(
        "SELECT date_sub('month', TIMESTAMP '2024-01-31 00:00:00', "
        "TIMESTAMP '2024-02-29 00:00:00')"
    ).fetchone()[0]
    assert s == 0 and d == 1, (s, d)


def test_replacement_backref_spelling_divergence_pinned(spark):
    """FIXTURES.md r10: regex replacement backreferences spell $1 on
    Spark (java.util.regex) but \\1 on DuckDB (RE2); DuckDB passes '$1'
    through LITERALLY rather than erroring, so the fork is silent. The
    r10 regexp_replace fuzz family mirrors the replacement spelling."""
    s = spark.sql(
        "SELECT regexp_replace('ab12cd', '([0-9]+)', '<$1>') AS v"
    ).collect()[0].v
    con = duckdb.connect()
    d_dollar = con.execute(
        "SELECT regexp_replace('ab12cd', '([0-9]+)', '<$1>', 'g')"
    ).fetchone()[0]
    d_backslash = con.execute(
        r"SELECT regexp_replace('ab12cd', '([0-9]+)', '<\1>', 'g')"
    ).fetchone()[0]
    assert s == "ab<12>cd", s
    assert d_dollar == "ab<$1>cd", d_dollar  # literal $1: the silent fork
    assert d_backslash == "ab<12>cd", d_backslash  # mirrored spelling


def test_all_null_list_join_divergence_pinned(spark):
    """FIXTURES.md r10 (found LIVE by the map_roundtrip family's first
    12 seeds): both engines skip null elements when string-joining a
    list, but an ALL-null list joins to '' on Spark (array_join) and to
    NULL on DuckDB (array_to_string). Duck-side COALESCE(...,'') is the
    mirrored spelling."""
    s_one, s_all = spark.sql(
        "SELECT array_join(array(CAST(NULL AS BIGINT), 5L), ',') AS a, "
        "array_join(array(CAST(NULL AS BIGINT), NULL), ',') AS b"
    ).collect()[0]
    con = duckdb.connect()
    d_one, d_all, d_coal = con.execute(
        "SELECT array_to_string([CAST(NULL AS BIGINT), 5], ','), "
        "array_to_string([CAST(NULL AS BIGINT), NULL], ','), "
        "COALESCE(array_to_string([CAST(NULL AS BIGINT), NULL], ','), '')"
    ).fetchone()
    assert s_one == d_one == "5", (s_one, d_one)  # single null: agree
    assert s_all == "" and d_all is None, (s_all, d_all)  # the fork
    assert d_coal == "" == s_all  # mirrored spelling agrees


def test_filter_agg_semantics_pinned(spark):
    """FIXTURES.md r13 (filter_agg family, 51st): aggregate FILTER
    clause + bool/bit aggregates agree across engines — NULL-yielding
    filter predicates exclude the row (3-valued), bool_and/bool_or
    skip NULL booleans and yield NULL for all-NULL groups, Spark's
    count_if(p) ≡ DuckDB count(*) FILTER (WHERE p), bit aggregates
    skip NULLs. If either engine changes any of these, this pin fails
    before a fuzz seed silently does."""
    srow = spark.createDataFrame(
        [(True, 1), (False, 2), (None, 3), (None, None)], "b boolean, m int"
    )
    srow.createOrReplaceTempView("fp")
    s = spark.sql(
        "SELECT count(*) FILTER (WHERE b) c, "
        "CAST(sum(m) FILTER (WHERE b IS NULL) AS BIGINT) s, "
        "CAST(bool_and(b) AS INT) ba, CAST(bool_or(b) AS INT) bo, "
        "count_if(m > 1) ci, CAST(bit_xor(m) AS BIGINT) bx FROM fp"
    ).collect()[0]
    con = duckdb.connect()
    d = con.execute(
        "SELECT count(*) FILTER (WHERE b), "
        "CAST(sum(m) FILTER (WHERE b IS NULL) AS BIGINT), "
        "CAST(bool_and(b) AS INT), CAST(bool_or(b) AS INT), "
        "count(*) FILTER (WHERE m > 1), CAST(bit_xor(m) AS BIGINT) "
        "FROM (VALUES (true, 1), (false, 2), (NULL, 3), (NULL, NULL)) "
        "t(b, m)"
    ).fetchone()
    assert tuple(s) == d == (1, 3, 0, 1, 2, 1 ^ 2 ^ 3), (tuple(s), d)
    # all-NULL group: bool/bit aggregates yield NULL on both
    s2 = spark.sql(
        "SELECT CAST(bool_and(b) AS INT) ba, CAST(bit_and(m) AS BIGINT) x "
        "FROM fp WHERE m IS NULL"
    ).collect()[0]
    d2 = con.execute(
        "SELECT CAST(bool_and(b) AS INT), CAST(bit_and(m) AS BIGINT) "
        "FROM (VALUES (CAST(NULL AS BOOLEAN), CAST(NULL AS INT))) t(b, m)"
    ).fetchone()
    assert tuple(s2) == d2 == (None, None), (tuple(s2), d2)


def test_levenshtein_char_vs_byte_divergence_pinned(spark):
    """FIXTURES.md r12/r13 (strdist family, 52nd): Spark levenshtein
    counts CHARACTERS, DuckDB counts BYTES — they diverge on any
    multibyte input; the single-byte remap
    (fuzz_differential._strdist_remap_sql) is the byte-normalized twin
    the r12 matching_edit_distance_profile pin called for. length and
    instr/strpos are char-based on BOTH engines (no remap needed);
    octet_length ≡ strlen is the byte axis."""
    from tools.fuzz_differential import _strdist_remap_sql

    s = spark.sql(
        "SELECT levenshtein('é日', 'a日') a, levenshtein('abc', 'axcy', 1) t, "
        "length('é日') l, octet_length('é日') o, instr('aé日b', '日') i"
    ).collect()[0]
    assert tuple(s) == (1, -1, 2, 5, 3), tuple(s)
    con = duckdb.connect()
    raw, remapped, l, o, i = con.execute(
        "SELECT levenshtein('é日', 'a日'), "
        f"levenshtein({_strdist_remap_sql(chr(39) + 'é日' + chr(39))}, "
        f"{_strdist_remap_sql(chr(39) + 'a日' + chr(39))}), "
        "length('é日'), strlen('é日'), strpos('aé日b', '日')"
    ).fetchone()
    assert raw == 2, raw  # the byte-counting fork, live
    assert remapped == 1 == s.a  # remap restores char distance
    assert (l, o, i) == (2, 5, 3) == (s.l, s.o, s.i)


def test_seq_and_greatest_least_semantics_pinned(spark):
    """FIXTURES.md r13 (seq_battery family, 53rd): sequence ≡
    generate_series on direction-consistent bounds (inclusive end,
    negative steps, single element at a=b); a direction-INCONSISTENT
    step errors on Spark but yields [] on DuckDB — the pinned fork the
    generator avoids. greatest/least skip NULLs on both (NULL only
    when all arguments are NULL)."""
    s = spark.sql(
        "SELECT array_join(sequence(2, 8, 3), ',') a, "
        "array_join(sequence(5, 1, -2), ',') b, "
        "array_join(sequence(3, 3, 1), ',') c, "
        "greatest(1, CAST(NULL AS INT), 3) g, least(1, CAST(NULL AS INT)) l, "
        "greatest(CAST(NULL AS INT), CAST(NULL AS INT)) n"
    ).collect()[0]
    con = duckdb.connect()
    d = con.execute(
        "SELECT array_to_string(generate_series(2, 8, 3), ','), "
        "array_to_string(generate_series(5, 1, -2), ','), "
        "array_to_string(generate_series(3, 3, 1), ','), "
        "greatest(1, CAST(NULL AS INT), 3), least(1, CAST(NULL AS INT)), "
        "greatest(CAST(NULL AS INT), CAST(NULL AS INT))"
    ).fetchone()
    assert tuple(s) == d == ("2,5,8", "5,3,1", "3", 3, 1, None), (tuple(s), d)
    # the direction fork: Spark errors, DuckDB returns []
    import pytest

    with pytest.raises(Exception, match="[Ss]equence"):
        spark.sql("SELECT sequence(5, 1, 2)").collect()
    assert con.execute("SELECT generate_series(5, 1, 2)").fetchone()[0] == []


def test_quantile_parity_and_median_decimal_fork_pinned(spark):
    """FIXTURES.md r13 (quantile_battery family, 54th): percentile ≡
    quantile_cont and median ≡ median bit-exactly on quarter DOUBLE
    values (dyadic-rational interpolation — exact regardless of
    formula association); the ANSI WITHIN GROUP spelling parses on
    both. Two exclusions, both pinned live here: mode() tie order is
    engine-arbitrary, and DuckDB's median over DECIMAL input is
    TYPE-PRESERVING DISCRETE (returns the lower middle element,
    2.00, where its own quantile_cont and Spark's always-DOUBLE
    median interpolate to 2.75) — found by this pin's first draft
    using bare VALUES literals, which DuckDB types DECIMAL. INTEGER
    inputs promote to DOUBLE on both engines and agree — the family
    therefore casts every value to DOUBLE."""
    spark.createDataFrame(
        [(1.0,), (2.0,), (3.5,), (None,), (10.25,)], "v double"
    ).createOrReplaceTempView("qp")
    s = spark.sql(
        "SELECT percentile(v, 0.25) a, median(v) b, "
        "percentile_cont(0.25) WITHIN GROUP (ORDER BY v) c, "
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY v) d FROM qp"
    ).collect()[0]
    con = duckdb.connect()
    d = con.execute(
        "SELECT quantile_cont(v, 0.25), median(v), "
        "percentile_cont(0.25) WITHIN GROUP (ORDER BY v), "
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY v) "
        "FROM (VALUES (1.0::DOUBLE), (2.0::DOUBLE), (3.5::DOUBLE), "
        "(NULL), (10.25::DOUBLE)) t(v)"
    ).fetchone()
    assert tuple(s) == d == (1.75, 2.75, 1.75, 1.0), (tuple(s), d)
    # the DECIMAL fork, live: DuckDB median on DECIMAL is discrete
    med_dec, qc_dec = con.execute(
        "SELECT median(v), quantile_cont(v, 0.5) "
        "FROM (VALUES (1.0), (2.0), (3.5), (10.25)) t(v)"
    ).fetchone()
    assert float(med_dec) == 2.0 and float(qc_dec) == 2.75, (med_dec, qc_dec)
    # INTEGER inputs agree (both promote to DOUBLE and interpolate)
    s_int = spark.sql(
        "SELECT median(v) a FROM (VALUES (1), (2), (4), (10)) t(v)"
    ).collect()[0].a
    d_int = con.execute(
        "SELECT median(v) FROM (VALUES (1), (2), (4), (10)) t(v)"
    ).fetchone()[0]
    assert s_int == d_int == 3.0, (s_int, d_int)


def test_ignore_nulls_spelling_divergence_pinned(spark):
    """FIXTURES.md r13 (ignore_nulls_window family, 55th): IGNORE
    NULLS values agree across engines for first/last/nth_value and
    lead/lag; only the SPELLING position differs — Spark puts the
    modifier after the call, DuckDB inside the parens (outside errors
    there). If either engine changes, this pin fails before a fuzz
    seed silently does."""
    spark.createDataFrame(
        [(1, None), (2, 10), (3, None), (4, 20)], "i int, v int"
    ).createOrReplaceTempView("inw")
    s = spark.sql(
        "SELECT i, last_value(v) IGNORE NULLS OVER "
        "(ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) l, "
        "lead(v, 1) IGNORE NULLS OVER (ORDER BY i) ld "
        "FROM inw ORDER BY i"
    ).collect()
    con = duckdb.connect()
    d = con.execute(
        "SELECT i, last_value(v IGNORE NULLS) OVER "
        "(ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
        "lead(v, 1 IGNORE NULLS) OVER (ORDER BY i) "
        "FROM (VALUES (1, NULL), (2, 10), (3, NULL), (4, 20)) t(i, v) "
        "ORDER BY i"
    ).fetchall()
    assert [tuple(r) for r in s] == d == [
        (1, None, 10), (2, 10, 20), (3, 10, 20), (4, 20, None)
    ], (s, d)
    import pytest

    with pytest.raises(Exception):  # Spark's spelling errors on DuckDB
        con.execute(
            "SELECT last_value(v) IGNORE NULLS OVER (ORDER BY i) "
            "FROM (VALUES (1, 1)) t(i, v)"
        )


def test_pad_trim_arg_order_divergence_pinned(spark):
    """FIXTURES.md r13 (pad_trim family, 56th): multi-char pads cycle
    identically (lpad truncates below strlen, '' at len 0); multi-char
    ltrim/rtrim strip a CHARACTER SET on both — with MIRRORED argument
    order (Spark ltrim(trimstr, str); DuckDB ltrim(str, chars)); the
    two-sided trim is TRIM(BOTH chars FROM str) on Spark, trim(str,
    chars) on DuckDB; translate/repeat identical."""
    s = spark.sql(
        "SELECT lpad('ab', 5, 'xy') a, lpad('abcdef', 3, 'x') b, "
        "TRIM(BOTH 'x' FROM 'xxabxx') c, ltrim('xy', 'yxabyx') d, "
        "rtrim('xy', 'yxabyx') e, translate('abcab', 'ab', 'xy') f"
    ).collect()[0]
    con = duckdb.connect()
    d = con.execute(
        "SELECT lpad('ab', 5, 'xy'), lpad('abcdef', 3, 'x'), "
        "trim('xxabxx', 'x'), ltrim('yxabyx', 'xy'), "
        "rtrim('yxabyx', 'xy'), translate('abcab', 'ab', 'xy')"
    ).fetchone()
    assert tuple(s) == d == (
        "xyxab", "abc", "ab", "abyx", "yxab", "xycxy"
    ), (tuple(s), d)


def test_struct_equality_field_order_divergence_pinned(spark):
    """FIXTURES.md r13 (probed for the r14 candidate list): struct
    EQUALITY is POSITIONAL and NAME-BLIND on Spark (named_struct('b',1,
    'a',2) equals named_struct('a',1,'b',2) — values compared slot by
    slot, names ignored) but NAME-MATCHED on DuckDB ({'b':1,'a':2}
    equals {'a':2,'b':1} — fields reordered by name before compare).
    The two engines return OPPOSITE verdicts on both probes, so the
    struct fuzz family must keep field order identical on both sides
    of every template — it does; this pin guards that convention."""
    s1 = spark.sql(
        "SELECT named_struct('b',1,'a',2) = named_struct('a',2,'b',1) v"
    ).collect()[0].v
    s2 = spark.sql(
        "SELECT named_struct('b',1,'a',2) = named_struct('a',1,'b',2) v"
    ).collect()[0].v
    con = duckdb.connect()
    d1 = con.execute("SELECT {'b':1,'a':2} = {'a':2,'b':1}").fetchone()[0]
    assert (s1, s2, d1) == (False, True, True), (s1, s2, d1)
    # DuckDB refuses the name-mismatched positional compare Spark allows
    try:
        d2 = con.execute("SELECT {'b':1,'a':2} = {'a':1,'b':2}").fetchone()[0]
        # if it ever starts answering, it answers by NAME (True requires
        # a=1,b=2 vs a=2,b=1 -> False) — either way re-probe the family
        assert d2 is False, d2
    except duckdb.Error:
        pass


def test_array_slice_conventions_pinned(spark):
    """FIXTURES.md r13 (array_slice family, 57th): Spark slice(a,
    start, LEN) ↔ DuckDB list_slice(a, start, start+len-1) inclusive;
    negative starts end-relative on both (the twin keeps the stop
    negative); array_compact ≡ list_filter not-null; array_min/max ≡
    list_min/max with NULL elements skipped."""
    s = spark.sql(
        "SELECT array_join(slice(array(1,2,3,4,5), 2, 3), ',') a, "
        "array_join(slice(array(1,2,3,4,5), -2, 2), ',') b, "
        "array_join(array_compact(array(1, NULL, 2)), ',') c, "
        "array_min(array(3, NULL, 1)) d, array_max(array(3, NULL, 1)) e"
    ).collect()[0]
    con = duckdb.connect()
    d = con.execute(
        "SELECT array_to_string(list_slice([1,2,3,4,5], 2, 4), ','), "
        "array_to_string(list_slice([1,2,3,4,5], -2, -1), ','), "
        "array_to_string(list_filter([1, NULL, 2], x -> x IS NOT NULL), ','), "
        "list_min([3, NULL, 1]), list_max([3, NULL, 1])"
    ).fetchone()
    assert tuple(s) == d == ("2,3,4", "4,5", "1,2", 1, 3), (tuple(s), d)


def test_xor_caret_power_divergence_pinned(spark):
    """FIXTURES.md r13 (bit_shift family, 58th): `^` is XOR on Spark
    but POWER on DuckDB — a SILENT value fork (5^3 = 6 vs 125.0); the
    DuckDB XOR twin is xor(a, b). Shifts: agree on BIGINT for in-range
    non-negative operands; DuckDB ERRORS on an out-of-range count and
    on left-shifting a negative where Spark wraps (masked mod 64)."""
    s = spark.sql(
        "SELECT 5 ^ 3 a, 5 & 3 b, 5 | 3 c, ~5 d, "
        "shiftleft(CAST(1 AS BIGINT), 65) w, shiftleft(-3, 1) neg"
    ).collect()[0]
    assert tuple(s) == (6, 1, 7, -6, 2, -6), tuple(s)  # Spark wraps
    con = duckdb.connect()
    d = con.execute("SELECT 5 ^ 3, 5 & 3, 5 | 3, ~5, xor(5, 3)").fetchone()
    assert d == (125.0, 1, 7, -6, 6), d  # ^ is power — the silent fork
    for bad in ("SELECT (1::BIGINT) << 65", "SELECT (-3::BIGINT) << 1"):
        try:
            con.execute(bad)
            raise AssertionError(f"DuckDB now accepts: {bad}")
        except duckdb.Error:
            pass


def test_split_part_agreement_pinned(spark):
    """FIXTURES.md r13 (split_part family, 59th): 1-based, negative
    from the end, out-of-range '', adjacent delimiters give real ''
    parts — full agreement."""
    q = (
        "SELECT split_part('a,,c', ',', 2) a, split_part('a,b,c', ',', -1) b, "
        "split_part('a,b,c', ',', 9) c"
    )
    s = spark.sql(q).collect()[0]
    con = duckdb.connect()
    d = con.execute(q).fetchone()
    assert tuple(s) == d == ("", "c", ""), (tuple(s), d)


def test_to_json_null_field_divergence_pinned(spark):
    """FIXTURES.md r13 (to_json family, 60th): Spark's DEFAULT to_json
    DROPS null struct fields; DuckDB emits "field":null — the family
    neutralizes the fork with ignoreNullFields=false, after which the
    JSON text is byte-identical (incl. escaping and double repr)."""
    dflt = spark.sql(
        "SELECT to_json(struct(1 AS a, CAST(NULL AS INT) AS c)) v"
    ).collect()[0].v
    kept = spark.sql(
        "SELECT to_json(struct(1 AS a, CAST(NULL AS INT) AS c), "
        "map('ignoreNullFields', 'false')) v"
    ).collect()[0].v
    con = duckdb.connect()
    d = con.execute(
        "SELECT to_json({'a': 1, 'c': CAST(NULL AS INT)})"
    ).fetchone()[0]
    assert dflt == '{"a":1}', dflt  # the fork
    assert kept == d == '{"a":1,"c":null}', (kept, d)
    # escaping + double repr parity (the family's byte-exact basis)
    s2 = spark.sql(
        "SELECT to_json(struct('a\"b' AS q, CAST(2.0 AS DOUBLE) AS d), "
        "map('ignoreNullFields', 'false')) v"
    ).collect()[0].v
    d2 = con.execute(
        "SELECT to_json({'q': 'a\"b', 'd': 2.0::DOUBLE})"
    ).fetchone()[0]
    assert s2 == d2 == '{"q":"a\\"b","d":2.0}', (s2, d2)


def test_from_json_type_strictness_pinned(spark):
    """FIXTURES.md r13 (from_json_mismatch family, 61st): Spark's
    from_json is TYPE-STRICT for numeric fields (string "7", double
    1.9, bool -> NULL under 'a INT' — no coercion) but COERCING for
    string fields (1 -> '1', true -> 'true'); malformed input yields
    an all-NULL struct where DuckDB's json_extract ERRORS; Spark 4
    ANSI errors on bare out-of-range array indexing (try_element_at
    is the family's spelling). DuckDB twin gates numerics on
    json_type BIGINT/UBIGINT before try_cast."""
    s = spark.sql(
        """SELECT from_json('{"a": "7"}', 'a bigint').a v1,
        from_json('{"a": 1.9}', 'a bigint').a v2,
        from_json('{"a": 1}', 'a string').a v3,
        from_json('not json', 'a bigint').a v4"""
    ).collect()[0]
    assert tuple(s) == (None, None, "1", None), tuple(s)
    con = duckdb.connect()
    d = con.execute(
        """SELECT CASE WHEN json_type('{"a": "7"}', '$.a') IN
        ('BIGINT', 'UBIGINT') THEN
        try_cast(json_extract('{"a": "7"}', '$.a') AS BIGINT) END,
        CASE WHEN json_type('{"a": 1.9}', '$.a') IN
        ('BIGINT', 'UBIGINT') THEN
        try_cast(json_extract('{"a": 1.9}', '$.a') AS BIGINT) END,
        json_extract_string('{"a": 1}', '$.a')"""
    ).fetchone()
    assert d == (None, None, "1"), d
    try:
        con.execute("SELECT json_extract('not json', '$.a')")
        raise AssertionError("DuckDB now tolerates malformed JSON")
    except duckdb.Error:
        pass
    import pytest

    with pytest.raises(Exception):
        spark.sql(
            "SELECT from_json('{\"arr\": [1]}', 'arr array<int>').arr[5]"
        ).collect()


def test_make_date_construction_parity_pinned(spark):
    """FIXTURES.md r13 (make_date family, 62nd): component
    construction agrees (incl. leap day and fractional NTZ seconds);
    INVALID components ERROR on BOTH engines; datediff's argument
    order is MIRRORED (Spark (end, start) vs DuckDB (unit, start,
    end))."""
    s = spark.sql(
        "SELECT make_date(2024, 2, 29) a, "
        "make_timestamp_ntz(2024, 2, 29, 13, 5, 30.25) b, "
        "datediff(make_date(2024, 3, 1), make_date(2024, 2, 1)) c"
    ).collect()[0]
    con = duckdb.connect()
    d = con.execute(
        "SELECT make_date(2024, 2, 29), "
        "make_timestamp(2024, 2, 29, 13, 5, 30.25), "
        "date_diff('day', make_date(2024, 2, 1), make_date(2024, 3, 1))"
    ).fetchone()
    assert tuple(s) == d, (tuple(s), d)
    assert s.c == 29
    import pytest

    with pytest.raises(Exception):
        spark.sql("SELECT make_date(2023, 2, 29)").collect()
    try:
        con.execute("SELECT make_date(2023, 2, 29)")
        raise AssertionError("DuckDB now tolerates invalid make_date")
    except duckdb.Error:
        pass


def test_csv_ts_format_dialects_pinned(spark, tmp_path):
    """FIXTURES.md r13 (csv_ts_format family, 63rd): the same
    timestamp text parses identically through Spark's Java pattern
    (timestampNTZFormat — zone-proof) and DuckDB's strptime pattern
    (timestampformat); the DIALECTS differ (MM/dd/yyyy HH:mm:ss vs
    %m/%d/%Y %H:%M:%S) and are paired per format row in
    _CSV_TS_FORMATS."""
    import datetime

    p = tmp_path / "pin.csv"
    p.write_text("1|02/29/2024 13:05:30\n")
    s = (
        spark.read.schema("k long, ts timestamp_ntz")
        .option("sep", "|")
        .option("timestampNTZFormat", "MM/dd/yyyy HH:mm:ss")
        .csv(str(p))
        .collect()[0]
    )
    con = duckdb.connect()
    d = con.execute(
        f"SELECT k, ts FROM read_csv('{p}', delim='|', header=false, "
        "columns={'k': 'BIGINT', 'ts': 'TIMESTAMP'}, "
        "timestampformat='%m/%d/%Y %H:%M:%S')"
    ).fetchone()
    expect = (1, datetime.datetime(2024, 2, 29, 13, 5, 30))
    assert tuple(s) == d == expect, (tuple(s), d)


def test_month_sequence_anchor_vs_sticky_clamp_pinned(spark):
    """r14 probe, the 64th family's fork: month-interval sequence
    stepping from a month-end anchor. Spark anchors every element to
    the ORIGINAL day-of-month (per-element one-shot addition), DuckDB's
    generate_series steps cumulatively from the previous element —
    once clamped, forever clamped. OPPOSITE values from element 3 on:
    Jan 31 → Feb 29 → [Mar 31 vs Mar 29] → [Apr 30 vs Apr 29]."""
    s = spark.sql(
        "SELECT transform(sequence(TIMESTAMP_NTZ'2024-01-31 00:00:00', "
        "TIMESTAMP_NTZ'2024-04-30 00:00:00', INTERVAL 1 MONTH), "
        "x -> CAST(x AS STRING)) AS q"
    ).collect()[0].q
    assert s == [
        "2024-01-31 00:00:00",
        "2024-02-29 00:00:00",
        "2024-03-31 00:00:00",
        "2024-04-30 00:00:00",
    ], s
    con = duckdb.connect()
    d = con.execute(
        "SELECT list_transform(generate_series("
        "TIMESTAMP'2024-01-31', TIMESTAMP'2024-04-30', "
        "INTERVAL 1 MONTH), x -> strftime(x, '%Y-%m-%d %H:%M:%S'))"
    ).fetchone()[0]
    assert d == [
        "2024-01-31 00:00:00",
        "2024-02-29 00:00:00",
        "2024-03-29 00:00:00",  # sticky clamp — diverges from Spark
        "2024-04-29 00:00:00",
    ], d
    # The family's twin recipe: per-index ONE-SHOT addition from the
    # anchor replicates Spark's semantics exactly in DuckDB.
    twin = con.execute(
        "SELECT list_transform(list_filter(range(0, 4), i -> "
        "TIMESTAMP'2024-01-31' + i * INTERVAL 1 MONTH "
        "<= TIMESTAMP'2024-04-30'), i -> strftime("
        "TIMESTAMP'2024-01-31' + i * INTERVAL 1 MONTH, "
        "'%Y-%m-%d %H:%M:%S'))"
    ).fetchone()[0]
    assert twin == s, (twin, s)


def test_map_concat_duplicate_key_policy_pinned(spark):
    """r14 probe: map_concat with a duplicated key. Spark's default
    mapKeyDedupPolicy=EXCEPTION ERRORS (DUPLICATED_MAP_KEY); DuckDB's
    map_concat silently merges last-wins. Under LAST_WIN Spark matches
    DuckDB — a CONF-dependent parity, which is why no fuzz family
    builds on this surface (the default diverges by erroring)."""
    import pytest as _pytest

    q = (
        "SELECT map_concat(map('a', 1, 'b', 2), map('b', 9)) AS m"
    )
    with _pytest.raises(Exception, match="DUPLICATED_MAP_KEY"):
        spark.sql(q).collect()
    old = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    try:
        m = spark.sql(q).collect()[0].m
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", old)
    assert m == {"a": 1, "b": 9}, m
    con = duckdb.connect()
    d = con.execute(
        "SELECT map_concat(MAP{'a': 1, 'b': 2}, MAP{'b': 9})"
    ).fetchone()[0]
    # duckdb's python client renders MAP as {'key': [...], 'value': [...]}
    assert dict(zip(d["key"], d["value"])) == {"a": 1, "b": 9}, d


def test_sort_array_null_placement_divergence_pinned(spark):
    """r14 probe: default null placement in array sorting FORKS —
    Spark sort_array ascends NULLS FIRST, DuckDB list_sort defaults
    NULLS LAST. The hof family's sort comparisons never trip on it
    because both engines' join-to-string (array_join /
    array_to_string) SKIP null elements (also pinned here). Mirroring
    rule: a cross-engine oracle that compares sorted arrays
    element-wise must pass list_sort(arr, 'ASC', 'NULLS FIRST') on
    the DuckDB side (matches Spark) or strip nulls first."""
    s = spark.sql(
        "SELECT sort_array(array(3, NULL, 1)) AS a"
    ).collect()[0].a
    assert s == [None, 1, 3], s
    con = duckdb.connect()
    d = con.execute("SELECT list_sort([3, NULL, 1])").fetchone()[0]
    assert d == [1, 3, None], d  # NULLS LAST — diverges from Spark
    d2 = con.execute(
        "SELECT list_sort([3, NULL, 1], 'ASC', 'NULLS FIRST')"
    ).fetchone()[0]
    assert d2 == [None, 1, 3], d2  # explicit order restores parity
    # Join-to-string skips nulls on BOTH engines — the masking both
    # the hof family and any join-canonicalized oracle rely on.
    sj = spark.sql(
        "SELECT array_join(array(NULL, 1), ',')"
    ).collect()[0][0]
    dj = con.execute("SELECT array_to_string([NULL, 1], ',')").fetchone()[0]
    assert sj == dj == "1", (sj, dj)


def test_regr_degenerate_group_fork_pinned(spark):
    """r14 probe, the 65th family's excluded edge: on a zero-variance
    (constant-x or constant-y) DOUBLE group, `corr` is the fork —
    Spark ANSI raises DIVIDE_BY_ZERO where DuckDB returns NULL. The
    regr_* aggregates themselves AGREE even degenerate: constant-x →
    NULL slope/intercept/r2 on both; constant-y → slope 0.0 and the
    r2 = 1.0 'perfect horizontal fit' convention on BOTH engines.
    (DECIMAL literals behave differently again — Spark's decimal path
    NULLs where the double path errors — the family fixes input type
    to DOUBLE.) Single-row and empty groups are NULL everywhere. The
    generator guarantees per-group x and y spread so corr is safe to
    fuzz alongside the regr battery."""
    import pytest as _pytest

    constx = "(VALUES (2.0D, 1.0D), (2.0D, 5.0D)) AS t(x, y)"
    consty = "(VALUES (1.0D, 3.0D), (2.0D, 3.0D)) AS t(x, y)"
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql(f"SELECT corr(x, y) FROM {constx}").collect()
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql(f"SELECT corr(x, y) FROM {consty}").collect()
    sx = spark.sql(
        "SELECT regr_slope(y, x), regr_intercept(y, x), regr_r2(y, x) "
        f"FROM {constx}"
    ).collect()[0]
    assert tuple(sx) == (None, None, None), sx
    sy = spark.sql(
        f"SELECT regr_slope(y, x), regr_r2(y, x) FROM {consty}"
    ).collect()[0]
    assert tuple(sy) == (0.0, 1.0), sy
    one = spark.sql(
        "SELECT regr_slope(y, x), regr_r2(y, x), corr(x, y) "
        "FROM (VALUES (1.0D, 2.0D)) AS t(x, y)"
    ).collect()[0]
    assert tuple(one) == (None, None, None), one
    con = duckdb.connect()
    d = con.execute(
        "SELECT regr_slope(y, x), regr_r2(y, x), corr(x, y) "
        "FROM (VALUES (2.0, 1.0), (2.0, 5.0)) t(x, y)"
    ).fetchone()
    assert d == (None, None, None), d  # corr NULL — the Spark fork
    d2 = con.execute(
        "SELECT regr_slope(y, x), regr_r2(y, x), corr(x, y) "
        "FROM (VALUES (1.0, 3.0), (2.0, 3.0)) t(x, y)"
    ).fetchone()
    assert d2 == (0.0, 1.0, None), d2  # r2=1.0 convention SHARED


def test_argminmax_null_value_fork_pinned(spark):
    """r14 probe, the 66th family's fork: when the extremal-ordering
    row's VALUE argument is NULL, Spark min_by/max_by return that NULL
    (the row wins, its value is the answer) while DuckDB
    arg_min/arg_max SKIP null-valued rows and answer from the best
    surviving row. Wrapping the value in a struct (never NULL) on the
    DuckDB side replicates Spark exactly — the family's twin recipe.
    Both engines agree on skipping NULL ORDERING keys."""
    rows = "(VALUES ('a', 3, 10), ('b', 1, 20), ('c', NULL, 5), ('d', 7, NULL))"
    s = spark.sql(
        f"SELECT max_by(w, o), min_by(s, o) FROM {rows} AS t(s, o, w)"
    ).collect()[0]
    assert tuple(s) == (None, "b"), s  # max-o row ('d') has NULL w
    con = duckdb.connect()
    d = con.execute(
        f"SELECT arg_max(w, o), arg_min(s, o) FROM {rows} t(s, o, w)"
    ).fetchone()
    assert d == (10, "b"), d  # DuckDB skipped the NULL-w winner
    twin = con.execute(
        f"SELECT (arg_max({{'w': w}}, o)).w FROM {rows} t(s, o, w)"
    ).fetchone()[0]
    assert twin is None  # struct wrap restores Spark's semantics


def test_math_domain_error_convention_fork_pinned(spark):
    """r14 probe: out-of-domain math inputs FORK by error convention —
    Spark follows the SQL NULL-on-domain-error style (ln/log10 of
    non-positive → NULL; sqrt of negative → NaN) while DuckDB raises
    Out of Range. Mirroring rule: any oracle feeding ln/log/sqrt must
    guard the domain identically on both sides (every registered op
    already does — ln(c+1), ln of counts, sqrt of variances); no fuzz
    family emits unguarded domain-crossing inputs. Footnote fork,
    same probe: sign(-0.0) is -0.0 on Spark, integer 0 on DuckDB."""
    import math

    s = spark.sql(
        "SELECT ln(-1.0D), ln(0.0D), log10(0.0D), sqrt(-1.0D)"
    ).collect()[0]
    assert s[0] is None and s[1] is None and s[2] is None, tuple(s)
    assert math.isnan(s[3]), s[3]
    con = duckdb.connect()
    import pytest as _pytest

    for q in ("SELECT ln(-1.0)", "SELECT ln(0.0)", "SELECT sqrt(-1.0)"):
        with _pytest.raises(Exception, match="Out of Range"):
            con.execute(q).fetchone()
    assert str(spark.sql("SELECT sign(-0.0D)").collect()[0][0]) == "-0.0"
    assert con.execute("SELECT sign(-0.0)").fetchone()[0] == 0
