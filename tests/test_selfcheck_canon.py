"""The selfcheck canonicalizer must stay driver-faithful (VERDICT r4
item 1): exact values, exact types. r4 proved the failure mode — four
queries passed a float-rounding, type-blind selfcheck and then failed
the driver's exact hash. These unit tests pin the strict behavior so a
future convenience edit can't quietly soften it again."""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "selfcheck", Path(__file__).resolve().parents[1] / "tools" / "selfcheck.py"
)
selfcheck = importlib.util.module_from_spec(_spec)
sys.modules["selfcheck"] = selfcheck
_spec.loader.exec_module(selfcheck)
norm_cell = selfcheck.norm_cell


def test_decimal_is_not_double():
    # the literal r4 failure: decimal(27,6) vs double, numerically equal
    assert norm_cell(decimal.Decimal("347498168.050000")) != norm_cell(
        347498168.05
    )


def test_decimal_scale_is_preserved():
    assert norm_cell(decimal.Decimal("1.050000")) != norm_cell(
        decimal.Decimal("1.05")
    )


def test_floats_are_not_rounded():
    # the old round(v, 9) would have collapsed these
    assert norm_cell(0.1234567891) != norm_cell(0.1234567892)


def test_int_is_not_float():
    assert norm_cell(5) != norm_cell(5.0)


def test_naive_is_not_zoned():
    naive = datetime.datetime(2024, 3, 10, 1, 30)
    zoned = naive.replace(tzinfo=datetime.timezone.utc)
    assert norm_cell(naive) != norm_cell(zoned)


def test_equal_exact_values_agree():
    assert norm_cell(1.5) == norm_cell(1.5)
    assert norm_cell("x") == norm_cell("x")
    assert norm_cell(None) == "NULL"
    d = datetime.date(2024, 3, 10)
    assert norm_cell(d) == "2024-03-10"
