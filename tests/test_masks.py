"""Scalar mask-function tests (SURVEY §2.G) vs reference semantics
(reference src/utility.mts:60-166, 196-319)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tally_database_loader_spark.functions.masks import (
    format_date_mask, format_number_mask, parse_date_mask, round_ref,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_format_number_sections(spark):
    col = F.lit(None).cast("double")
    cases = [
        # the reference's internal id masks (src/tally.mts:635-657)
        (3.0, "MyPart00", "MyPart03"),
        (12.0, "Fld00", "Fld12"),
        (7.0, "F00", "F07"),
        # report-style money mask with sign sections
        (1234567.5, "#,0.00;(#,0.00)", "1,234,567.50"),
        (-1234567.5, "#,0.00;(#,0.00)", "(1,234,567.50)"),
        (0.0, "#,0.00;(#,0.00);-", "-"),
        (42.0, "0", "42"),
    ]
    for val, mask, want in cases:
        got = _one(spark, format_number_mask(F.lit(val), mask))
        assert got == want, f"{val!r} % {mask!r}: got {got!r} want {want!r}"


def test_round_ref_matches_reference_quirks(spark):
    # reference: strict > 0.5 bumps, so exact .5 rounds DOWN; zero short-
    # circuits; negatives truncate (src/utility.mts:158-166)
    cases = [(2.51, 0, 3.0), (2.5, 0, 2.0), (2.49, 0, 2.0),
             (0.0, 2, 0.0), (1.005, 2, 1.0), (1.006, 2, 1.01),
             (-2.7, 0, -2.0)]
    for val, prec, want in cases:
        got = _one(spark, round_ref(F.lit(val), prec))
        assert got == pytest.approx(want), (val, prec, got, want)


def test_format_date_mask(spark):
    d = F.lit(datetime.datetime(2024, 4, 9, 14, 5, 7))
    assert _one(spark, format_date_mask(d, "yyyy-MM-dd")) == "2024-04-09"
    assert _one(spark, format_date_mask(d, "d-MMM-yyyy")) == "9-Apr-2024"
    assert _one(spark, format_date_mask(d, "dd/MM/yy HH:mm:ss")) == \
        "09/04/24 14:05:07"
    assert _one(spark, format_date_mask(d, "HH:mm tt")) == "14:05 PM"


def test_parse_date_mask_pivot(spark):
    got = _one(spark, parse_date_mask(F.lit("09/04/2024"), "dd/MM/yyyy"))
    assert got == datetime.datetime(2024, 4, 9)
    # 2-digit pivot: 00-71 → 2000s, 72-99 → 1900s (utility.mts:313-315)
    assert _one(spark, parse_date_mask(F.lit("01/01/70"), "dd/MM/yy")).year == 2070
    assert _one(spark, parse_date_mask(F.lit("01/01/85"), "dd/MM/yy")).year == 1985
    assert _one(spark, parse_date_mask(F.lit("01/01/24"), "dd/MM/yy")).year == 2024
