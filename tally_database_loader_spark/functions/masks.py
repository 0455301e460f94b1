"""Scalar mask-function library (SURVEY §2.G) as Column expressions.

The reference carries host-side formatting utilities (reference
src/utility.mts): ``Number.format`` with ``pos;neg;zero`` sign-section
masks (:60-156), a truncating ``round`` (:158-166), ``Date.format`` mask
rendering (:196-246) and ``Date.parse`` with a 2-digit-year pivot
(:248-319). Here the same mask surfaces compile to built-in Spark
expressions — JVM-side, codegen-friendly, no UDFs — so they can sit in a
projection over billions of rows.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# mask token → Spark (Java DateTimeFormatter) pattern
_DATE_TOKENS = [
    ("yyyy", "yyyy"), ("yy", "yy"),
    ("MMMM", "MMMM"), ("MMM", "MMM"), ("MM", "MM"), ("M", "M"),
    ("dddd", "EEEE"), ("ddd", "EEE"), ("dd", "dd"), ("d", "d"),
    ("HH", "HH"), ("H", "H"), ("hh", "hh"), ("h", "h"),
    ("mm", "mm"), ("m", "m"), ("ss", "ss"), ("s", "s"),
    ("tt", "a"),
]
_DATE_TOKEN_RE = re.compile(
    "|".join(re.escape(t) for t, _ in _DATE_TOKENS))  # longest-first order
_TOKEN_MAP = dict(_DATE_TOKENS)


def _translate_date_mask(mask: str) -> str:
    return _DATE_TOKEN_RE.sub(lambda m: _TOKEN_MAP[m.group(0)], mask)


def format_date_mask(col: Column, mask: str) -> Column:
    """``Date.format`` (G3): render with the reference's mask alphabet
    (yyyy/MM/dd/HH/mm/ss/tt, reference src/utility.mts:196-246)."""
    return F.date_format(col, _translate_date_mask(mask))


def parse_date_mask(col: Column, mask: str) -> Column:
    """``Date.parse`` (G4): mask-driven parse with the reference's 2-digit
    year pivot — 00-71 land in the 2000s, 72-99 in the 1900s (reference
    src/utility.mts:313-315; Java's own yy pivot is all-2000s, so the
    century is corrected after the parse)."""
    pattern = _translate_date_mask(mask)
    ts = F.to_timestamp(col, pattern)
    if "yyyy" not in mask and "yy" in mask:
        ts = F.when(F.year(ts) >= 2072, ts - F.expr("INTERVAL 100 YEARS")) \
             .otherwise(ts)
    return ts


def round_ref(col: Column, precision: int = 0) -> Column:
    """The reference's ``Number.round`` semantics, bit-for-bit (reference
    src/utility.mts:158-166): scale, truncate toward zero, bump by one only
    when the truncated remainder strictly exceeds 0.5. Note this differs
    from half-up — exact .5 rounds DOWN, and negative values always
    truncate (a latent quirk; no reference data path feeds it negatives).
    Use ``F.round`` when you want ANSI half-up instead."""
    scale = F.lit(10 ** precision)
    scaled = col.cast("double") * scale
    trunc = scaled.cast("long").cast("double")
    bump = F.when(scaled - trunc > 0.5, trunc + 1).otherwise(trunc)
    return F.when(col.isNull() | (col == 0), F.lit(0.0)) \
            .otherwise(bump / scale)


def _split_sections(mask: str) -> tuple[str, str, str]:
    """``positive;negative;zero`` section split (reference
    src/utility.mts:133-139); missing sections fall back to the first."""
    parts = mask.split(";")
    pos = parts[0]
    neg = parts[1] if len(parts) > 1 else parts[0]
    zero = parts[2] if len(parts) > 2 else parts[0]
    return pos, neg, zero


def _format_one(col: Column, section: str) -> Column:
    """Format ``abs(value)`` by one mask section: prefix + digit mask +
    suffix, where the digit mask is ``[#,0.]+`` (grouping commas, fixed
    zeros, fraction digits)."""
    m = re.search(r"[#,0.]+", section)
    if not m:
        return F.lit(section)
    prefix, digits, suffix = section[:m.start()], m.group(0), section[m.end():]
    frac = len(digits.split(".")[1]) if "." in digits else 0
    int_mask = digits.split(".")[0]
    grouped = "," in int_mask
    fixed = len(int_mask.replace("#", "").replace(",", ""))

    if grouped:
        body = F.format_number(col.cast("double"), frac)
    else:
        body = F.format_string(f"%.{frac}f", col.cast("double"))
        if fixed > 1:
            # zero-pad the integer part (reference pads 'MyPart00'-style ids)
            width = fixed + (frac + 1 if frac else 0)
            body = F.lpad(body, width, "0")
    out = body
    if prefix:
        out = F.concat(F.lit(prefix), out)
    if suffix:
        out = F.concat(out, F.lit(suffix))
    return out


def format_number_mask(col: Column, mask: str) -> Column:
    """``Number.format`` (G1): sign-section mask formatting. The section
    picks by sign, then formats ``abs(value)`` — so ``#,0.00;(#,0.00)``
    renders negatives in parentheses (reference src/utility.mts:60-156)."""
    pos, neg, zero = _split_sections(mask)
    a = F.abs(col)
    return (F.when(col > 0, _format_one(a, pos))
             .when(col < 0, _format_one(a, neg))
             .otherwise(_format_one(a, zero)))
