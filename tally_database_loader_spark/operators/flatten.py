"""Hierarchical-source flattening: Primary/Derived table extraction.

Tally stores table-inside-table data (reference docs/data-structure.md:5);
a Derived table un-nests a collection-valued path of a Primary row
(docs/data-structure.md:27-33). The reference compiles one TDL PART/LINE
pair per nesting level (src/tally.mts:627-643); here each level is one
``explode`` with parent-scope columns carried alongside (SURVEY C4/C5).

Type encodings mirror src/tally.mts:660-679 (SURVEY §1.2): logical → 0/1
int, date → nullable DateType (the reference's ñ sentinel is simply NULL —
DataFrames have real nulls, the sentinel only existed because its
transport was TSV text), amount → Decimal(17,2) Credit=+/Debit=−,
quantity → Decimal(15,4) Inward=+/Outward=−, rate → Decimal(15,4),
number → long (empty → 0), custom → verbatim ``F.expr``.

Scale: explode is narrow (no shuffle); filters compile to Column
predicates that Catalyst pushes into the source scan; only the projected
nested fields are read (nested-schema pruning ≈ the reference's explicit
``fetch`` lists, SURVEY C7).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tdl import TdlCompiler, make_struct_resolver
from ..sources.registry import FieldSpec, TableSpec

# SURVEY C9: `$Guid:Ledger:$LedgerName` — source-side dimension lookup
# producing surrogate GUID-FK columns (`_parent`, `_ledger`, `_item`, ...;
# reference tally-export-config-incremental.yaml:61-62,627,654)
_GUID_FK = re.compile(r"^\$Guid:(\w+):(.+)$")


def _encode(col: Column, ftype: str) -> Column:
    if ftype == "text":
        return F.coalesce(col.cast("string"), F.lit(""))
    if ftype == "logical":
        b = (F.when(col.cast("string").isin("Yes", "YES", "true", "1"), True)
              .otherwise(F.coalesce(col.cast("boolean"), F.lit(False))))
        return b.cast("int")
    if ftype == "date":
        return F.when(col.cast("string") == "", None).otherwise(col.cast("date"))
    if ftype == "number":
        return F.coalesce(col.cast("long"), F.lit(0))
    if ftype == "amount":
        # Credit=+/Debit=− (docs/data-structure.md:68-72); raw XML already
        # carries debit-negative, so the signed cast is the encoding
        return F.coalesce(col.cast(T.DecimalType(17, 2)),
                          F.lit("0").cast(T.DecimalType(17, 2)))
    if ftype == "quantity":
        # Inward=+/Outward=− with unit-suffix extraction ("5 nos" → 5)
        num = F.when(col.cast("string").rlike(r"^-?\d+(\.\d+)?"),
                     F.regexp_extract(col.cast("string"), r"^(-?\d+(?:\.\d+)?)", 1))
        return F.coalesce(num.cast(T.DecimalType(15, 4)),
                          F.lit("0").cast(T.DecimalType(15, 4)))
    if ftype == "rate":
        return F.coalesce(col.cast(T.DecimalType(15, 4)),
                          F.lit("0").cast(T.DecimalType(15, 4)))
    raise ValueError(f"unknown logical type {ftype}")


def extract_table(source: DataFrame, spec: TableSpec,
                  include_alterid: bool = False,
                  masters: dict[str, DataFrame] | None = None) -> DataFrame:
    """Compile a TableSpec into a DataFrame program over a nested source.

    ``source`` holds the ROOT collection rows (e.g. one row per Voucher,
    with collection fields as array<struct>). The spec's dotted
    ``collection`` path drives the explode chain; ``..Field`` expressions
    see the immediately-enclosing level (SURVEY C5).

    ``masters`` maps collection name → its root DataFrame and powers the
    ``$Guid:<Collection>:<expr>`` FK-resolution fields (SURVEY C9): the
    inner expression yields the dimension's name, which a broadcast join
    against the (name, guid) projection of the master resolves to its
    GUID — the Spark form of the reference's source-side
    ``$Guid:Ledger:$LedgerName`` lookup. Dimensions are small relative to
    facts, so the join never shuffles the fact side."""
    segments = spec.collection.split(".")[1:]  # first segment = root name
    df = source
    # scope stack: outermost..innermost, each mapping field name → column ref
    scopes: list[dict[str, str]] = [{f: f for f in df.columns}]
    for depth, seg in enumerate(segments):
        cur = scopes[-1]
        sel, new_scopes = [], []
        for si, scope in enumerate(scopes):
            ns = {}
            for name, ref in scope.items():
                if si == len(scopes) - 1 and name == seg:
                    continue  # the collection being exploded
                alias = f"__d{depth}s{si}_{name}"
                sel.append(F.col(ref).alias(alias))
                ns[name] = alias
            new_scopes.append(ns)
        lvl = f"__l{depth}"
        # inner explode: an empty collection yields no derived rows (one
        # TDL LINE per element, reference src/tally.mts:627-643)
        df = df.select(*sel, F.explode(F.col(cur[seg])).alias(lvl))
        child_fields = df.schema[lvl].dataType.names
        new_scopes.append({f: f"{lvl}.{f}" for f in child_fields})
        scopes = new_scopes

    compiler = TdlCompiler(make_struct_resolver(scopes))

    if spec.filters:
        pred = None
        for flt in spec.filters:
            c = compiler.compile(flt).cast("boolean")
            pred = c if pred is None else (pred & c)
        df = df.filter(pred)

    fk_fields: list[tuple[str, str]] = []  # (field name, master collection)

    def project(f: FieldSpec) -> Column:
        if f.type == "custom":
            return F.expr(f.expr).alias(f.name)
        m = _GUID_FK.match(f.expr)
        if m:
            coll, inner = m.group(1), m.group(2)
            if masters is None or coll not in masters:
                raise ValueError(
                    f"field {f.name!r} needs master collection {coll!r} "
                    f"for $Guid resolution but it was not provided")
            fk_fields.append((f.name, coll))
            return (_encode(compiler.compile(inner), "text")
                    .alias(f"__fkkey_{f.name}"))
        return _encode(compiler.compile(f.expr), f.type).alias(f.name)

    cols = [project(f) for f in spec.fields]
    if include_alterid:
        cols.append(_alterid_col(scopes).alias("alterid"))
    df = df.select(*cols)

    for fname, coll in fk_fields:
        m = masters[coll]
        cmap = {c.lower(): c for c in m.columns}
        key = f"__fkkey_{fname}"
        mapping = (m.select(F.col(cmap["name"]).alias(key),
                            F.col(cmap["guid"]).alias(fname))
                    .dropDuplicates([key]))
        df = df.join(F.broadcast(mapping), key, "left").drop(key)

    if fk_fields:
        resolved = {fname for fname, _ in fk_fields}
        order = [f.name for f in spec.fields] + (
            ["alterid"] if include_alterid else [])
        df = df.select(*[
            F.coalesce(F.col(c), F.lit("")).alias(c) if c in resolved
            else F.col(c) for c in order])
    return df


def _alterid_col(scopes: list[dict[str, str]]) -> Column:
    """AlterId travels on the root entity (reference $AltMstId/$AltVchId,
    src/tally.mts:406-446); derived rows inherit their root's."""
    for scope in scopes:
        if "AlterId" in scope:
            return F.col(scope["AlterId"]).cast("long")
    return F.lit(None).cast("long")


def extract_all(source_by_root: dict[str, DataFrame],
                specs: dict[str, TableSpec],
                include_alterid: bool = False) -> dict[str, DataFrame]:
    """Run every spec whose root collection is present in the source map.
    One nested read per root entity serves all its Primary+Derived tables
    (the reference re-queries Tally per table; SURVEY §3.1)."""
    out = {}
    for name, spec in specs.items():
        root = spec.collection.split(".")[0]
        if root in source_by_root:
            out[name] = extract_table(source_by_root[root], spec,
                                      include_alterid,
                                      masters=source_by_root)
    return out
