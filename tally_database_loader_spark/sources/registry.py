"""Schema registry: the single source of truth for the 22-table Tally
relational model and for user-extended table specs.

The reference declares its schema twice — YAML logical spec
(reference tally-export-config.yaml, parsed at src/definition.mts:28-48)
and SQL DDL (database-structure.sql), even re-parsing the DDL text at
runtime to recover types (src/database.mts:741-790). Here one registry
owns the logical types and derives Spark ``StructType``/DDL from them
(SURVEY §1.3).

Logical types are exactly the reference's 8 (README.md:295-300; dispatch
src/tally.mts:660-679):

    text, logical, date, number, amount, quantity, rate, custom

with the reference's physical conventions (database-structure.sql):
amount → DECIMAL(17,2) signed Credit=+/Debit=−, quantity → DECIMAL(15,4)
signed Inward=+/Outward=−, rate → DECIMAL(15,4) ≥ 0, logical stored 0/1.

Specs remain user-extensible: ``load_yaml_spec`` accepts documents in the
same shape as the reference YAML (master/transaction lists of
{name, collection, nature, fields, filters, cascade_update, cascade_delete}),
so users bring custom Tally fields without code changes
(reference README.md:279-289).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# logical type → (Spark type, DDL type) per reference database-structure.sql
_TYPE_MAP: dict[str, tuple[T.DataType, str]] = {
    "text": (T.StringType(), "nvarchar(1024)"),
    "logical": (T.IntegerType(), "tinyint"),          # stored 0/1 for BI portability
    "date": (T.DateType(), "date"),
    "number": (T.LongType(), "int"),
    "amount": (T.DecimalType(17, 2), "decimal(17,2)"),
    "quantity": (T.DecimalType(15, 4), "decimal(15,4)"),
    "rate": (T.DecimalType(15, 4), "decimal(15,4)"),
    "custom": (T.StringType(), "nvarchar(1024)"),      # escape hatch; caller may override
}

# Per-dialect DDL type overrides (defaults = the mssql column of _TYPE_MAP).
# Mirrors the reference's platform DDL variants — see TableSpec.ddl().
_DDL_DIALECTS: dict[str, dict[str, str]] = {
    "mssql": {},
    "mysql": {"text": "varchar(1024)", "custom": "varchar(1024)"},
    "postgres": {"text": "varchar(1024)", "custom": "varchar(1024)",
                 "logical": "smallint"},
    "bigquery": {"text": "string(1024)", "custom": "string(1024)"},
}


@dataclass
class FieldSpec:
    """One output column: logical name, source expression (TDL-subset,
    compiled by functions/tdl.py), logical type."""
    name: str
    expr: str
    type: str = "text"

    def spark_type(self) -> T.DataType:
        return _TYPE_MAP[self.type][0]


@dataclass
class TableSpec:
    """One output table (reference src/definition.mts:28-48).

    nature 'Primary' = a root Tally collection; 'Derived' = un-nesting of a
    collection-valued path of a Primary row (SURVEY §1.1). ``collection``
    is the dotted path (e.g. ``Voucher.AllLedgerEntries``); each extra
    segment is one explode level. ``cascade_update``/``cascade_delete``
    drive the incremental engine (operators/incremental.py).
    """
    name: str
    collection: str
    fields: list[FieldSpec]
    nature: str = "Primary"
    filters: list[str] = field(default_factory=list)
    fetch: list[str] = field(default_factory=list)
    cascade_update: dict[str, str] = field(default_factory=dict)   # child_col -> parent_table.col
    cascade_delete: dict[str, str] = field(default_factory=dict)   # child_table -> fk_col
    # YAML section: 'master' | 'transaction' | '' (derive from collection).
    # Masters and vouchers advance on INDEPENDENT Tally AlterId counters
    # ($AltMstId / $AltVchId, reference src/tally.mts:114-128), so the
    # incremental engine keeps one watermark per group.
    group: str = ""

    def watermark_group(self) -> str:
        """'transaction' for Voucher-rooted tables, else 'master' — the
        reference's section split (its one master-section trn_* table,
        trn_closingstock_ledger, is Ledger-rooted and lands in 'master'
        here too)."""
        if self.group:
            if self.group not in ("master", "transaction"):
                # a directly-constructed TableSpec can carry any string;
                # fail here with the field named rather than as an
                # unexplained KeyError inside incremental_sync_frames'
                # by_group dict (ADVICE r4)
                raise ValueError(
                    f"TableSpec {self.name!r}: group must be 'master' or "
                    f"'transaction', got {self.group!r}")
            return self.group
        return ("transaction" if self.collection.split(".")[0] == "Voucher"
                else "master")

    def struct_type(self, include_alterid: bool = False) -> T.StructType:
        fields = [T.StructField(f.name, f.spark_type(), True) for f in self.fields]
        if include_alterid:
            fields.append(T.StructField("alterid", T.LongType(), True))
        return T.StructType(fields)

    def ddl(self, dialect: str = "mssql") -> str:
        """Generate the CREATE TABLE for one of the reference's four DDL
        dialects — the schema registry is the single source of truth, so
        DDL is derived, never parsed back (SURVEY §1.3, A6).

        Dialect type differences mirror the reference's platform DDLs:
        text is nvarchar on mssql (database-structure.sql:9-12), varchar
        on mysql/postgres (platform/{mysql,postgresql}/database-structure.sql),
        string on bigquery (platform/google-bigquery/database-structure.sql:3);
        logical is tinyint everywhere except postgres' smallint
        (platform/postgresql/database-structure.sql:13-16); date and the
        decimal(17,2)/(15,4) money/quantity types agree across dialects.
        """
        if dialect not in _DDL_DIALECTS:
            raise ValueError(f"unknown DDL dialect {dialect!r}; "
                             f"expected one of {sorted(_DDL_DIALECTS)}")
        overrides = _DDL_DIALECTS[dialect]
        cols = ",\n  ".join(
            f"{f.name} {overrides.get(f.type, _TYPE_MAP[f.type][1])}"
            for f in self.fields)
        return f"create table {self.name} (\n  {cols}\n);"


def _f(name: str, expr: str | None = None, type: str = "text") -> FieldSpec:
    return FieldSpec(name, expr if expr is not None else f"${name.title().replace('_', '')}", type)


def _cols(pairs: list[tuple[str, str]]) -> list[FieldSpec]:
    return [_f(n, None, t) for n, t in pairs]


def default_tables() -> dict[str, TableSpec]:
    """The 22-table model (reference database-structure.sql:1-255; schema
    summary FIXTURES.md). Column lists match the reference DDL; source
    expressions use the TDL-expression subset of functions/tdl.py."""
    g = "guid"
    specs = [
        TableSpec("mst_group", "Group", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("parent", "if $$IsEqual:$Parent:$$SysName:Primary then \"\" else $Parent"),
            _f("primary_group", "$_PrimaryGroup"),
            _f("is_revenue", "$IsRevenue", "logical"),
            _f("is_deemedpositive", "$IsDeemedPositive", "logical"),
            _f("is_reserved", "$IsReserved", "logical"),
            _f("affects_gross_profit", "$AffectsGrossProfit", "logical"),
            _f("sort_position", "$SortPosition", "number")]),
        TableSpec("mst_ledger", "Ledger", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("parent", "if $$IsEqual:$Parent:$$SysName:Primary then \"\" else $Parent"),
            _f("alias", "$_Alias"),
            _f("is_revenue", "$IsRevenue", "logical"),
            _f("is_deemedpositive", "$IsDeemedPositive", "logical"),
            _f("opening_balance", "$OpeningBalance", "amount"),
            *_cols([("description", "text"), ("mailing_name", "text"),
                    ("mailing_address", "text"), ("mailing_state", "text"),
                    ("mailing_country", "text"), ("mailing_pincode", "text"),
                    ("email", "text"), ("it_pan", "text"), ("gstn", "text"),
                    ("gst_registration_type", "text"), ("gst_supply_type", "text"),
                    ("gst_duty_head", "text")]),
            _f("tax_rate", "$TaxRate", "rate"),
            *_cols([("bank_account_holder", "text"), ("bank_account_number", "text"),
                    ("bank_ifsc", "text"), ("bank_swift", "text"),
                    ("bank_name", "text"), ("bank_branch", "text")])]),
        TableSpec("mst_vouchertype", "VoucherType", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("parent", "if $$IsEqual:$Parent:$$SysName:Primary then \"\" else $Parent"),
            _f("numbering_method", "$NumberingMethod"),
            _f("is_deemedpositive", "$IsDeemedPositive", "logical"),
            _f("affects_stock", "$AffectsStock", "logical")]),
        TableSpec("mst_uom", "Unit", [
            _f(g, "$Guid"), _f("name", "$Name"), _f("formalname", "$OriginalName"),
            _f("is_simple_unit", "$IsSimpleUnit", "logical"),
            _f("base_units", "$BaseUnits"), _f("additional_units", "$AdditionalUnits"),
            _f("conversion", "$Conversion", "number")]),
        TableSpec("mst_godown", "Godown", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("parent", "if $$IsEqual:$Parent:$$SysName:Primary then \"\" else $Parent"),
            _f("address", "$_Address")]),
        TableSpec("mst_stock_group", "StockGroup", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("parent", "if $$IsEqual:$Parent:$$SysName:Primary then \"\" else $Parent")]),
        TableSpec("mst_stock_item", "StockItem", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("parent", "if $$IsEqual:$Parent:$$SysName:Primary then \"\" else $Parent"),
            _f("alias", "$_Alias"), _f("part_number", "$PartNumber"),
            _f("uom", "$BaseUnits"), _f("alternate_uom", "$AdditionalUnits"),
            _f("conversion", "$Conversion", "number"),
            _f("opening_balance", "$OpeningBalance", "quantity"),
            _f("opening_rate", "$OpeningRate", "rate"),
            _f("opening_value", "$OpeningValue", "amount"),
            *_cols([("gst_type_of_supply", "text"), ("gst_hsn_code", "text"),
                    ("gst_hsn_description", "text")]),
            _f("gst_rate", "$GstRate", "number"),
            _f("gst_taxability", "$GstTaxability")]),
        TableSpec("mst_cost_category", "CostCategory", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("allocate_revenue", "$AllocateRevenue", "logical"),
            _f("allocate_non_revenue", "$AllocateNonRevenue", "logical")]),
        TableSpec("mst_cost_centre", "CostCentre", [
            _f(g, "$Guid"), _f("name", "$Name"),
            _f("parent", "if $$IsEqual:$Parent:$$SysName:Primary then \"\" else $Parent"),
            _f("category", "$Category")]),
        TableSpec("mst_gst_effective_rate", "StockItem.GstDetails", [
            _f("item", "..Name"), _f("applicable_from", "$ApplicableFrom", "date"),
            _f("hsn_description", "$HsnDescription"), _f("hsn_code", "$HsnCode"),
            _f("rate", "$Rate", "amount"),
            _f("is_rcm_applicable", "$IsRcmApplicable", "logical"),
            *_cols([("nature_of_transaction", "text"), ("nature_of_goods", "text"),
                    ("supply_type", "text"), ("taxability", "text")])],
            nature="Derived"),
        TableSpec("mst_opening_batch_allocation", "StockItem.BatchAllocations", [
            _f("item", "..Name"),
            _f("opening_balance", "$OpeningBalance", "quantity"),
            _f("opening_rate", "$OpeningRate", "rate"),
            _f("opening_value", "$OpeningValue", "amount"),
            _f("godown", "$GodownName"),
            _f("manufactured_on", "$MfdOn", "date")],
            nature="Derived"),
        TableSpec("mst_opening_bill_allocation", "Ledger.BillAllocations", [
            _f("ledger", "..Name"),
            _f("opening_balance", "$OpeningBalance", "amount"),
            _f("bill_date", "$BillDate", "date"), _f("name", "$Name")],
            nature="Derived"),
        TableSpec("trn_closingstock_ledger", "Ledger.ClosingStockValues", [
            _f("ledger", "..Name"),
            _f("stock_date", "$Date", "date"),
            _f("stock_value", "$Amount", "amount")],
            nature="Derived"),
        TableSpec("mst_stockitem_standard_cost", "StockItem.StandardCostList", [
            _f("item", "..Name"), _f("date", "$Date", "date"),
            _f("rate", "$Rate", "rate")], nature="Derived"),
        TableSpec("mst_stockitem_standard_price", "StockItem.StandardPriceList", [
            _f("item", "..Name"), _f("date", "$Date", "date"),
            _f("rate", "$Rate", "rate")], nature="Derived"),
        TableSpec("trn_voucher", "Voucher", [
            _f(g, "$Guid"), _f("date", "$Date", "date"),
            _f("voucher_type", "$VoucherTypeName"),
            _f("voucher_number", "$VoucherNumber"),
            _f("reference_number", "$Reference"),
            _f("reference_date", "$ReferenceDate", "date"),
            _f("narration", "$Narration"),
            _f("party_name", "$PartyLedgerName"),
            _f("place_of_supply", "$PlaceOfSupply"),
            _f("is_invoice", "$IsInvoice", "logical"),
            _f("is_accounting_voucher", "$IsAccounting", "logical"),
            _f("is_inventory_voucher", "$IsInventory", "logical"),
            _f("is_order_voucher", "$IsOrder", "logical")],
            filters=["NOT $IsCancelled", "NOT $IsOptional"]),
        TableSpec("trn_accounting", "Voucher.AllLedgerEntries", [
            _f(g, "..Guid"), _f("ledger", "$LedgerName"),
            _f("amount", "$Amount", "amount"),
            _f("amount_forex", "$ForexAmount", "amount"),
            _f("currency", "$Currency")],
            nature="Derived", cascade_update={"ledger": "mst_ledger.name"}),
        TableSpec("trn_inventory", "Voucher.AllInventoryEntries", [
            _f(g, "..Guid"), _f("item", "$StockItemName"),
            _f("quantity", "$ActualQty", "quantity"),
            _f("rate", "$Rate", "rate"),
            _f("amount", "$Amount", "amount"),
            _f("additional_amount", "$AddlAmount", "amount"),
            _f("discount_amount", "$Discount", "amount"),
            _f("godown", "$GodownName"),
            _f("tracking_number", "$TrackingNumber"),
            _f("order_number", "$OrderNumber"),
            _f("order_duedate", "$OrderDueDate", "date")],
            nature="Derived", cascade_update={"item": "mst_stock_item.name"}),
        TableSpec("trn_cost_centre", "Voucher.AllLedgerEntries.CategoryAllocations.CostCentreAllocations", [
            _f(g, "..Guid"), _f("ledger", "..LedgerName"),
            _f("costcentre", "$Name"), _f("amount", "$Amount", "amount")],
            nature="Derived"),
        TableSpec("trn_bill", "Voucher.AllLedgerEntries.BillAllocations", [
            _f(g, "..Guid"), _f("ledger", "..LedgerName"),
            _f("name", "$Name"), _f("amount", "$Amount", "amount"),
            _f("billtype", "$BillType")],
            nature="Derived"),
        TableSpec("trn_bank", "Voucher.AllLedgerEntries.BankAllocations", [
            _f(g, "..Guid"), _f("ledger", "..LedgerName"),
            _f("transaction_type", "$TransactionType"),
            _f("instrument_date", "$InstrumentDate", "date"),
            _f("instrument_number", "$InstrumentNumber"),
            _f("bank_name", "$BankName"),
            _f("amount", "$Amount", "amount"),
            _f("bankers_date", "$BankersDate", "date")],
            nature="Derived"),
        TableSpec("trn_batch", "Voucher.AllInventoryEntries.BatchAllocations", [
            _f(g, "..Guid"), _f("item", "..StockItemName"),
            _f("name", "$BatchName"),
            # reference tally-export-config.yaml:609-611: the batch
            # quantity is $ActualQty (signed Inward/Outward), NOT the
            # monetary $Amount
            _f("quantity", "$ActualQty", "quantity"),
            _f("amount", "$Amount", "amount"),
            _f("godown", "$GodownName"),
            _f("destination_godown", "$DestinationGodownName"),
            _f("tracking_number", "$TrackingNumber")],
            nature="Derived"),
        TableSpec("config", "Config", [
            _f("name", "$Name"), _f("value", "$Value")]),
    ]
    # cascade-delete edges: voucher children removed when their voucher goes
    # (reference tally-export-config-incremental.yaml:598-610)
    vch = next(s for s in specs if s.name == "trn_voucher")
    vch.cascade_delete = {t: "guid" for t in
                          ("trn_accounting", "trn_inventory", "trn_cost_centre",
                           "trn_bill", "trn_bank", "trn_batch")}
    led = next(s for s in specs if s.name == "mst_ledger")
    led.cascade_delete = {"mst_opening_bill_allocation": "ledger",
                          "trn_closingstock_ledger": "ledger"}
    return {s.name: s for s in specs}


def load_yaml_spec(text: str) -> dict[str, TableSpec]:
    """Parse a user spec in the reference YAML shape
    (master:/transaction: lists of table configs) into TableSpecs."""
    import yaml
    doc = yaml.safe_load(text)
    out: dict[str, TableSpec] = {}
    for section in ("master", "transaction"):
        for tbl in doc.get(section) or []:
            fields = [FieldSpec(f["name"], f["field"], f.get("type", "text"))
                      for f in tbl.get("fields", [])]
            out[tbl["name"]] = TableSpec(
                name=tbl["name"],
                collection=tbl["collection"],
                fields=fields,
                nature=tbl.get("nature", "Primary"),
                filters=tbl.get("filters") or [],
                fetch=tbl.get("fetch") or [],
                cascade_update=tbl.get("cascade_update") or {},
                cascade_delete=tbl.get("cascade_delete") or {},
                group=section,
            )
    return out
