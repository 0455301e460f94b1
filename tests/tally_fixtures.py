"""Deterministic nested-source fixtures shaped like Tally XML dumps.

One DataFrame per root entity (Group/Ledger/VoucherType/StockItem/Voucher/
...), with collection-valued fields as array<struct> — the hierarchical
model the reference flattens (docs/data-structure.md:5). Value conventions
match functions/tdl.py: amounts debit-negative at source, quantities
inward-positive, dates as ISO strings, logicals as 'Yes'/'No'.

The data covers the report edge cases FIXTURES.md calls for: order
vouchers to exclude, note-vs-invoice tracking workflows, blank and
non-blank tracking numbers, zero and non-zero openings, a 3-level group
chain, an Automatic-numbered voucher type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _df(spark: SparkSession, schema: str, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, schema=schema)


GROUP_SCHEMA = ("Guid string, Name string, Parent string, _PrimaryGroup string, "
                "IsRevenue string, IsDeemedPositive string, IsReserved string, "
                "AffectsGrossProfit string, SortPosition long, AlterId long")

LEDGER_SCHEMA = (
    "Guid string, Name string, Parent string, _Alias string, IsRevenue string, "
    "IsDeemedPositive string, OpeningBalance double, Description string, "
    "MailingName string, MailingAddress string, MailingState string, "
    "MailingCountry string, MailingPincode string, Email string, ItPan string, "
    "Gstn string, GstRegistrationType string, GstSupplyType string, "
    "GstDutyHead string, TaxRate double, BankAccountHolder string, "
    "BankAccountNumber string, BankIfsc string, BankSwift string, "
    "BankName string, BankBranch string, AlterId long, "
    "BillAllocations array<struct<OpeningBalance:double, BillDate:string, Name:string>>, "
    "ClosingStockValues array<struct<Date:string, Amount:double>>")

VT_SCHEMA = ("Guid string, Name string, Parent string, NumberingMethod string, "
             "IsDeemedPositive string, AffectsStock string, AlterId long")

STOCKITEM_SCHEMA = (
    "Guid string, Name string, Parent string, _Alias string, PartNumber string, "
    "BaseUnits string, AdditionalUnits string, Conversion long, "
    "OpeningBalance double, OpeningRate double, OpeningValue double, "
    "GstTypeOfSupply string, GstHsnCode string, GstHsnDescription string, "
    "GstRate long, GstTaxability string, AlterId long, "
    "GstDetails array<struct<ApplicableFrom:string, HsnDescription:string, HsnCode:string, "
    "Rate:double, IsRcmApplicable:string, NatureOfTransaction:string, NatureOfGoods:string, "
    "SupplyType:string, Taxability:string>>, "
    "BatchAllocations array<struct<OpeningBalance:double, OpeningRate:double, "
    "OpeningValue:double, GodownName:string, MfdOn:string>>, "
    "StandardCostList array<struct<Date:string, Rate:double>>, "
    "StandardPriceList array<struct<Date:string, Rate:double>>")

VOUCHER_SCHEMA = (
    "Guid string, Date string, VoucherTypeName string, VoucherNumber string, "
    "Reference string, ReferenceDate string, Narration string, "
    "PartyLedgerName string, PlaceOfSupply string, IsInvoice string, "
    "IsAccounting string, IsInventory string, IsOrder string, "
    "IsCancelled string, IsOptional string, AlterId long, "
    "AllLedgerEntries array<struct<LedgerName:string, Amount:double, "
    "ForexAmount:double, Currency:string, "
    "CategoryAllocations:array<struct<Category:string, "
    "CostCentreAllocations:array<struct<Name:string, Amount:double>>>>, "
    "BillAllocations:array<struct<Name:string, Amount:double, BillType:string>>, "
    "BankAllocations:array<struct<TransactionType:string, InstrumentDate:string, "
    "InstrumentNumber:string, BankName:string, Amount:double, BankersDate:string>>>>, "
    "AllInventoryEntries array<struct<StockItemName:string, ActualQty:string, "
    "Rate:double, Amount:double, AddlAmount:double, Discount:double, "
    "GodownName:string, TrackingNumber:string, OrderNumber:string, OrderDueDate:string, "
    "BatchAllocations:array<struct<BatchName:string, ActualQty:string, Amount:double, GodownName:string, "
    "DestinationGodownName:string, TrackingNumber:string>>>>")

SIMPLE_SCHEMAS = {
    "Unit": ("Guid string, Name string, OriginalName string, IsSimpleUnit string, "
             "BaseUnits string, AdditionalUnits string, Conversion long, AlterId long"),
    "Godown": "Guid string, Name string, Parent string, _Address string, AlterId long",
    "StockGroup": "Guid string, Name string, Parent string, AlterId long",
    "CostCategory": ("Guid string, Name string, AllocateRevenue string, "
                     "AllocateNonRevenue string, AlterId long"),
    "CostCentre": "Guid string, Name string, Parent string, Category string, AlterId long",
}


def _led(guid, name, parent, opening=0.0, alter=1, gstn="", bills=None, closing=None,
         is_revenue="No"):
    return dict(Guid=guid, Name=name, Parent=parent, _Alias="", IsRevenue=is_revenue,
                IsDeemedPositive="No", OpeningBalance=opening, Description="",
                MailingName=name, MailingAddress="", MailingState="", MailingCountry="",
                MailingPincode="", Email="", ItPan="", Gstn=gstn,
                GstRegistrationType="", GstSupplyType="", GstDutyHead="",
                TaxRate=0.0, BankAccountHolder="", BankAccountNumber="",
                BankIfsc="", BankSwift="", BankName="", BankBranch="",
                AlterId=alter, BillAllocations=bills or [], ClosingStockValues=closing or [])


def _vch(guid, date, vtype, number, party="", alter=1, ledger_entries=(),
         inventory_entries=(), is_invoice="No", is_acc="Yes", is_inv="No",
         is_order="No", narration=""):
    entries = [dict(LedgerName=ln, Amount=amt, ForexAmount=0.0, Currency="INR",
                    CategoryAllocations=cats or [], BillAllocations=bills or [],
                    BankAllocations=banks or [])
               for (ln, amt, cats, bills, banks) in ledger_entries]
    inv = [dict(StockItemName=it, ActualQty=qty, Rate=rate, Amount=amt,
                AddlAmount=0.0, Discount=0.0, GodownName=gd, TrackingNumber=trk,
                OrderNumber="", OrderDueDate="", BatchAllocations=batches or [])
           for (it, qty, rate, amt, gd, trk, batches) in inventory_entries]
    return dict(Guid=guid, Date=date, VoucherTypeName=vtype, VoucherNumber=number,
                Reference="", ReferenceDate="", Narration=narration,
                PartyLedgerName=party, PlaceOfSupply="", IsInvoice=is_invoice,
                IsAccounting=is_acc, IsInventory=is_inv, IsOrder=is_order,
                IsCancelled="No", IsOptional="No", AlterId=alter,
                AllLedgerEntries=entries, AllInventoryEntries=inv)


def tally_source(spark: SparkSession) -> dict[str, DataFrame]:
    """Build the nested-source fixture (root entity → DataFrame)."""
    groups = [
        dict(Guid="g-001", Name="Sales Accounts", Parent="Primary",
             _PrimaryGroup="Sales Accounts", IsRevenue="Yes", IsDeemedPositive="No",
             IsReserved="Yes", AffectsGrossProfit="Yes", SortPosition=10, AlterId=1),
        dict(Guid="g-002", Name="Purchase Accounts", Parent="Primary",
             _PrimaryGroup="Purchase Accounts", IsRevenue="Yes", IsDeemedPositive="Yes",
             IsReserved="Yes", AffectsGrossProfit="Yes", SortPosition=20, AlterId=2),
        dict(Guid="g-003", Name="Cash-in-hand", Parent="Primary",
             _PrimaryGroup="Cash-in-hand", IsRevenue="No", IsDeemedPositive="Yes",
             IsReserved="Yes", AffectsGrossProfit="No", SortPosition=30, AlterId=3),
        dict(Guid="g-004", Name="Stock-in-hand", Parent="Primary",
             _PrimaryGroup="Stock-in-hand", IsRevenue="No", IsDeemedPositive="Yes",
             IsReserved="Yes", AffectsGrossProfit="No", SortPosition=40, AlterId=4),
        dict(Guid="g-005", Name="Indirect Expenses", Parent="Primary",
             _PrimaryGroup="Indirect Expenses", IsRevenue="Yes", IsDeemedPositive="Yes",
             IsReserved="Yes", AffectsGrossProfit="No", SortPosition=50, AlterId=5),
        dict(Guid="g-006", Name="Sundry Debtors", Parent="Primary",
             _PrimaryGroup="Sundry Debtors", IsRevenue="No", IsDeemedPositive="Yes",
             IsReserved="Yes", AffectsGrossProfit="No", SortPosition=60, AlterId=6),
        dict(Guid="g-007", Name="Loans & Advances (Asset)", Parent="Primary",
             _PrimaryGroup="Loans & Advances (Asset)", IsRevenue="No",
             IsDeemedPositive="Yes", IsReserved="Yes", AffectsGrossProfit="No",
             SortPosition=70, AlterId=7),
        dict(Guid="g-008", Name="Staff Loans", Parent="Loans & Advances (Asset)",
             _PrimaryGroup="Loans & Advances (Asset)", IsRevenue="No",
             IsDeemedPositive="Yes", IsReserved="No", AffectsGrossProfit="No",
             SortPosition=80, AlterId=8),
        dict(Guid="g-009", Name="Vehicle Loans", Parent="Staff Loans",
             _PrimaryGroup="Loans & Advances (Asset)", IsRevenue="No",
             IsDeemedPositive="Yes", IsReserved="No", AffectsGrossProfit="No",
             SortPosition=90, AlterId=9),
    ]
    ledgers = [
        _led("l-001", "Cash", "Cash-in-hand", opening=-1000.0, alter=1),
        _led("l-002", "Sales Local", "Sales Accounts", alter=2, is_revenue="Yes"),
        _led("l-003", "Purchase Local", "Purchase Accounts", alter=3, is_revenue="Yes"),
        _led("l-004", "Rent", "Indirect Expenses", alter=4, is_revenue="Yes"),
        _led("l-005", "Stock Ledger", "Stock-in-hand", opening=-500.0, alter=5,
             closing=[dict(Date="2020-06-30", Amount=-800.0),
                      dict(Date="2021-03-31", Amount=-900.0)]),
        _led("l-006", "Party X", "Sundry Debtors", opening=-250.0, alter=6,
             gstn="29AAAAA0000A1Z5",
             bills=[dict(OpeningBalance=-250.0, BillDate="2020-03-01", Name="OB-1")]),
        _led("l-007", "Party Y", "Sundry Debtors", alter=7, gstn="27BBBBB1111B2Z6"),
        _led("l-008", "Staff Advance", "Staff Loans", opening=-100.0, alter=8),
    ]
    vtypes = [
        dict(Guid="vt-01", Name="Sales", Parent="Sales", NumberingMethod="Manual",
             IsDeemedPositive="No", AffectsStock="No", AlterId=1),
        dict(Guid="vt-02", Name="Purchase", Parent="Purchase", NumberingMethod="Manual",
             IsDeemedPositive="Yes", AffectsStock="No", AlterId=2),
        dict(Guid="vt-03", Name="Receipt", Parent="Receipt", NumberingMethod="Manual",
             IsDeemedPositive="Yes", AffectsStock="No", AlterId=3),
        dict(Guid="vt-04", Name="Payment", Parent="Payment", NumberingMethod="Manual",
             IsDeemedPositive="No", AffectsStock="No", AlterId=4),
        dict(Guid="vt-05", Name="Contra", Parent="Contra", NumberingMethod="Manual",
             IsDeemedPositive="Yes", AffectsStock="No", AlterId=5),
        dict(Guid="vt-06", Name="Receipt Note", Parent="Receipt Note",
             NumberingMethod="Manual", IsDeemedPositive="Yes", AffectsStock="Yes", AlterId=6),
        dict(Guid="vt-07", Name="Delivery Note", Parent="Delivery Note",
             NumberingMethod="Manual", IsDeemedPositive="No", AffectsStock="Yes", AlterId=7),
        dict(Guid="vt-08", Name="Sales Order", Parent="Sales Order",
             NumberingMethod="Manual", IsDeemedPositive="No", AffectsStock="No", AlterId=8),
        dict(Guid="vt-09", Name="Journal", Parent="Journal",
             NumberingMethod="Automatic", IsDeemedPositive="Yes", AffectsStock="No", AlterId=9),
    ]
    items = [
        dict(Guid="si-01", Name="Item A", Parent="SG Main", _Alias="", PartNumber="PA-1",
             BaseUnits="nos", AdditionalUnits="", Conversion=0,
             OpeningBalance=2.0, OpeningRate=10.0, OpeningValue=-20.0,
             GstTypeOfSupply="Goods", GstHsnCode="9403", GstHsnDescription="Furniture",
             GstRate=18, GstTaxability="Taxable", AlterId=1,
             GstDetails=[dict(ApplicableFrom="2020-04-01", HsnDescription="Furniture",
                              HsnCode="9403", Rate=18.0, IsRcmApplicable="No",
                              NatureOfTransaction="", NatureOfGoods="", SupplyType="",
                              Taxability="Taxable")],
             BatchAllocations=[dict(OpeningBalance=2.0, OpeningRate=10.0,
                                    OpeningValue=-20.0, GodownName="Main",
                                    MfdOn="2020-01-15")],
             StandardCostList=[dict(Date="2020-04-01", Rate=9.0)],
             StandardPriceList=[dict(Date="2020-04-01", Rate=12.0)]),
        dict(Guid="si-02", Name="Item B", Parent="SG Main", _Alias="B", PartNumber="PB-1",
             BaseUnits="nos", AdditionalUnits="box", Conversion=10,
             OpeningBalance=0.0, OpeningRate=0.0, OpeningValue=0.0,
             GstTypeOfSupply="Goods", GstHsnCode="9401", GstHsnDescription="Seats",
             GstRate=12, GstTaxability="Taxable", AlterId=2,
             GstDetails=[], BatchAllocations=[], StandardCostList=[],
             StandardPriceList=[]),
    ]
    vouchers = [
        # pre-period sale (feeds opening balances of trial balance)
        _vch("v-001", "2020-03-15", "Sales", "S-001", party="Party X", alter=1,
             ledger_entries=[("Party X", -1000.0, None, [dict(Name="B-1", Amount=-1000.0,
                                                              BillType="New Ref")], None),
                             ("Sales Local", 1000.0, None, None, None)],
             is_invoice="Yes"),
        # in-period sales
        _vch("v-002", "2020-04-10", "Sales", "S-002", party="Party X", alter=2,
             ledger_entries=[("Party X", -500.0, None, None, None),
                             ("Sales Local", 500.0, None, None, None)], is_invoice="Yes"),
        _vch("v-003", "2020-05-05", "Purchase", "P-001", party="Party Y", alter=3,
             ledger_entries=[("Purchase Local", -300.0, None, None, None),
                             ("Party Y", 300.0, None, None, None)], is_invoice="Yes"),
        # cash receipt / payment / contra
        _vch("v-004", "2020-05-20", "Receipt", "R-001", alter=4,
             ledger_entries=[("Cash", -500.0, None, None,
                              [dict(TransactionType="Cheque", InstrumentDate="2020-05-20",
                                    InstrumentNumber="123456", BankName="State Bank",
                                    Amount=-500.0, BankersDate="2020-05-21")]),
                             ("Party X", 500.0, None, None, None)]),
        _vch("v-005", "2020-06-01", "Payment", "PAY-001", alter=5,
             ledger_entries=[("Rent", -200.0,
                              [dict(Category="Primary Cost Category",
                                    CostCentreAllocations=[dict(Name="HO", Amount=-200.0)])],
                              None, None),
                             ("Cash", 200.0, None, None, None)]),
        _vch("v-006", "2020-06-15", "Contra", "C-001", alter=6,
             ledger_entries=[("Cash", -50.0, None, None, None),
                             ("Cash", 50.0, None, None, None)]),
        # order voucher — must be EXCLUDED by every report
        _vch("v-007", "2020-07-01", "Sales Order", "SO-001", party="Party X", alter=7,
             ledger_entries=[("Party X", -999.0, None, None, None),
                             ("Sales Local", 999.0, None, None, None)],
             is_acc="No", is_order="Yes"),
        # tracking workflow: receipt note + purchase invoice (note == invoice)
        _vch("v-008", "2020-08-01", "Receipt Note", "RN-001", alter=8,
             inventory_entries=[("Item A", "10 nos", 10.0, -100.0, "Main", "TRK1", None)],
             is_acc="No", is_inv="Yes"),
        _vch("v-009", "2020-08-05", "Purchase", "P-002", party="Party Y", alter=9,
             ledger_entries=[("Purchase Local", -100.0, None, None, None),
                             ("Party Y", 100.0, None, None, None)],
             inventory_entries=[("Item A", "10 nos", 10.0, -100.0, "Main", "TRK1",
                                 [dict(BatchName="BATCH-1", ActualQty="10 nos",
                                       Amount=10.0, GodownName="Main",
                                       DestinationGodownName="", TrackingNumber="TRK1")])],
             is_invoice="Yes"),
        # delivery note with NO invoice yet (note > invoice ⇒ note counts)
        _vch("v-010", "2020-09-01", "Delivery Note", "DN-001", alter=10,
             inventory_entries=[("Item A", "-5 nos", 12.0, 60.0, "Main", "TRK2", None)],
             is_acc="No", is_inv="Yes"),
        # untracked inventory sale
        _vch("v-011", "2020-10-01", "Sales", "S-003", party="Party Y", alter=11,
             ledger_entries=[("Party Y", -36.0, None, None, None),
                             ("Sales Local", 36.0, None, None, None)],
             inventory_entries=[("Item B", "-3 nos", 12.0, 36.0, "Main", "", None)],
             is_invoice="Yes", is_inv="Yes"),
        # auto-numbered journal
        _vch("v-012", "2021-01-15", "Journal", "1", alter=12,
             ledger_entries=[("Staff Advance", -75.0, None, None, None),
                             ("Cash", 75.0, None, None, None)]),
    ]
    units = [dict(Guid="u-01", Name="nos", OriginalName="Numbers", IsSimpleUnit="Yes",
                  BaseUnits="", AdditionalUnits="", Conversion=0, AlterId=1),
             dict(Guid="u-02", Name="box", OriginalName="Box of 10", IsSimpleUnit="No",
                  BaseUnits="nos", AdditionalUnits="", Conversion=10, AlterId=2)]
    godowns = [dict(Guid="gd-01", Name="Main", Parent="Primary", _Address="HQ", AlterId=1),
               dict(Guid="gd-02", Name="Annex", Parent="Main", _Address="", AlterId=2)]
    sgroups = [dict(Guid="sg-01", Name="SG Main", Parent="Primary", AlterId=1),
               dict(Guid="sg-02", Name="SG Sub", Parent="SG Main", AlterId=2)]
    ccats = [dict(Guid="cc-01", Name="Primary Cost Category", AllocateRevenue="Yes",
                  AllocateNonRevenue="No", AlterId=1)]
    ccentres = [dict(Guid="cn-01", Name="HO", Parent="Primary",
                     Category="Primary Cost Category", AlterId=1)]
    cfg = [dict(Name="Update Timestamp", Value="2021-04-01 00:00:00"),
           dict(Name="Company Name", Value="Test Co"),
           dict(Name="Period From", Value="2020-04-01"),
           dict(Name="Period To", Value="2021-03-31")]

    return {
        "Group": _df(spark, GROUP_SCHEMA, groups),
        "Ledger": _df(spark, LEDGER_SCHEMA, ledgers),
        "VoucherType": _df(spark, VT_SCHEMA, vtypes),
        "StockItem": _df(spark, STOCKITEM_SCHEMA, items),
        "Voucher": _df(spark, VOUCHER_SCHEMA, vouchers),
        "Unit": _df(spark, SIMPLE_SCHEMAS["Unit"], units),
        "Godown": _df(spark, SIMPLE_SCHEMAS["Godown"], godowns),
        "StockGroup": _df(spark, SIMPLE_SCHEMAS["StockGroup"], sgroups),
        "CostCategory": _df(spark, SIMPLE_SCHEMAS["CostCategory"], ccats),
        "CostCentre": _df(spark, SIMPLE_SCHEMAS["CostCentre"], ccentres),
        "Config": _df(spark, "Name string, Value string", cfg),
    }
