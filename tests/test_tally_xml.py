"""Tally XML source tests (SURVEY §2.A1-A3): TDL program compilation,
parameter substitution, and distributed response parsing."""

from __future__ import annotations

import datetime
import decimal

import pytest

from tally_database_loader_spark.sources.registry import (
    FieldSpec, TableSpec, default_tables,
)
from tally_database_loader_spark.sources.tally_xml import (
    auto_dates, generate_tdl_xml, read_tdl_response, substitute_parameters,
)

LEDGER_SPEC = TableSpec("mst_test", "Ledger", [
    FieldSpec("guid", "$Guid"),
    FieldSpec("name", "$Name"),
    FieldSpec("opening_balance", "$OpeningBalance", "amount"),
    FieldSpec("first_date", "$FirstDate", "date"),
    FieldSpec("is_revenue", "$IsRevenue", "logical"),
], filters=["NOT $IsCancelled"])


def _response_xml() -> str:
    """A Tally TDL response in the wire shape the reference rewrites at
    src/tally.mts:514-539: rows as <F01>..</F01><F02>..</F02> runs inside
    one ENVELOPE, with entities, blank dates (ñ) and negative amounts."""
    rows = [
        ("g-001", "Cash &amp; Bank", "1200.50", "2024-04-01", "0"),
        ("g-002", "Sharma &lt;Traders&gt;", "-99.25", "ñ", "1"),
        ("g-003", "O&apos;Brien &quot;Exports&quot;", "0.00", "2024-07-15", "0"),
    ]
    body = "\r\n".join(
        f"  <F01>{r[0]}</F01><F02>{r[1]}</F02><F03>{r[2]}</F03>"
        f"<F04>{r[3]}</F04><F05>{r[4]}</F05>" for r in rows)
    return f"<ENVELOPE>\r\n{body}\r\n</ENVELOPE>"


def test_read_tdl_response(spark, tmp_path):
    p = tmp_path / "resp.xml"
    p.write_text(_response_xml(), encoding="utf-8")
    df = read_tdl_response(spark, str(p), LEDGER_SPEC)
    assert [f.name for f in df.schema.fields] == \
           ["guid", "name", "opening_balance", "first_date", "is_revenue"]
    got = {r["guid"]: r for r in df.collect()}
    assert len(got) == 3
    assert got["g-001"]["name"] == "Cash & Bank"            # entity unescape
    assert got["g-002"]["name"] == "Sharma <Traders>"
    assert got["g-003"]["name"] == 'O\'Brien "Exports"'
    assert got["g-002"]["first_date"] is None               # ñ sentinel → NULL
    assert got["g-001"]["first_date"] == datetime.date(2024, 4, 1)
    assert got["g-002"]["opening_balance"] == decimal.Decimal("-99.25")
    assert got["g-002"]["is_revenue"] == 1


def test_read_tdl_response_is_distributed(spark, tmp_path):
    """The parse must not hinge on a single record/partition: a many-row
    response still yields exactly one DataFrame row per source row."""
    rows = "\r\n".join(
        f"<F01>g-{i:05d}</F01><F02>L{i}</F02><F03>{i}.00</F03>"
        f"<F04>ñ</F04><F05>0</F05>" for i in range(5000))
    p = tmp_path / "big.xml"
    p.write_text(f"<ENVELOPE>\r\n{rows}\r\n</ENVELOPE>", encoding="utf-8")
    df = read_tdl_response(spark, str(p), LEDGER_SPEC)
    assert df.count() == 5000
    assert df.filter("first_date is not null").count() == 0


def test_generate_tdl_xml_nesting_and_filters():
    spec = default_tables()["trn_bank"]  # 3-level nested collection
    xml = generate_tdl_xml(spec, company="Demo & Co")
    # one PART per nesting level: root + AllLedgerEntries + BankAllocations
    assert xml.count("<PART NAME=") == 3
    assert "MyLine01 : MyCollection" in xml
    assert "MyLine02 : AllLedgerEntries" in xml
    assert "MyLine03 : BankAllocations" in xml
    assert "<TYPE>Voucher</TYPE>" in xml
    assert "Demo &amp; Co" in xml
    v = generate_tdl_xml(default_tables()["trn_voucher"])
    assert '<SYSTEM TYPE="Formulae" NAME="Fltr01">NOT $IsCancelled</SYSTEM>' in v
    assert "<SVCURRENTCOMPANY>" not in v                    # no company given
    # date fields carry the ñ-sentinel TDL encoding
    assert "$$StrByCharCode:241" in v


def test_substitute_parameters():
    xml = "<A>{fromDate}</A><B>{flag}</B><C>{company}</C><D>{n}</D>"
    out = substitute_parameters(xml, {
        "fromDate": datetime.date(2024, 4, 1),
        "flag": True,
        "company": 'P&L "Demo"',
        "n": 42,
    })
    assert "<A>1-Apr-2024</A>" in out                       # d-MMM-yyyy
    assert "<B>Yes</B>" in out
    assert "&amp;" in out and "42" in out


def test_auto_dates(spark):
    df = spark.createDataFrame(
        [("g1", datetime.date(2024, 5, 2)), ("g2", datetime.date(2023, 4, 1))],
        "guid string, date date")
    assert auto_dates(df) == ("2023-04-01", "2024-05-02")


def test_ddl_generation_all_dialects():
    """DDL derives from the registry for each reference dialect variant
    (reference platform/{mysql,postgresql,google-bigquery} + root mssql
    DDL) — dialect-specific types land, unknown dialects are rejected."""
    import pytest
    from tally_database_loader_spark.sources.registry import default_tables
    tables = default_tables()
    assert len(tables) >= 22
    grp = tables["mst_group"]
    assert "name nvarchar(1024)" in grp.ddl("mssql")
    assert "name varchar(1024)" in grp.ddl("mysql")
    assert "is_revenue tinyint" in grp.ddl("mysql")
    assert "is_revenue smallint" in grp.ddl("postgres")
    assert "name string(1024)" in grp.ddl("bigquery")
    led = tables["mst_ledger"].ddl("postgres")
    assert "opening_balance decimal(17,2)" in led
    for spec in tables.values():
        for d in ("mssql", "mysql", "postgres", "bigquery"):
            assert spec.ddl(d).startswith(f"create table {spec.name}")
    with pytest.raises(ValueError, match="unknown DDL dialect"):
        grp.ddl("oracle")


def test_live_http_fetch_roundtrip(spark, tmp_path):
    """A1 live half: POST the compiled TDL program to a (stub) Tally XML
    server and parse the response distributed — asserts the UTF-16LE
    request body convention (reference src/tally.mts:448-490) and the
    typed result."""
    import http.server
    import threading

    from tally_database_loader_spark.sources.tally_http import (
        fetch_table, is_tally_reachable, post_tally_xml)

    response = _response_xml()
    received = {}

    class StubTally(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received["body"] = self.rfile.read(n)
            received["ctype"] = self.headers["Content-Type"]
            payload = response.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # tally-status probe
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), StubTally)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        assert is_tally_reachable(url)
        df = fetch_table(spark, LEDGER_SPEC, url=url,
                         subs={"targetCompany": "##SVCurrentCompany"},
                         stage_dir=str(tmp_path))
        got = {r["guid"]: r for r in df.collect()}
        assert len(got) == 3 and got["g-002"]["first_date"] is None
        # the request carried the compiled TDL program, UTF-16LE encoded
        sent = received["body"].decode("utf-16le")
        assert "<REPORT" in sent and "$OpeningBalance" in sent
        assert "utf-16" in received["ctype"]
        # raw POST helper returns the body verbatim
        assert post_tally_xml(url, "<x/>") == response
    finally:
        srv.shutdown()
    assert not is_tally_reachable("http://127.0.0.1:1", timeout=0.5)


def test_tally_datasource_pushdown_and_slicing(spark, tmp_path):
    """spark.read.format('tally'): Catalyst predicates reach pushFilters and
    compile into TDL <FILTER> formulae; live mode extracts year slices as
    parallel partitions (one POST each); dump mode reads response files."""
    import http.server
    import threading

    from pyspark.sql import functions as F
    from tally_database_loader_spark.sources import tally_datasource

    tally_datasource.register(spark)
    response = _response_xml()
    posts = []

    class StubTally(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            posts.append(self.rfile.read(n).decode("utf-16le"))
            payload = response.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), StubTally)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        # live mode, 2 year slices, one pushed filter -------------------
        # mst_ledger's spec has name/parent/... fields; our canned response
        # only matches the first 5 columns — enough to assert plumbing.
        df = (spark.read.format("tally")
              .option("table", "mst_vouchertype")
              .option("url", url)
              .option("from_date", "2020-04-01")
              .option("to_date", "2021-03-31")
              .load()
              .filter(F.col("name") == "Journal"))
        rows = df.collect()
        # the pushed EqualTo must appear as a TDL IsEqual filter clause in
        # EVERY posted program, and two year-slices => two POSTs
        assert len(posts) == 2
        assert all('$$IsEqual:$Name:"Journal"' in p for p in posts)
        assert all("SVFROMDATE" in p for p in posts)
        # canned response rows don't contain 'Journal' in the name column,
        # so the locally re-applied filter yields 0 rows — correctness is
        # preserved even though the stub server ignored <FILTER>
        assert rows == []
    finally:
        srv.shutdown()

    # dump mode: one file = one partition, typed decode -----------------
    d = tmp_path / "dumps"
    d.mkdir()
    (d / "part1.xml").write_text(_response_xml(), encoding="utf-8")
    got = (spark.read.format("tally")
           .option("table", "mst_vouchertype")
           .option("path", str(d))
           .load().collect())
    assert len(got) == 3
    by_guid = {r[0]: r for r in got}
    assert by_guid["g-002"][1] == "Sharma <Traders>"  # entity unescape


def test_tdl_formula_literal_safety():
    """Only safely-renderable literals compile into TDL formulae; dates,
    quote-bearing strings and booleans stay client-side (a malformed
    pushed formula could over-filter rows the re-check can never
    restore)."""
    import datetime

    from pyspark.sql.datasource import EqualTo, GreaterThan, In
    from tally_database_loader_spark.sources.registry import default_tables
    from tally_database_loader_spark.sources.tally_datasource import \
        _tdl_formula

    spec = default_tables()["mst_vouchertype"]
    # plain string literals on TEXT fields render
    assert _tdl_formula(spec, EqualTo(("name",), "Journal")) \
        == '$$IsEqual:$Name:"Journal"'
    # NON-TEXT fields never push: their <SET> encodings rewrite the raw
    # value (logical Yes/No → 1/0 here), so a raw-field server formula
    # evaluates against different values than Spark's predicate over the
    # encoded output — `$AffectsStock > 0` would compare Yes/No to 0 and
    # over-filter rows the client re-check can never restore
    assert _tdl_formula(spec, GreaterThan(("affects_stock",), 0)) is None
    assert _tdl_formula(spec, EqualTo(("affects_stock",), 1)) is None
    # a date would render as unquoted arithmetic (1995-1-1) — rejected
    assert _tdl_formula(
        spec, GreaterThan(("name",), datetime.date(1995, 1, 1))) is None
    # an embedded double quote would break out of the formula — rejected
    assert _tdl_formula(spec, EqualTo(("name",), 'a"b')) is None
    assert _tdl_formula(spec, In(("name",), ("ok", 'a"b'))) is None
    # XML metacharacters would corrupt the <SYSTEM> element — rejected
    assert _tdl_formula(spec, EqualTo(("name",), "A&B Ltd")) is None
    assert _tdl_formula(spec, EqualTo(("name",), "Sharma <Traders>")) is None
    # booleans have no TDL literal form — rejected
    assert _tdl_formula(spec, EqualTo(("affects_stock",), True)) is None
    # computed-expression fields (mst_vouchertype.parent is an if/then
    # normalization) cannot be pasted into a formula — rejected
    assert _tdl_formula(spec, EqualTo(("parent",), "Contra")) is None
    # numeric comparisons never push (no non-text field may), regardless
    # of how the literal would render
    assert _tdl_formula(spec, GreaterThan(("affects_stock",), 1e-05)) is None
    assert _tdl_formula(spec, GreaterThan(("affects_stock",),
                                          float("inf"))) is None
    assert _tdl_formula(spec, GreaterThan(("affects_stock",), 0.25)) is None


def test_tally_stream_source_alterid_offsets(spark, tmp_path):
    """readStream.format('tally'): AlterId is the offset — unchanged probe
    => empty batch (H2 gate); advanced probe => only rows past the last
    committed AlterId arrive (C8 dynamic filter), across query restarts."""
    import http.server
    import threading

    from tally_database_loader_spark.sources import tally_datasource

    tally_datasource.register(spark)
    state = {"alterid": 5}

    def vch_row(i, guid, name, alt):
        return (f"<F01>{guid}</F01><F02>{name}</F02><F03>p</F03>"
                f"<F04>Manual</F04><F05>0</F05><F06>0</F06><F07>{alt}</F07>")

    def data_rows():
        rows = [vch_row(1, "v-1", "Sales", 3), vch_row(2, "v-2", "Receipt", 5)]
        if state["alterid"] >= 9:
            rows += [vch_row(3, "v-3", "Journal", 8),
                     vch_row(4, "v-4", "Contra", 9)]
        return "<ENVELOPE>\r\n" + "\r\n".join(rows) + "\r\n</ENVELOPE>"

    class StubTally(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            body = self.rfile.read(n).decode("utf-16le")
            if "AltMstId" in body:
                payload = (f"<ENVELOPE>\r\n<F01>{state['alterid']}</F01>"
                           "\r\n</ENVELOPE>").encode("utf-8")
            else:
                payload = data_rows().encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), StubTally)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}"
    ck = str(tmp_path / "ck")

    def run_once():
        out: list = []
        stream = (spark.readStream.format("tally")
                  .option("table", "mst_vouchertype")
                  .option("url", url)
                  .option("with_alterid", "true")
                  .load())
        q = (stream.writeStream
             .foreachBatch(lambda df, _id: out.extend(df.collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return sorted((r["guid"], r["alterid"]) for r in out)

    try:
        # first run: everything past offset 0
        assert run_once() == [("v-1", 3), ("v-2", 5)]
        # no AlterId movement => empty batch after restart
        assert run_once() == []
        # source advances; only rows past the committed offset 5 arrive
        state["alterid"] = 9
        assert run_once() == [("v-3", 8), ("v-4", 9)]
    finally:
        srv.shutdown()


def test_tablespec_rejects_unknown_watermark_group():
    """ADVICE r4: a directly-constructed TableSpec with a bogus group
    must fail with the field named, not as an unexplained KeyError deep
    inside incremental_sync_frames' by_group split."""
    import pytest
    from tally_database_loader_spark.sources.registry import TableSpec
    spec = TableSpec("t", "Ledger", [], group="bogus")
    with pytest.raises(ValueError, match="master.*transaction|group"):
        spec.watermark_group()
    # the two real groups and the derive-from-collection default still work
    assert TableSpec("t", "Ledger", [], group="master").watermark_group() == "master"
    assert TableSpec("t", "Voucher", [], group="transaction").watermark_group() == "transaction"
    assert TableSpec("t", "Voucher.LedgerEntries", []).watermark_group() == "transaction"
