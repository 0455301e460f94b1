"""CLI sync runner (__main__.py ↔ reference src/index.mts): config
layering, dump-dir extraction, sink dispatch, import-log lines, and the
bounded continuous loop."""

from __future__ import annotations

import json
import os

import pytest

from tally_database_loader_spark.__main__ import main

_DEFINITION = """
master:
  - name: mst_unit
    collection: Unit
    fields:
      - name: guid
        field: $Guid
        type: text
      - name: name
        field: $Name
        type: text
      - name: opening
        field: $OpeningBalance
        type: amount
transaction: []
"""


def _dump(tmp_path, rows):
    body = "\r\n".join(
        f"  <F01>{g}</F01><F02>{n}</F02><F03>{a}</F03>" for g, n, a in rows)
    d = tmp_path / "dump"
    d.mkdir(exist_ok=True)
    (d / "mst_unit.xml").write_text(
        f"<ENVELOPE>\r\n{body}\r\n</ENVELOPE>", encoding="utf-8")
    return str(d)


@pytest.fixture()
def setup(tmp_path):
    dumpdir = _dump(tmp_path, [
        ("u-1", "Nos", "10.00"),
        ("u-2", "Box &amp; Crate", "-2.50"),
    ])
    defpath = tmp_path / "spec.yaml"
    defpath.write_text(_DEFINITION, encoding="utf-8")
    cfgpath = tmp_path / "config.json"
    cfgpath.write_text(json.dumps({
        "database": {"technology": "csv",
                     "loadpath": str(tmp_path / "out"),
                     "logpath": str(tmp_path / "import-log.txt")},
        "tally": {"definition": str(defpath), "dumpdir": dumpdir},
    }), encoding="utf-8")
    return tmp_path, cfgpath


def test_cli_csv_sync_end_to_end(spark, setup):
    tmp_path, cfgpath = setup
    counts = main(["--config", str(cfgpath)], spark=spark)
    assert counts == {"mst_unit": 2}
    out = (tmp_path / "out" / "mst_unit.csv").read_text(encoding="utf-8-sig")
    assert "u-1" in out and "Box & Crate" in out  # entity unescape survives
    log = (tmp_path / "import-log.txt").read_text(encoding="utf-8")
    assert "mst_unit: 2 in " in log              # reference import-log shape
    assert "Import completed successfully" in log


def test_cli_override_and_parquet_sink(spark, setup, tmp_path):
    _, cfgpath = setup
    store_path = tmp_path / "pq"
    counts = main(["--config", str(cfgpath),
                   "--database-technology", "parquet",
                   "--database-loadpath", str(store_path)], spark=spark)
    assert counts == {"mst_unit": 2}
    from tally_database_loader_spark.operators.incremental import ParquetStore
    store = ParquetStore(str(store_path))
    got = {r.guid: str(r.opening) for r in store.read(spark, "mst_unit").collect()}
    assert got == {"u-1": "10.00", "u-2": "-2.50"}


def test_cli_continuous_loop_bounded(spark, setup, monkeypatch):
    import tally_database_loader_spark.__main__ as cli
    monkeypatch.setattr(cli, "_sleep", lambda s: None)
    tmp_path, cfgpath = setup
    counts = main(["--config", str(cfgpath),
                   "--tally-frequency", "1"], spark=spark, max_ticks=2)
    assert counts == {"mst_unit": 2}
    log = (tmp_path / "import-log.txt").read_text(encoding="utf-8")
    # two ticks ran without sleeping between (max_ticks bound, then stop)
    assert log.count("Import completed successfully") >= 2


def test_cli_rejects_unknown_sink(spark, setup):
    _, cfgpath = setup
    with pytest.raises(SystemExit):
        main(["--config", str(cfgpath),
              "--database-technology", "oracle"], spark=spark)
