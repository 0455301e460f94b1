"""Sync control-plane server (streaming/server.py ↔ reference
src/server.mts:81-163): endpoint parity, the ~ completion sentinel,
cooperative abort, and the stubbed Tally probes."""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from tally_database_loader_spark.streaming.server import SyncServer


def _get(url: str) -> tuple[int, str]:
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, resp.read().decode("utf-8")


def _post(url: str, body: str = "") -> tuple[int, str]:
    req = urllib.request.Request(url, data=body.encode("utf-8"), method="POST")
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, resp.read().decode("utf-8")


def _drain(base: str, *, until: str, timeout: float = 15.0) -> list[str]:
    """Poll GET /log until ``until`` appears (the reference GUI's loop)."""
    lines: list[str] = []
    cursor = 0
    deadline = time.time() + timeout
    while time.time() < deadline:
        _, body = _get(f"{base}/log?since={cursor}")
        feed = json.loads(body)
        lines += feed["lines"]
        cursor = feed["next"]
        if until in lines:
            return lines
        time.sleep(0.05)
    raise AssertionError(f"sentinel {until!r} never arrived; got {lines}")


@pytest.fixture()
def server(tmp_path):
    started = threading.Event()
    release = threading.Event()

    def run_sync(config, emit, aborted):
        emit(f"sync started for company={config.get('company', '')}")
        started.set()
        for i in range(3):
            if aborted():
                emit("aborting")
                return
            emit(f"mst_group: {10 * (i + 1)} in 0.1 sec")
            release.wait(timeout=0.01)
        emit("done")

    def fake_post_xml(url, payload):
        if not payload:  # /tally-status empty-body probe
            return "TallyPrime Server is Running"
        assert "<TYPE>Company</TYPE>" in payload  # compiled company-list TDL
        return "<DATA><ROW>Acme Ltd</ROW><ROW>Globex</ROW></DATA>"

    srv = SyncServer(str(tmp_path / "config.json"), run_sync,
                     post_xml=fake_post_xml).start()
    srv._test_started = started
    yield srv
    srv.stop()


def test_index_and_config_roundtrip(server):
    code, body = _get(server.url + "/")
    assert code == 200 and "sync" in body
    code, body = _get(server.url + "/loadconfig")
    assert code == 200 and json.loads(body) == {}  # missing file → {}
    cfg = {"tally": {"company": "Acme Ltd"}, "database": {"technology": "csv"}}
    code, body = _post(server.url + "/saveconfig", json.dumps(cfg))
    assert body == "Config saved"
    _, body = _get(server.url + "/loadconfig")
    assert json.loads(body) == cfg
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server.url + "/nope")
    assert ei.value.code == 404


def test_sync_runs_to_sentinel_and_guards_reentry(server):
    code, body = _post(server.url + "/sync", json.dumps({"company": "Acme"}))
    assert body == "Sync started"
    server._test_started.wait(timeout=10)
    # H3 reentrancy guard while the worker is live (reference isSyncRunning)
    _, body2 = _post(server.url + "/sync", "{}")
    assert body2 in ("Sync is already running", "Sync started")
    lines = _drain(server.url, until="~")
    assert lines[0] == "sync started for company=Acme"
    assert "done" in lines
    assert lines[-1] == "~"  # reference completion sentinel (server.mts:38)
    # after completion a new sync may start again
    _, body3 = _post(server.url + "/sync", "{}")
    assert body3 == "Sync started"
    _drain(server.url, until="~", timeout=15)


def test_abort_is_cooperative(tmp_path):
    entered = threading.Event()

    def slow_sync(config, emit, aborted):
        emit("working")
        entered.set()
        for _ in range(200):
            if aborted():
                emit("aborting")
                return
            time.sleep(0.05)
        emit("never aborted")

    srv = SyncServer(str(tmp_path / "c.json"), slow_sync).start()
    try:
        _, body = _post(srv.url + "/abort")
        assert body == "Could not abort: no sync running"
        _post(srv.url + "/sync", "{}")
        entered.wait(timeout=10)
        _, body = _post(srv.url + "/abort")
        assert body == "Abort requested"
        lines = _drain(srv.url, until="~")
        assert "aborting" in lines and "never aborted" not in lines
    finally:
        srv.stop()


def test_sync_endpoint_drives_real_engine(spark, tmp_path):
    """End-to-end control plane: POST /sync runs a REAL full sync
    (IncrementalSync over the stub Tally source into a ParquetStore),
    the log feed carries the reference's import-log line shape per table
    ('{table}: {rows} in {s} sec', src/tally.mts:360) and ends with ~,
    and the loaded store is queryable afterwards — the reference's
    /sync → child-process → database flow with the child process
    replaced by driver-side distributed plans."""
    import time as _time

    from tally_database_loader_spark.operators.incremental import (
        IncrementalSync, ParquetStore)
    from tally_database_loader_spark.sources.registry import default_tables
    from tests.tally_fixtures import tally_source

    store = ParquetStore(str(tmp_path / "store"))
    specs = default_tables()

    def run_sync(config, emit, aborted):
        eng = IncrementalSync(spark, store, specs)
        t0 = _time.perf_counter()
        counts = eng.full_sync(tally_source(spark))
        dt = _time.perf_counter() - t0
        for table in sorted(counts):
            emit(f"{table}: {counts[table]} in {dt / len(counts):.3f} sec")

    srv = SyncServer(str(tmp_path / "config.json"), run_sync).start()
    try:
        _, body = _post(srv.url + "/sync", "{}")
        assert body == "Sync started"
        lines = _drain(srv.url, until="~", timeout=180)
    finally:
        srv.stop()
    table_lines = [l for l in lines if ": " in l and " in " in l]
    assert len(table_lines) >= 10  # the 22-table default spec set loads
    assert any(l.startswith("mst_ledger: ") for l in table_lines)
    # and the store now serves queries
    assert store.read(spark, "mst_ledger").count() > 0


def test_probes_and_error_surfacing(server, tmp_path):
    _, body = _post(server.url + "/list-company",
                    json.dumps({"server": "localhost", "port": 9000}))
    assert "Acme Ltd" in body and "Globex" in body
    _, body = _post(server.url + "/tally-status", "{}")
    assert body == "TallyPrime Server is Running"

    # unreachable endpoint degrades exactly like the reference
    def failing_post(url, payload):
        raise OSError("connection refused")

    srv = SyncServer(str(tmp_path / "c2.json"),
                     lambda c, e, a: (_ for _ in ()).throw(RuntimeError("boom")),
                     post_xml=failing_post).start()
    try:
        _, body = _post(srv.url + "/list-company", "{}")
        assert body == "<DATA></DATA>"
        _, body = _post(srv.url + "/tally-status", "{}")
        assert body == ""
        # a raising runner surfaces the error on the feed, then the sentinel
        _post(srv.url + "/sync", "{}")
        lines = _drain(srv.url, until="~")
        assert any(l.startswith("error: boom") for l in lines)
    finally:
        srv.stop()
