"""S8 — async parse service: submit/progress/stop/download semantics and
the stdlib HTTP face (reference routes cmd/server.go:120-139, handlers
parse/bingo2sql.go:102-225)."""

from __future__ import annotations

import glob
import json
import time
import urllib.error
import urllib.request

from bingo2sql_spark.service import ParseService, serve
from bingo2sql_spark.sources.synth import generate_events


def _wait(svc, job_id, timeout=240):
    deadline = time.time() + timeout
    while time.time() < deadline:
        p = svc.progress(job_id)
        if p["state"] not in ("running", "cancelling"):
            return p
        time.sleep(0.5)
    raise AssertionError(f"job {job_id} did not finish: {svc.progress(job_id)}")


def test_parse_service_submit_progress_download(spark, tmp_path):
    svc = ParseService(spark)
    ev = generate_events(spark, n_keys=100, versions_per_key=3)
    out = str(tmp_path / "art")
    job = svc.submit(ev, out, tables=["repo_files"], show_gtid=False)
    p = _wait(svc, job)
    assert p["state"] == "done" and p["pct"] == 100.0 and p["error"] is None, p
    path = svc.download_path(job)
    lines = [ln for f in sorted(glob.glob(path + "/part-*")) for ln in open(f) if ln.strip()]
    assert lines and all(
        ln.startswith(("INSERT INTO", "UPDATE ", "DELETE FROM")) for ln in lines
    )
    # unknown job ids are loud
    import pytest

    with pytest.raises(KeyError):
        svc.progress("nope")
    with pytest.raises(ValueError):
        # a running/failed job has no artifact; simulate via a fresh submit
        svc.download_path(svc.submit(ev, str(tmp_path / "art2")))


def test_parse_service_stop_cancels(spark, tmp_path):
    """DELETE /parse/:id analog: cancelling the job group interrupts the
    run; the job ends in a non-done state and never produces a complete
    artifact marker."""
    svc = ParseService(spark)
    # big enough to still be running when the cancel lands
    ev = generate_events(spark, n_keys=200_000, versions_per_key=8)
    out = str(tmp_path / "big")
    job = svc.submit(ev, out, show_gtid=False)
    time.sleep(1.0)
    svc.stop(job)
    p = _wait(svc, job)
    if p["state"] == "done":  # tiny chance it finished before the cancel
        return
    assert p["state"] in ("cancelled", "failed")


def test_parse_service_http_face(spark, tmp_path):
    """The stdlib HTTP wrapper speaks the reference's routes."""
    svc = ParseService(spark)
    ev = generate_events(spark, n_keys=50, versions_per_key=2)
    server = serve(svc, ev)
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            base + "/binlog/parse",
            data=json.dumps({"out_dir": str(tmp_path / "h"), "show_gtid": False}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 202
            job = json.loads(r.read())["job_id"]
        deadline = time.time() + 120
        while time.time() < deadline:
            with urllib.request.urlopen(f"{base}/parse/{job}") as r:
                p = json.loads(r.read())
            if p["state"] != "running":
                break
            time.sleep(0.5)
        assert p["state"] == "done", p
        with urllib.request.urlopen(f"{base}/parse/{job}/download") as r:
            path = json.loads(r.read())["path"]
        assert glob.glob(path + "/part-*")
        # DELETE on a finished job is a no-op state echo; unknown id -> 404
        req = urllib.request.Request(f"{base}/parse/{job}", method="DELETE")
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["state"] == "done"
        try:
            urllib.request.urlopen(f"{base}/parse/zzz")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_parse_service_concurrent_jobs(spark, tmp_path):
    """Two jobs share the SparkContext but are independently tracked:
    per-job groups keep progress and artifacts separate."""
    svc = ParseService(spark)
    # versions_per_key >= 4: deletes only occur at v % 4 == 3
    ev = generate_events(spark, n_keys=60, versions_per_key=8)
    j1 = svc.submit(ev, str(tmp_path / "a"), sql_type=["insert"], show_gtid=False)
    j2 = svc.submit(ev, str(tmp_path / "b"), sql_type=["delete"], show_gtid=False)
    p1, p2 = _wait(svc, j1), _wait(svc, j2)
    assert p1["state"] == "done" and p2["state"] == "done", (p1, p2)
    a = [ln for f in glob.glob(svc.download_path(j1) + "/part-*") for ln in open(f) if ln.strip()]
    b = [ln for f in glob.glob(svc.download_path(j2) + "/part-*") for ln in open(f) if ln.strip()]
    assert a and all(ln.startswith("INSERT") for ln in a)
    assert b and all(ln.startswith("DELETE") for ln in b)


def test_cli_main_generates_sql(spark, tmp_path):
    """`python -m bingo2sql_spark` flag surface: forward and flashback
    runs over a typed-wire landing produce ordered SQL artifacts, gates
    apply, and reference flag names parse (in-process main — the
    session is reused via getOrCreate)."""
    import os

    from bingo2sql_spark.__main__ import main
    from bingo2sql_spark.sources.synth import generate_events, to_raw_typed

    ev = generate_events(spark, n_keys=60, versions_per_key=4, n_repos=6, seed=11)
    src = str(tmp_path / "landing")
    to_raw_typed(ev).write.parquet(src)
    out = str(tmp_path / "out_fwd")
    rc = main([
        "--input", src, "--input-format", "raw_typed_parquet",
        "-o", out, "-t", "repo_files", "--sql-type", "insert",
        "--sql-type", "update",
    ])
    assert rc == 0
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert parts
    body = "".join(open(os.path.join(out, f)).read() for f in parts)
    assert "INSERT INTO" in body and "UPDATE" in body
    assert "DELETE FROM" not in body  # --sql-type gate applied

    out_fb = str(tmp_path / "out_fb")
    rc = main([
        "--input", src, "--input-format", "raw_typed_parquet",
        "-o", out_fb, "-t", "repo_files", "-B",
    ])
    assert rc == 0
    fb_body = "".join(
        open(os.path.join(out_fb, f)).read()
        for f in sorted(os.listdir(out_fb)) if f.startswith("part-")
    )
    # flashback inverts: the stream's inserts become DELETEs
    assert "DELETE FROM" in fb_body


def test_archive_round_trips_to_same_sql(spark, tmp_path):
    """S7 tar.gz parity (Archive() core/parser.go:2460-2485): an
    archived job's tar.gz extracts to the byte-identical decorated SQL
    of an unarchived run, the original artifact dir is deleted (the
    reference's post-archive clear()), progress reports the archive
    size, and download serves the tar.gz path."""
    import os
    import tarfile

    svc = ParseService(spark)
    ev = generate_events(spark, n_keys=80, versions_per_key=4, seed=13)
    plain_out = str(tmp_path / "plain")
    j1 = svc.submit(ev, plain_out, tables=["repo_files"])
    assert _wait(svc, j1)["state"] == "done"
    plain = "".join(
        open(f).read() for f in sorted(glob.glob(plain_out + "/part-*"))
    )

    arch_out = str(tmp_path / "arch")
    j2 = svc.submit(ev, arch_out, tables=["repo_files"], archive=True)
    p = _wait(svc, j2)
    assert p["state"] == "done"
    tar_path = svc.download_path(j2)
    assert tar_path.endswith(".tar.gz") and os.path.exists(tar_path)
    assert not os.path.exists(arch_out)  # original deleted after packing
    assert p["archive_bytes"] == os.stat(tar_path).st_size > 0
    with tarfile.open(tar_path) as tar:
        members = sorted(m.name for m in tar.getmembers() if "part-" in m.name)
        body = "".join(
            tar.extractfile(m).read().decode() for m in map(tar.getmember, members)
        )
    assert body == plain and "INSERT INTO" in body


def test_http_archive_flag(spark, tmp_path):
    """The POST body's archive flag survives the allowed-flags check and
    the download route serves the tar.gz."""
    svc = ParseService(spark)
    ev = generate_events(spark, n_keys=30, versions_per_key=3, seed=21)
    server = serve(svc, ev)
    port = server.server_address[1]
    try:
        body = json.dumps(
            {"out_dir": str(tmp_path / "h"), "archive": True, "show_gtid": False}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/binlog/parse", data=body, method="POST"
        )
        job_id = json.load(urllib.request.urlopen(req))["job_id"]
        _wait(svc, job_id)
        got = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/parse/{job_id}/download")
        )
        assert got["path"].endswith(".tar.gz")
    finally:
        server.shutdown()


def test_sse_progress_push(spark, tmp_path):
    """GET /parse/:id/events pushes progress frames until terminal —
    the reference's 5-second websocket push (core/socket.go:34-76) as
    Server-Sent Events: every frame is the {state, pct, ...} JSON, the
    last frame carries the terminal state, and the stream closes."""
    svc = ParseService(spark)
    ev = generate_events(spark, n_keys=40, versions_per_key=3, seed=31)
    server = serve(svc, ev, push_interval=0.2)
    port = server.server_address[1]
    try:
        job_id = svc.submit(ev, str(tmp_path / "sse"), show_gtid=False)
        frames = []
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/parse/{job_id}/events", timeout=240
        ) as resp:
            assert resp.headers["Content-Type"] == "text/event-stream"
            for raw in resp:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    frames.append(json.loads(line[len("data: "):]))
        assert frames and frames[-1]["state"] == "done"
        assert frames[-1]["pct"] == 100.0
        assert all(f["job_id"] == job_id for f in frames)
        # unknown ids 404 before the stream starts
        import pytest

        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/parse/nope/events")
        assert e.value.code == 404
    finally:
        server.shutdown()


def test_websocket_progress_push(spark, tmp_path):
    """GET /parse/:id/ws — the reference's LITERAL websocket framing
    (core/socket.go:34-76): RFC 6455 handshake (Sec-WebSocket-Accept
    derived from the client key), unmasked server TEXT frames carrying
    {state, pct, ...} JSON until the terminal frame, then a 1000 close
    frame."""
    import base64
    import hashlib
    import socket

    svc = ParseService(spark)
    ev = generate_events(spark, n_keys=40, versions_per_key=3, seed=33)
    server = serve(svc, ev, push_interval=0.2)
    port = server.server_address[1]
    try:
        job_id = svc.submit(ev, str(tmp_path / "ws"), show_gtid=False)
        key = base64.b64encode(b"0123456789abcdef").decode()
        s = socket.create_connection(("127.0.0.1", port), timeout=240)
        s.sendall(
            (
                f"GET /parse/{job_id}/ws HTTP/1.1\r\n"
                f"Host: 127.0.0.1:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        f = s.makefile("rb")
        status = f.readline().decode()
        assert " 101 " in status, status
        headers = {}
        while True:
            line = f.readline().decode().strip()
            if not line:
                break
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        expect = base64.b64encode(
            hashlib.sha1((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()).digest()
        ).decode()
        assert headers["sec-websocket-accept"] == expect
        assert headers["upgrade"].lower() == "websocket"

        frames, closed = [], False
        while True:
            head = f.read(2)
            if len(head) < 2:
                break
            fin_op, ln = head[0], head[1] & 0x7F
            assert not (head[1] & 0x80)  # server frames are unmasked
            if ln == 126:
                ln = int.from_bytes(f.read(2), "big")
            elif ln == 127:
                ln = int.from_bytes(f.read(8), "big")
            payload = f.read(ln)
            op = fin_op & 0x0F
            if op == 0x8:
                assert int.from_bytes(payload[:2], "big") == 1000
                closed = True
                break
            assert op == 0x1
            frames.append(json.loads(payload.decode()))
        s.close()
        assert frames and closed
        assert frames[-1]["state"] == "done" and frames[-1]["pct"] == 100.0
        assert all(fr["job_id"] == job_id for fr in frames)

        # non-upgrade request on the ws route is a clean 400
        import urllib.error
        import urllib.request

        import pytest

        job2 = svc.submit(ev, str(tmp_path / "ws2"), show_gtid=False)
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/parse/{job2}/ws")
        assert e.value.code == 400
        # unknown ids 404 before any upgrade
        with pytest.raises(urllib.error.HTTPError) as e2:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/parse/nope/ws")
        assert e2.value.code == 404
    finally:
        server.shutdown()


def test_cli_stats_subcommand(spark, tmp_path, capsys):
    """VERDICT r7 #6 — `python -m bingo2sql_spark stats` mirrors the
    reference's stats front-end (cmd/stats.go:30-54): per-table DML
    pivot + totals + ts span over the gated range, ascending by total,
    matching the cdc_stats_per_table oracle frame."""
    from bingo2sql_spark.__main__ import main
    from bingo2sql_spark.operators.stats import table_stats
    from bingo2sql_spark.sources.decode import decode_events_typed
    from bingo2sql_spark.sources.synth import generate_events, to_raw_typed

    ev = generate_events(spark, n_keys=60, versions_per_key=8, n_repos=6, seed=7)
    src = str(tmp_path / "stats_landing")
    to_raw_typed(ev).write.parquet(src)

    rc = main(["stats", "--input", src, "--input-format", "raw_typed_parquet",
               "-t", "repo_files"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert lines[0].split()[:6] == ["db", "table", "inserts", "updates",
                                    "deletes", "total"]
    # the oracle frame: same operator over the same decoded events
    oracle_rows = table_stats(
        decode_events_typed(spark.read.parquet(src)).filter("table = 'repo_files'")
    ).collect()
    body = [ln.split() for ln in lines[1:-1]]
    assert [b[:6] for b in body] == [
        [r["db"], r["table"], str(r["inserts"]), str(r["updates"]),
         str(r["deletes"]), str(r["total"])]
        for r in oracle_rows
    ]
    total_line = lines[-1].split()
    assert total_line[0] == "TOTAL"
    assert int(total_line[4]) == sum(r["total"] for r in oracle_rows)

    # gates apply: a non-matching table filter yields only the header +
    # empty totals
    rc = main(["stats", "--input", src, "--input-format", "raw_typed_parquet",
               "-t", "nope"])
    assert rc == 0
    out2 = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert out2[-1].split()[:2] == ["TOTAL", "0"]
