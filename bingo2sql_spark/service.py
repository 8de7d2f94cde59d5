"""S8 — the reference's HTTP parse service, Spark-native.

The reference runs an async-job HTTP server (routes cmd/server.go:120-139):
POST /binlog/parse launches a parse job, GET /parse/:id reports progress,
DELETE /parse/:id stops it, GET /parse/:id/download serves the artifact
(handlers parse/bingo2sql.go:102-166,41-62,168-205,207-225; the 5-second
websocket progress push core/socket.go:34-76).

Here the same surface is two layers:

- `ParseService` — the job manager: submit() runs `api.generate_sql` on a
  daemon thread under a per-job Spark job group; progress() derives live
  percent from the SparkStatusTracker's task counters for that group (the
  reference's {rows, pct} push, without a socket); stop() cancels the job
  group (DELETE analog); download_path() returns the finished artifact dir.
- `serve()` — an OPTIONAL stdlib ThreadingHTTPServer exposing the
  reference's routes over real HTTP. No third-party web framework: the
  service is a library first (the driver contract has no ports), the HTTP
  face is for parity.

Thread-safety note: PySpark pins python threads to JVM threads
(PYSPARK_PIN_THREAD, default on), so setJobGroup inside the worker thread
scopes cancellation to exactly that job's stages.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from bingo2sql_spark.api import generate_sql


@dataclass
class _Job:
    job_id: str
    out_dir: str
    state: str = "running"  # running | done | failed | cancelled
    error: str | None = None
    submitted_at: float = field(default_factory=time.time)
    finished_at: float | None = None
    archive_path: str | None = None  # tar.gz artifact (submit(archive=True))
    archive_size: int | None = None


class ParseService:
    """Async parse-job manager (reference S8 semantics)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._jobs: dict[str, _Job] = {}
        self._lock = threading.Lock()

    # -- POST /binlog/parse ---------------------------------------------------
    def submit(
        self, events: DataFrame, out_dir: str, archive: bool = False, **flags: Any
    ) -> str:
        """Launch generate_sql(events, out_dir, **flags) asynchronously;
        returns the job id immediately (the reference's 202 + id,
        parse/bingo2sql.go:102-166). `archive=True` packs the finished
        artifact into <out_dir>.tar.gz and deletes the original — the
        reference archives every server-mode job and serves exactly
        that file (Archive() core/parser.go:2460-2485, download
        parse/bingo2sql.go:207-225); its byte size lands in progress()."""
        job_id = uuid.uuid4().hex[:12]
        job = _Job(job_id=job_id, out_dir=out_dir)
        with self._lock:
            self._jobs[job_id] = job

        def run() -> None:
            sc = self.spark.sparkContext
            sc.setJobGroup(job_id, f"bingo2sql parse {job_id}", interruptOnCancel=True)
            try:
                generate_sql(events, out_dir, **flags)
                if archive:
                    from bingo2sql_spark.functions.render import archive_sql_artifact

                    job.archive_path, job.archive_size = archive_sql_artifact(out_dir)
                job.state = "done"
            except Exception as e:  # noqa: BLE001 - job state carries the error
                job.state = "cancelled" if job.state == "cancelling" else "failed"
                job.error = str(e)[:500]
            finally:
                job.finished_at = time.time()
                sc.setJobGroup("", "")

        threading.Thread(target=run, name=f"parse-{job_id}", daemon=True).start()
        return job_id

    # -- GET /parse/:id ---------------------------------------------------------
    def progress(self, job_id: str) -> dict[str, Any]:
        """Job state + live percent from the status tracker's task
        counters for this job group (the reference's {rows, pct} push,
        core/socket.go:34-76 / TestComputePercent analog)."""
        job = self._get(job_id)
        # snapshot the state ONCE: the worker thread flips it
        # concurrently, and reading it again for the returned dict could
        # pair state='done' with a mid-flight tracker pct (a real race a
        # pushed SSE frame hit)
        state = job.state
        pct = 100.0 if state == "done" else 0.0
        if state in ("running", "cancelling"):
            tracker = self.spark.sparkContext.statusTracker()
            total = done = 0
            for jid in tracker.getJobIdsForGroup(job_id):
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is None:
                        continue
                    total += si.numTasks
                    done += si.numCompletedTasks
            pct = round(100.0 * done / total, 1) if total else 0.0
        out = {
            "job_id": job_id,
            "state": state,
            "pct": pct,
            "error": job.error,
            "runtime_secs": round((job.finished_at or time.time()) - job.submitted_at, 3),
        }
        if job.archive_size is not None:
            out["archive_bytes"] = job.archive_size  # Archive()'s size report
        return out

    # -- DELETE /parse/:id -------------------------------------------------------
    def stop(self, job_id: str) -> dict[str, Any]:
        """Cancel the job group (reference stop handler,
        parse/bingo2sql.go:168-205)."""
        job = self._get(job_id)
        if job.state == "running":
            job.state = "cancelling"
            self.spark.sparkContext.cancelJobGroup(job_id)
        return {"job_id": job_id, "state": job.state}

    # -- GET /parse/:id/download ---------------------------------------------------
    def download_path(self, job_id: str) -> str:
        """Artifact location of a finished job: the tar.gz when the job
        archived (exactly what the reference's download handler streams,
        parse/bingo2sql.go:207-225), else the ordered text-part dir."""
        job = self._get(job_id)
        if job.state != "done":
            raise ValueError(f"job {job_id} is {job.state}, not done")
        return job.archive_path or job.out_dir

    def _get(self, job_id: str) -> _Job:
        with self._lock:
            if job_id not in self._jobs:
                raise KeyError(f"unknown parse job {job_id!r}")
            return self._jobs[job_id]


def serve(
    service: ParseService,
    events: DataFrame,
    host: str = "127.0.0.1",
    port: int = 0,
    push_interval: float = 5.0,
):
    """Stdlib HTTP face over ParseService with the reference's routes
    (cmd/server.go:120-139). `events` is the pre-bound source stream (the
    reference binds its source from the posted config; the driver contract
    here passes DataFrames, so the POST body carries only flags). Returns
    the started server; call .shutdown() to stop. Port 0 picks a free port
    (server.server_address[1]).

    GET /parse/:id/events is the PUSH progress channel — the reference's
    5-second websocket push (core/socket.go:34-76) as Server-Sent
    Events: one `data: {job_id, state, pct, ...}` frame per
    `push_interval` until the job leaves running state (final frame
    carries the terminal state). SSE keeps the server stdlib-only;
    any websocket/EventSource client consumes the same JSON the
    reference pushed."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 (stdlib API)
            if self.path != "/binlog/parse":
                return self._send(404, {"error": "not found"})
            # ADVICE r3: malformed bodies must yield an HTTP 400, not a
            # dropped connection + stderr traceback; unknown flag names
            # are rejected at submit time instead of surfacing later as a
            # 'failed' job with a TypeError string.
            try:
                n = int(self.headers.get("Content-Length", 0))
                flags = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(flags, dict):
                    raise ValueError("body must be a JSON object")
                out_dir = flags.pop("out_dir")
                archive = bool(flags.pop("archive", False))
            except KeyError:
                return self._send(400, {"error": "missing required field 'out_dir'"})
            except (ValueError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad request body: {e}"})
            import inspect

            allowed = set(inspect.signature(generate_sql).parameters) - {"events", "out_dir"}
            unknown = sorted(set(flags) - allowed)
            if unknown:
                return self._send(
                    400, {"error": f"unknown flags {unknown}; allowed: {sorted(allowed)}"}
                )
            job_id = service.submit(events, out_dir, archive=archive, **flags)
            self._send(202, {"job_id": job_id})

        def _push_events(self, job_id: str) -> None:
            # SSE progress push (reference websocket core/socket.go:34-76)
            service.progress(job_id)  # 404 via KeyError before headers go out
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            while True:
                p = service.progress(job_id)
                self.wfile.write(f"data: {json.dumps(p)}\n\n".encode())
                self.wfile.flush()
                if p["state"] not in ("running", "cancelling"):
                    return  # terminal frame sent; close the stream
                time.sleep(push_interval)

        def _push_ws(self, job_id: str) -> None:
            # the LITERAL websocket framing of the reference's push
            # (core/socket.go:34-76), stdlib-only RFC 6455: handshake
            # (Sec-WebSocket-Accept = b64(sha1(key + GUID))), then
            # unmasked server->client TEXT frames carrying the same
            # {state, pct, ...} JSON the SSE channel streams, closed
            # with a 1000 (normal) close frame at the terminal state.
            service.progress(job_id)  # 404 via KeyError before upgrade
            key = self.headers.get("Sec-WebSocket-Key")
            if (
                not key
                or self.headers.get("Upgrade", "").lower() != "websocket"
            ):
                return self._send(
                    400, {"error": "websocket upgrade required (Upgrade + Sec-WebSocket-Key)"}
                )
            import base64
            import hashlib

            accept = base64.b64encode(
                hashlib.sha1(
                    (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
                ).digest()
            ).decode()
            self.send_response(101, "Switching Protocols")
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", accept)
            self.end_headers()
            self.close_connection = True  # socket is hijacked for frames

            def frame(payload: bytes, opcode: int = 0x1) -> bytes:
                n = len(payload)
                if n < 126:
                    head = bytes([0x80 | opcode, n])
                elif n < 1 << 16:
                    head = bytes([0x80 | opcode, 126]) + n.to_bytes(2, "big")
                else:
                    head = bytes([0x80 | opcode, 127]) + n.to_bytes(8, "big")
                return head + payload

            while True:
                p = service.progress(job_id)
                self.wfile.write(frame(json.dumps(p).encode()))
                self.wfile.flush()
                if p["state"] not in ("running", "cancelling"):
                    # close frame, status 1000 (normal closure)
                    self.wfile.write(frame((1000).to_bytes(2, "big"), opcode=0x8))
                    self.wfile.flush()
                    return
                time.sleep(push_interval)

        def do_GET(self):  # noqa: N802
            parts = self.path.strip("/").split("/")
            try:
                if len(parts) == 2 and parts[0] == "parse":
                    return self._send(200, service.progress(parts[1]))
                if len(parts) == 3 and parts[0] == "parse" and parts[2] == "download":
                    return self._send(200, {"path": service.download_path(parts[1])})
                if len(parts) == 3 and parts[0] == "parse" and parts[2] == "events":
                    return self._push_events(parts[1])
                if len(parts) == 3 and parts[0] == "parse" and parts[2] == "ws":
                    return self._push_ws(parts[1])
            except (KeyError, ValueError) as e:
                return self._send(404, {"error": str(e)})
            except (BrokenPipeError, ConnectionResetError):
                return  # client hung up mid-push
            self._send(404, {"error": "not found"})

        def do_DELETE(self):  # noqa: N802
            parts = self.path.strip("/").split("/")
            if len(parts) == 2 and parts[0] == "parse":
                try:
                    return self._send(200, service.stop(parts[1]))
                except KeyError as e:
                    return self._send(404, {"error": str(e)})
            self._send(404, {"error": "not found"})

        def log_message(self, *a):  # silence per-request stderr noise
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
