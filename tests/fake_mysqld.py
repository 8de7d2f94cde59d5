"""An in-box MySQL-protocol server for replication-client conformance
tests (tests/test_repl_client.py): speaks the real wire format —
HandshakeV10, HandshakeResponse41 parse, mysql_native_password scramble
VERIFICATION (wrong password -> ERR, like a real server), COM_QUERY /
COM_REGISTER_SLAVE OKs, COM_BINLOG_DUMP streaming of a
BinlogWriter-built log as 0x00-prefixed event packets ending in EOF.

This is the strongest S1 evidence the sandbox allows: the client is
exercised against an independent implementation of the server side of
the documented protocol, not against itself. Only a production mysqld
(TLS, other auth plugins) remains outside the box.
"""

from __future__ import annotations

import socketserver
import struct
import threading

from bingo2sql_spark.sources.binlog_binary import _u
from bingo2sql_spark.sources.repl_client import (
    CLIENT_PLUGIN_AUTH,
    CLIENT_PROTOCOL_41,
    CLIENT_SECURE_CONNECTION,
    COM_BINLOG_DUMP,
    COM_QUERY,
    COM_REGISTER_SLAVE,
    native_password_scramble,
)

# deterministic 20-byte seed with no NUL bytes (real servers avoid NULs
# in the seed too, since part1 is NUL-terminated on the wire)
SEED = bytes((i * 7 + 3) % 254 + 1 for i in range(20))
SERVER_VERSION = "8.0.36-inbox-fake"

OK = b"\x00\x00\x00\x02\x00\x00\x00"
EOF = b"\xfe\x00\x00\x02\x00"


def _err(code: int, msg: str) -> bytes:
    return b"\xff" + struct.pack("<H", code) + msg.encode()


def _lenenc_str(s: bytes) -> bytes:
    assert len(s) < 0xFB
    return bytes([len(s)]) + s


def _coldef(name: bytes) -> bytes:
    """Minimal ColumnDefinition41 (string fields lenenc, fixed tail)."""
    return (
        _lenenc_str(b"def") + _lenenc_str(b"") + _lenenc_str(b"")
        + _lenenc_str(b"") + _lenenc_str(name) + _lenenc_str(name)
        + b"\x0c" + struct.pack("<HIBHB", 33, 64, 0xFD, 0, 0) + b"\x00\x00"
    )


class _Handler(socketserver.BaseRequestHandler):
    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            c = self.request.recv(n - len(buf))
            if not c:
                raise ConnectionError("client went away")
            buf += c
        return buf

    def _read_packet(self):
        out, seq = b"", 0
        while True:
            head = self._recv_exact(4)
            length = int.from_bytes(head[:3], "little")
            seq = head[3]
            out += self._recv_exact(length)
            if length < 0xFFFFFF:
                return out, seq

    def _send_packet(self, payload, seq):
        # faithful 16 MB continuation split, like a real server
        while True:
            chunk, payload = payload[:0xFFFFFF], payload[0xFFFFFF:]
            self.request.sendall(
                len(chunk).to_bytes(3, "little") + bytes([seq]) + chunk
            )
            seq = (seq + 1) % 256
            if len(chunk) < 0xFFFFFF:
                return

    def handle(self):
        srv = self.server
        caps = (
            CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH | 1
        )
        hs = (
            bytes([0x0A])
            + SERVER_VERSION.encode() + b"\x00"
            + struct.pack("<I", 1234)          # thread id
            + SEED[:8] + b"\x00"               # auth-plugin-data-part-1
            + struct.pack("<H", caps & 0xFFFF)
            + bytes([33])                      # charset
            + struct.pack("<H", 2)             # status
            + struct.pack("<H", caps >> 16)
            + bytes([21])                      # auth plugin data len
            + bytes(10)                        # reserved
            + SEED[8:20] + b"\x00"             # part-2 (NUL-terminated)
            + b"mysql_native_password\x00"
        )
        self._send_packet(hs, 0)
        resp, _seq = self._read_packet()
        # HandshakeResponse41: caps u32, maxpacket u32, charset u8,
        # 23 zeros, user NUL, auth_len u8 + token, plugin NUL
        off = 4 + 4 + 1 + 23
        nul = resp.index(b"\x00", off)
        user = resp[off:nul].decode()
        off = nul + 1
        alen = resp[off]
        token = resp[off + 1 : off + 1 + alen]
        expect = native_password_scramble(srv.password, SEED)
        if srv.auth_switch_plugin:
            # account uses a different plugin: real servers answer the
            # handshake response with AuthSwitchRequest (0xFE + plugin
            # name NUL + plugin data)
            self._send_packet(
                b"\xfe" + srv.auth_switch_plugin.encode() + b"\x00" + SEED + b"\x00",
                2,
            )
            return
        if user != srv.user or token != expect:
            self._send_packet(_err(1045, f"Access denied for user '{user}'"), 2)
            return
        self._send_packet(OK, 2)

        while True:
            try:
                pkt, _seq = self._read_packet()
            except ConnectionError:
                return
            cmd = pkt[0]
            if cmd == COM_QUERY:
                sql = pkt[1:].decode("utf-8", "replace")
                srv.queries.append(sql)
                if "@@global.binlog_checksum" in sql and sql.strip().upper().startswith(
                    "SELECT"
                ):
                    # classic one-column/one-row text resultset, like a
                    # real server answering the checksum probe
                    self._send_packet(b"\x01", 1)  # column count
                    self._send_packet(_coldef(b"@@global.binlog_checksum"), 2)
                    self._send_packet(EOF, 3)
                    self._send_packet(
                        _lenenc_str(srv.binlog_checksum.encode()), 4
                    )
                    self._send_packet(EOF, 5)
                else:
                    self._send_packet(OK, 1)
            elif cmd == COM_REGISTER_SLAVE:
                srv.registered.append(_u(pkt, 1, 4))  # server id
                self._send_packet(OK, 1)
            elif cmd == COM_BINLOG_DUMP:
                pos = _u(pkt, 1, 4)
                srv.dumps.append((pos, pkt[11:].decode()))
                self._stream_dump(max(pos, 4))
                return  # dump ends the command phase (non-blocking EOF)
            else:
                self._send_packet(_err(1047, f"unknown command {cmd}"), 1)

    def _stream_dump(self, pos):
        data = self.server.binlog_bytes
        seq = 1
        off = 4
        fde = None
        if self.server.artificial_rotate:
            # real servers open every dump with an ARTIFICIAL ROTATE
            # (timestamp 0, log_pos 0) naming the dumped file — and
            # with binlog_checksum=CRC32 that rotate IS checksummed,
            # BEFORE any FDE announces the algorithm (the ADVICE r8
            # trap this server now reproduces)
            import binascii

            name = self.server.dumps[-1][1].encode() if self.server.dumps else b"x.1"
            body = (4).to_bytes(8, "little") + name
            size = 19 + len(body) + (4 if self.server.binlog_checksum == "CRC32" else 0)
            ev = struct.pack("<IBIIIH", 0, 4, 7777, size, 0, 0x20) + body
            if self.server.binlog_checksum == "CRC32":
                ev += struct.pack("<I", binascii.crc32(ev))
            self._send_packet(b"\x00" + ev, seq)
            seq += 1
        while off + 19 <= len(data):
            size = _u(data, off + 9, 4)
            ev = data[off : off + size]
            etype = data[off + 4]
            if etype == 15:  # FDE always re-sent first, like a real server
                fde = ev
                if fde is not None and off >= 4:
                    self._send_packet(b"\x00" + fde, seq)
                    seq += 1
            elif off >= pos:
                self._send_packet(b"\x00" + ev, seq)
                seq += 1
            off += size
        self._send_packet(EOF, seq)


class FakeMySQLServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(
        self,
        binlog_bytes: bytes,
        user="repl",
        password="secret",
        binlog_checksum: str = "CRC32",
        artificial_rotate: bool = False,
        auth_switch_plugin: str | None = None,
    ):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.binlog_bytes = binlog_bytes
        self.user, self.password = user, password
        #: what SELECT @@global.binlog_checksum reports (the dumped log
        #: bytes must have been built with the matching checksum flag)
        self.binlog_checksum = binlog_checksum
        #: send the real-server artificial pre-FDE ROTATE at dump start
        self.artificial_rotate = artificial_rotate
        #: respond to auth with an AuthSwitchRequest for this plugin
        self.auth_switch_plugin = auth_switch_plugin
        self.queries: list[str] = []
        self.registered: list[int] = []
        self.dumps: list[tuple[int, str]] = []

    @property
    def port(self) -> int:
        return self.server_address[1]

    def __enter__(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return self

    def __exit__(self, *exc):
        self.shutdown()
        self.server_close()
