"""Framed-TCP NBQL entry point.

Reference: the primary query path is a length+CRC framed binary protocol
(``api/nbql/nbql.go:20-62,752-833`` — frame = [1B cmdType][4B BE length]
[payload][4B CRC32-C]; command codes PUSH 0x01, PUSHS 0x02, QUERY 0x10,
MANIPULATE 0x20; server streams one QueryResultPart 0x11 per row then
QueryEnd 0x12 with the total — ``server/tcp2_server.go:20-135``,
``server/tcp_connection_handler.go:116-280``).

This is a re-expression of that wire shape over the Spark engine: the
frame layout and command/response codes match; payloads are UTF-8 NBQL
text (requests) and JSON rows (responses) rather than the reference's
binary point encoding — the framing, streaming, and CRC discipline are
the protocol surface being rebuilt, the payload codec is façade detail.
CRC32-C (Castagnoli) is implemented here since zlib only ships CRC32.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading

from nexusbase_spark.engine import NexusEngine
from nexusbase_spark.nbql.parser import NBQLError
from nexusbase_spark.server import execute_to_json

CMD_PUSH = 0x01
CMD_PUSHS = 0x02
CMD_QUERY = 0x10
CMD_MANIPULATE = 0x20
RESP_PART = 0x11
RESP_END = 0x12
RESP_ERROR = 0x7F

_MAX_FRAME = 16 * 1024 * 1024


def _crc32c_table() -> list[int]:
    poly = 0x82F63B78  # reflected Castagnoli
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def write_frame(sock: socket.socket, cmd: int, payload: bytes) -> None:
    sock.sendall(struct.pack(">BI", cmd, len(payload)) + payload
                 + struct.pack(">I", crc32c(payload)))


def read_frame(sock: socket.socket) -> tuple[int, bytes]:
    header = _read_exact(sock, 5)
    cmd, length = struct.unpack(">BI", header)
    if length > _MAX_FRAME:
        raise ValueError(f"frame too large: {length}")
    payload = _read_exact(sock, length)
    (crc,) = struct.unpack(">I", _read_exact(sock, 4))
    if crc != crc32c(payload):
        raise ValueError("frame CRC mismatch")
    return cmd, payload


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return buf


class _Handler(socketserver.BaseRequestHandler):
    engine: NexusEngine  # bound by serve_tcp()

    def handle(self) -> None:
        while True:
            try:
                cmd, payload = read_frame(self.request)
            except (ConnectionError, OSError):
                return
            except ValueError as exc:  # bad length/CRC: report and drop conn
                try:
                    write_frame(self.request, RESP_ERROR,
                                json.dumps({"error": str(exc)}).encode())
                finally:
                    return
            try:
                self._dispatch(cmd, payload)
            except (NBQLError, ValueError) as exc:
                write_frame(self.request, RESP_ERROR,
                            json.dumps({"error": str(exc)}).encode())
            except Exception as exc:  # noqa: BLE001
                write_frame(self.request, RESP_ERROR,
                            json.dumps({"error": f"{type(exc).__name__}: {exc}"}).encode())

    def _dispatch(self, cmd: int, payload: bytes) -> None:
        text = payload.decode("utf-8")
        if cmd in (CMD_PUSH, CMD_PUSHS, CMD_MANIPULATE):
            self.engine.execute(text)
            write_frame(self.request, RESP_END, json.dumps({"total_rows": 0}).encode())
            return
        if cmd == CMD_QUERY:
            body = execute_to_json(self.engine, text)
            rows = body.get("results", [])
            # one framed part per row, then the end frame with the total
            # (server/tcp_connection_handler.go:196-280)
            for row in rows:
                write_frame(self.request, RESP_PART, json.dumps(row).encode())
            end: dict = {"total_rows": len(rows)}
            if "next_cursor" in body:
                end["next_cursor"] = body["next_cursor"]
            write_frame(self.request, RESP_END, json.dumps(end).encode())
            return
        raise ValueError(f"unknown command type 0x{cmd:02x}")


def serve_tcp(engine: NexusEngine, host: str = "127.0.0.1",
              port: int = 50052) -> socketserver.ThreadingTCPServer:
    """Start the framed-TCP server in a daemon thread (default port =
    the reference's NBQL TCP port, cmd/server/config.yaml)."""
    handler = type("BoundTCPHandler", (_Handler,), {"engine": engine})
    socketserver.ThreadingTCPServer.allow_reuse_address = True
    srv = socketserver.ThreadingTCPServer((host, port), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


class NBQLClient:
    """Minimal client for the framed protocol (the shape of
    clients/nbql/python)."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port))

    def query(self, nbql: str) -> tuple[list[dict], dict]:
        write_frame(self.sock, CMD_QUERY, nbql.encode())
        rows: list[dict] = []
        while True:
            cmd, payload = read_frame(self.sock)
            if cmd == RESP_PART:
                rows.append(json.loads(payload))
            elif cmd == RESP_END:
                return rows, json.loads(payload)
            elif cmd == RESP_ERROR:
                raise RuntimeError(json.loads(payload)["error"])
            else:
                raise RuntimeError(f"unexpected frame 0x{cmd:02x}")

    def push(self, nbql: str) -> None:
        write_frame(self.sock, CMD_PUSH, nbql.encode())
        cmd, payload = read_frame(self.sock)
        if cmd == RESP_ERROR:
            raise RuntimeError(json.loads(payload)["error"])

    def close(self) -> None:
        self.sock.close()
