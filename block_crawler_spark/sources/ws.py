"""WebSocket JSON-RPC transport — multiplexed in-flight requests with
reconnect/replay (reference ``core/rpc.py:104-437``).

The reference's "ultra-high performance RPC client" keeps one websocket per
client, correlates responses to requests by JSON-RPC id through a pending-
future map (inbound loop ``core/rpc.py:205-303``), and on disconnect
reconnects then RE-SENDS every still-pending request
(``core/rpc.py:327-353``).  This module reproduces those semantics
synchronously for Spark tasks:

* :meth:`WsRpcTransport.call` — one request/response (the ``RpcTransport``
  protocol shared with ``HttpRpcTransport``).
* :meth:`WsRpcTransport.call_many` — N pipelined requests sent back-to-back
  before any response is read; responses are matched by id in ANY order via
  the pending map — the multiplexing the reference gets from asyncio
  futures.
* Reconnect/replay — any socket error flips the connection; pending
  requests are re-sent verbatim on the fresh connection and answered
  results are kept, so ``call_many`` survives a mid-batch drop.

The wire layer is a dependency-free RFC 6455 client (stdlib ``socket`` +
``hashlib``/``base64``): client frames are masked as the RFC requires,
ping is answered with pong, 16-bit and 64-bit extended lengths are
supported.  TLS (wss://) wraps the socket with ``ssl`` when the URL scheme
asks for it.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import ssl
import struct
import time
import urllib.parse
from dataclasses import dataclass, field
from typing import Any

from .rpc import RpcError

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# opcodes
_OP_TEXT = 0x1
_OP_CLOSE = 0x8
_OP_PING = 0x9
_OP_PONG = 0xA


def _mask(payload: bytes, key: bytes) -> bytes:
    return bytes(b ^ key[i % 4] for i, b in enumerate(payload))


class _WsConn:
    """One live RFC 6455 connection: handshake, frame send/recv."""

    def __init__(self, url: str, timeout: float = 30.0):
        u = urllib.parse.urlsplit(url)
        if u.scheme not in ("ws", "wss"):
            raise ValueError(f"not a websocket url: {url}")
        host = u.hostname or "localhost"
        port = u.port or (443 if u.scheme == "wss" else 80)
        path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        self.sock = socket.create_connection((host, port), timeout=timeout)
        if u.scheme == "wss":
            self.sock = ssl.create_default_context().wrap_socket(self.sock, server_hostname=host)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        data = self._read_until(b"\r\n\r\n")
        resp, excess = data.split(b"\r\n\r\n", 1)
        status = resp.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise ConnectionError(f"websocket handshake rejected: {status!r}")
        want = base64.b64encode(hashlib.sha1((key + _WS_GUID).encode()).digest())
        if want not in resp:
            raise ConnectionError("websocket handshake accept-key mismatch")
        # frame bytes may arrive coalesced with the 101 — they belong to the
        # frame stream, not the handshake; dropping them would desync it
        self._buf = excess

    def _read_until(self, sep: bytes) -> bytes:
        data = b""
        while sep not in data:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("connection closed during handshake")
            data += chunk
        return data

    def _recv_exact(self, n: int) -> bytes:
        out = self._buf
        while len(out) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("connection closed mid-frame")
            out += chunk
        self._buf = out[n:]
        return out[:n]

    def send_text(self, text: str) -> None:
        payload = text.encode()
        key = os.urandom(4)
        header = bytes([0x80 | _OP_TEXT])
        n = len(payload)
        if n < 126:
            header += bytes([0x80 | n])
        elif n < 1 << 16:
            header += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            header += bytes([0x80 | 127]) + struct.pack(">Q", n)
        self.sock.sendall(header + key + _mask(payload, key))

    def recv_text(self) -> str:
        """Next complete text message (answers pings, skips pongs)."""
        while True:
            b0, b1 = self._recv_exact(2)
            opcode = b0 & 0x0F
            masked = b1 & 0x80
            n = b1 & 0x7F
            if n == 126:
                n = struct.unpack(">H", self._recv_exact(2))[0]
            elif n == 127:
                n = struct.unpack(">Q", self._recv_exact(8))[0]
            key = self._recv_exact(4) if masked else None
            payload = self._recv_exact(n)
            if key:
                payload = _mask(payload, key)
            if opcode == _OP_TEXT:
                return payload.decode()
            if opcode == _OP_PING:
                pkey = os.urandom(4)
                self.sock.sendall(bytes([0x80 | _OP_PONG, 0x80 | len(payload)]) + pkey + _mask(payload, pkey))
                continue
            if opcode == _OP_PONG:
                continue
            if opcode == _OP_CLOSE:
                raise ConnectionError("server sent close frame")
            # continuation/binary frames are not used by JSON-RPC providers
            continue

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


@dataclass
class WsRpcTransport:
    """``RpcTransport`` over websockets with the reference's reconnect/replay.

    ``pending`` maps request id → raw request text; ids leave the map only
    when their response arrives, so after ANY disconnect every unanswered
    request is re-sent on the fresh connection (``core/rpc.py:327-353``).
    Responses arriving out of order are parked in ``answered`` until their
    caller drains them — the synchronous analog of the reference's
    per-request futures (``core/rpc.py:205-303``).
    """

    endpoints: tuple[str, ...]
    max_tries: int = 5
    timeout: float = 30.0
    _conn: _WsConn | None = None
    _i: int = 0
    _id: int = 0
    pending: dict[int, str] = field(default_factory=dict)
    answered: dict[int, Any] = field(default_factory=dict)
    reconnects: int = 0  # observability: bumped on every replay cycle

    def _connect(self) -> _WsConn:
        if self._conn is None:
            url = self.endpoints[self._i % len(self.endpoints)]
            self._i += 1
            self._conn = _WsConn(url, timeout=self.timeout)
            if self.pending:  # replay every unanswered request verbatim
                self.reconnects += 1
                for raw in self.pending.values():
                    self._conn.send_text(raw)
        return self._conn

    def _drop(self) -> None:
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    def _send(self, rid: int, method: str, params: tuple) -> None:
        raw = json.dumps({"jsonrpc": "2.0", "id": rid, "method": method, "params": list(params)})
        # Register rid BEFORE touching the connection so a failure at ANY
        # stage — including the connect itself — leaves the request in
        # `pending` for the next reconnect's replay.  Double-send is avoided
        # by construction: a FRESH connection replays all of `pending`
        # (including this request) inside _connect, so only a reused
        # connection needs the explicit send.
        had_conn = self._conn is not None
        self.pending[rid] = raw
        conn = self._connect()
        if had_conn:
            conn.send_text(raw)

    def _pump_until(self, rid: int) -> Any:
        """Read frames until ``rid``'s response is in ``answered``; any other
        ids' responses are parked for their own callers."""
        delay = 0.5
        for _ in range(self.max_tries):
            try:
                conn = self._connect()
                while rid not in self.answered:
                    msg = json.loads(conn.recv_text())
                    got = msg.get("id")
                    if got in self.pending:
                        del self.pending[got]
                        self.answered[got] = msg
                break
            except (OSError, ConnectionError):
                self._drop()
                time.sleep(delay)
                delay *= 2
        if rid not in self.answered:
            raise RpcError(0, f"no response for request {rid} after {self.max_tries} tries")
        body = self.answered.pop(rid)
        if body.get("error"):
            raise RpcError(body["error"].get("code", 0), body["error"].get("message", ""))
        return body.get("result")

    # -- RpcTransport protocol ------------------------------------------------
    def call(self, method: str, *params: Any) -> Any:
        self._id += 1
        rid = self._id
        delay = 0.5
        for attempt in range(self.max_tries):
            try:
                self._send(rid, method, params)
                break
            except (OSError, ConnectionError):
                self._drop()
                self.pending.pop(rid, None)
                if attempt == self.max_tries - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        return self._pump_until(rid)

    def call_many(self, requests: list[tuple]) -> list[Any]:
        """Pipelined batch: send every request before reading any response
        (the reference's multiplexed in-flight window).  Results come back
        in REQUEST order regardless of response order; a mid-batch
        disconnect replays the unanswered tail."""
        rids = []
        for method, *params in requests:
            self._id += 1
            rids.append(self._id)
            try:
                self._send(self._id, method, tuple(params))
            except (OSError, ConnectionError):
                self._drop()  # replay happens inside _pump_until's reconnect
        return [self._pump_until(rid) for rid in rids]

    def close(self) -> None:
        self._drop()
