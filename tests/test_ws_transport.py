"""WsRpcTransport vs an in-process RFC 6455 server (reference
``core/rpc.py:104-437``): multiplexed out-of-order responses, ping
handling, and reconnect-with-replay of pending requests."""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading

import pytest

from block_crawler_spark.sources.rpc import RpcError
from block_crawler_spark.sources.ws import WsRpcTransport

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class TinyWsServer(threading.Thread):
    """Minimal websocket JSON-RPC server.

    * method "echo" → its params; "boom" → a JSON-RPC error.
    * ``reverse_batch=n``: buffer n requests, answer them in REVERSE order
      (exercises the pending-map multiplexing).
    * ``drop_after=n``: close the connection after n responses, then accept
      a new connection (exercises reconnect + replay).
    * sends a PING before the first response (client must pong + continue).
    """

    def __init__(self, reverse_batch: int = 0, drop_after: int | None = None, handler=None):
        super().__init__(daemon=True)
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.reverse_batch = reverse_batch
        self.drop_after = drop_after
        self.handler = handler  # optional (method, params) -> result
        self.seen_methods: list[str] = []
        self.connections = 0
        self._stop = False

    # --- frame helpers (server side: unmasked sends, masked receives) ---
    def _recv_exact(self, conn, n):
        data = b""
        while len(data) < n:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError("client gone")
            data += chunk
        return data[:n], data[n:]

    def _recv_text(self, conn, buf):
        while True:
            while len(buf) < 2:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError("client gone")
                buf += chunk
            b0, b1 = buf[0], buf[1]
            opcode, n, off = b0 & 0x0F, b1 & 0x7F, 2
            if n == 126:
                while len(buf) < 4:
                    buf += conn.recv(65536)
                n, off = struct.unpack(">H", buf[2:4])[0], 4
            elif n == 127:
                while len(buf) < 10:
                    buf += conn.recv(65536)
                n, off = struct.unpack(">Q", buf[2:10])[0], 10
            need = off + 4 + n  # client frames are always masked
            while len(buf) < need:
                buf += conn.recv(65536)
            key, payload, buf = buf[off:off + 4], buf[off + 4:need], buf[need:]
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
            if opcode == 0x1:
                return payload.decode(), buf
            if opcode == 0x9:  # ping from client (unused) → pong
                conn.sendall(self._frame(payload, op=0xA))
            # ignore pong/close/other

    def _frame(self, payload: bytes, op=0x1) -> bytes:
        head = bytes([0x80 | op])
        n = len(payload)
        if n < 126:
            head += bytes([n])
        elif n < 1 << 16:
            head += bytes([126]) + struct.pack(">H", n)
        else:
            head += bytes([127]) + struct.pack(">Q", n)
        return head + payload

    def _handshake(self, conn):
        data = b""
        while b"\r\n\r\n" not in data:
            data += conn.recv(4096)
        key = next(
            line.split(b":", 1)[1].strip()
            for line in data.split(b"\r\n")
            if line.lower().startswith(b"sec-websocket-key")
        )
        accept = base64.b64encode(hashlib.sha1(key + _GUID.encode()).digest()).decode()
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
                f"Connection: Upgrade\r\nSec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )

    def _respond(self, req: dict) -> bytes:
        self.seen_methods.append(req["method"])
        if req["method"] == "boom":
            body = {"jsonrpc": "2.0", "id": req["id"], "error": {"code": -32000, "message": "boom"}}
        elif self.handler is not None:
            body = {"jsonrpc": "2.0", "id": req["id"], "result": self.handler(req["method"], req.get("params", []))}
        else:
            body = {"jsonrpc": "2.0", "id": req["id"], "result": req.get("params")}
        return self._frame(json.dumps(body).encode())

    def run(self):
        while not self._stop:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            self.connections += 1
            try:
                self._handshake(conn)
                conn.sendall(self._frame(b"ping!", op=0x9))  # client must absorb this
                buf, sent, batch = b"", 0, []
                while True:
                    text, buf = self._recv_text(conn, buf)
                    req = json.loads(text)
                    if self.reverse_batch:
                        batch.append(req)
                        if len(batch) == self.reverse_batch:
                            for r in reversed(batch):
                                conn.sendall(self._respond(r))
                                sent += 1
                            batch = []
                    else:
                        conn.sendall(self._respond(req))
                        sent += 1
                    if self.drop_after is not None and sent >= self.drop_after:
                        conn.close()  # mid-stream drop → client must replay
                        break
            except (ConnectionError, OSError):
                pass

    def stop(self):
        self._stop = True
        self.srv.close()


@pytest.fixture
def server():
    s = TinyWsServer()
    s.start()
    yield s
    s.stop()


def test_call_roundtrip_and_error(server):
    t = WsRpcTransport(endpoints=(f"ws://127.0.0.1:{server.port}",))
    assert t.call("echo", 1, "a") == [1, "a"]
    assert t.call("echo") == []
    with pytest.raises(RpcError):
        t.call("boom")
    t.close()


def test_call_many_multiplexes_out_of_order_responses():
    s = TinyWsServer(reverse_batch=3)
    s.start()
    try:
        t = WsRpcTransport(endpoints=(f"ws://127.0.0.1:{s.port}",))
        out = t.call_many([("echo", "x"), ("echo", "y"), ("echo", "z")])
        # responses arrived z, y, x — results must still be request-ordered
        assert out == [["x"], ["y"], ["z"]]
        t.close()
    finally:
        s.stop()


def test_reconnect_replays_pending():
    s = TinyWsServer(drop_after=2)
    s.start()
    try:
        # max_tries above the default: under a fully loaded box (the rest of
        # the suite saturating all cores) the single-threaded TinyWsServer
        # can be starved past 5 backoff rounds — the replay logic under test
        # is identical at any retry budget
        t = WsRpcTransport(endpoints=(f"ws://127.0.0.1:{s.port}",), max_tries=8)
        out = t.call_many([("echo", i) for i in range(5)])
        assert out == [[0], [1], [2], [3], [4]]
        assert s.connections >= 2, "server dropped mid-batch; client must have reconnected"
        assert t.reconnects >= 1
        assert t.pending == {}, "every request answered after replay"
        t.close()
    finally:
        s.stop()


def test_connect_failure_mid_batch_still_replays(monkeypatch):
    """A request whose CONNECT (not send) fails must still reach `pending`
    so the next successful connection replays it — previously only
    send_text failures were covered and the request was silently lost."""
    from block_crawler_spark.sources import ws as ws_mod

    s = TinyWsServer()
    s.start()
    real = ws_mod._WsConn
    n = {"made": 0}

    def flaky(*a, **k):
        n["made"] += 1
        if n["made"] == 1:
            raise ConnectionError("refused")  # dies between connect and send
        return real(*a, **k)

    monkeypatch.setattr(ws_mod, "_WsConn", flaky)
    try:
        t = WsRpcTransport(endpoints=(f"ws://127.0.0.1:{s.port}",), timeout=5.0)
        out = t.call_many([("echo", "a"), ("echo", "b")])
        assert out == [["a"], ["b"]]
        assert t.pending == {}, "the connect-failed request was replayed and answered"
        t.close()
    finally:
        s.stop()


def test_evm_logs_datasource_over_websocket(spark):
    """S7 end-to-end: spark.read.format('evm_logs') with a ws:// endpoint
    routes through WsRpcTransport (executor-side python workers connect to
    the in-process server)."""

    def eth(method, params):
        if method == "eth_blockNumber":
            return hex(5)
        if method == "eth_getLogs":
            flt = params[0]
            lo, hi = int(flt["fromBlock"], 16), int(flt["toBlock"], 16)
            return [
                {
                    "blockNumber": hex(b),
                    "transactionIndex": "0x0",
                    "logIndex": "0x0",
                    "transactionHash": "0x" + f"{b:064x}",
                    "address": "0x" + "ab" * 20,
                    "topics": ["0x" + "11" * 32],
                    "data": "0x",
                    "removed": False,
                }
                for b in range(lo, hi + 1)
            ]
        raise AssertionError(f"unexpected method {method}")

    s = TinyWsServer(handler=eth)
    s.start()
    try:
        from block_crawler_spark.sources.datasource import register

        register(spark)
        df = (
            spark.read.format("evm_logs")
            .option("endpoints", f"ws://127.0.0.1:{s.port}")
            .option("start", 0)
            .option("end", 5)
            .option("chunk_size", 100)  # one partition -> one ws connection
            .load()
        )
        rows = df.collect()
        assert len(rows) == 6
        assert {r["block_number"] for r in rows} == set(range(6))
        assert "eth_getLogs" in s.seen_methods
    finally:
        s.stop()
