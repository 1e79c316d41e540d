"""HttpRpcTransport against a live in-process JSON-RPC server: happy path,
endpoint round-robin fail-over, retry/backoff, and RPC error surfacing."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from block_crawler_spark.sources.rpc import HttpRpcTransport, RpcError


class _Handler(BaseHTTPRequestHandler):
    behavior = "ok"  # ok | http500 | rpc_error | flaky
    flaky_state = {"fails_left": 2}

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if self.behavior == "http500" or (
            self.behavior == "flaky" and self.flaky_state["fails_left"] > 0
        ):
            if self.behavior == "flaky":
                self.flaky_state["fails_left"] -= 1
            self.send_response(500)
            self.end_headers()
            return
        if self.behavior == "rpc_error":
            resp = {"jsonrpc": "2.0", "id": body["id"], "error": {"code": -32005, "message": "too big"}}
        else:
            resp = {"jsonrpc": "2.0", "id": body["id"], "result": {"echo": body["method"], "params": body["params"]}}
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def server():
    def make(behavior):
        handler = type("H", (_Handler,), {"behavior": behavior, "flaky_state": {"fails_left": 2}})
        srv = HTTPServer(("127.0.0.1", 0), handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv, f"http://127.0.0.1:{srv.server_port}"

    servers = []

    def factory(behavior="ok"):
        srv, url = make(behavior)
        servers.append(srv)
        return url

    yield factory
    for s in servers:
        s.shutdown()


def test_happy_path(server):
    url = server("ok")
    t = HttpRpcTransport(endpoints=(url,))
    out = t.call("eth_blockNumber", "0x1", True)
    assert out == {"echo": "eth_blockNumber", "params": ["0x1", True]}


def test_rpc_error_surfaces_with_code(server):
    url = server("rpc_error")
    t = HttpRpcTransport(endpoints=(url,))
    with pytest.raises(RpcError) as ei:
        t.call("eth_getLogs", {})
    assert ei.value.code == -32005


def test_round_robin_failover(server):
    bad, good = server("http500"), server("ok")
    t = HttpRpcTransport(endpoints=(bad, good), max_tries=4)
    # first attempt hits the dead endpoint, retry rotates to the live one
    assert t.call("m")["echo"] == "m"
    assert t.call("m2")["echo"] == "m2"


def test_retry_exhaustion_raises(server):
    bad = server("http500")
    t = HttpRpcTransport(endpoints=(bad,), max_tries=2)
    with pytest.raises(Exception):
        t.call("m")


def test_flaky_endpoint_recovers(server):
    flaky = server("flaky")  # fails twice, then succeeds
    t = HttpRpcTransport(endpoints=(flaky,), max_tries=5)
    assert t.call("m")["echo"] == "m"
