"""HttpRpcTransport against a live in-process JSON-RPC server: happy path,
endpoint round-robin fail-over, retry/backoff, and RPC error surfacing."""

from __future__ import annotations

import json
import threading
import time
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


def _mk(behavior="ok"):
    handler = type(
        "H", (_Handler,), {"behavior": behavior, "flaky_state": {"fails_left": 2}, "hits": {"n": 0}}
    )
    orig = handler.do_POST

    def counting_post(self):
        type(self).hits["n"] += 1
        orig(self)

    handler.do_POST = counting_post
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, handler, f"http://127.0.0.1:{srv.server_port}"


def test_dead_endpoint_evicted_mid_batch():
    """Reference evm/rpc.py:380-422 parity: one of two endpoints dies
    mid-batch; after eviction the remaining calls never touch it."""
    srv_a, h_a, url_a = _mk()
    srv_b, h_b, url_b = _mk()
    try:
        t = HttpRpcTransport(endpoints=(url_a, url_b), max_tries=4, evict_after=1, evict_cooldown=60.0)
        assert t.call("m0")["echo"] == "m0"
        assert t.call("m1")["echo"] == "m1"
        srv_a.shutdown()
        srv_a.server_close()
        for i in range(10):  # one failed attempt max (the evicting one), then clean
            assert t.call(f"q{i}")["echo"] == f"q{i}"
        assert t.evicted() == (url_a,)
        hits_after_evict = h_b.hits["n"]
        assert t.call("tail")["echo"] == "tail"
        assert h_b.hits["n"] == hits_after_evict + 1  # served by b alone
    finally:
        srv_b.shutdown()


def test_evicted_endpoint_readmitted_after_cooldown():
    srv_a, h_a, url_a = _mk("flaky")  # fails twice, then healthy again
    h_a.flaky_state["fails_left"] = 1
    srv_b, h_b, url_b = _mk()
    try:
        t = HttpRpcTransport(endpoints=(url_a, url_b), max_tries=4, evict_after=1, evict_cooldown=0.05)
        assert t.call("m")["echo"] == "m"  # a fails → evicted; b serves
        assert t.evicted() == (url_a,)
        time.sleep(0.1)
        assert t.evicted() == ()  # cooldown elapsed
        before = h_a.hits["n"]
        for i in range(4):
            assert t.call(f"r{i}")["echo"] == f"r{i}"
        assert h_a.hits["n"] > before  # a back in rotation and serving
    finally:
        srv_a.shutdown()
        srv_b.shutdown()


def test_all_evicted_still_degrades_not_deadlocks(server):
    bad = server("http500")
    t = HttpRpcTransport(endpoints=(bad,), max_tries=2, evict_after=1, evict_cooldown=60.0)
    with pytest.raises(Exception):
        t.call("m")  # evicted after first failure, fallback still attempts it
    # single evicted endpoint is re-admitted by the fallback path on demand
    with pytest.raises(Exception):
        t.call("m2")


def test_rate_limit_429_retries_without_evicting():
    """A 429 means the server answered and is shedding load — an alive node
    must not be treated like a dead socket (reference evicts only on socket
    death, evm/rpc.py:380-422)."""
    handler = type(
        "H",
        (_Handler,),
        {"behavior": "ok", "flaky_state": {"fails_left": 2}, "rl": {"left": 2}},
    )
    orig = handler.do_POST

    def limited_post(self):
        if type(self).rl["left"] > 0:
            type(self).rl["left"] -= 1
            self.send_response(429)
            self.end_headers()
            return
        orig(self)

    handler.do_POST = limited_post
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        t = HttpRpcTransport(endpoints=(url,), max_tries=5, evict_after=1)
        assert t.call("m")["echo"] == "m"  # retried through both 429s
        assert t.evicted() == ()  # never counted against the endpoint
    finally:
        srv.shutdown()


def test_rpc_error_does_not_evict(server):
    url = server("rpc_error")
    t = HttpRpcTransport(endpoints=(url,), evict_after=1)
    with pytest.raises(RpcError):
        t.call("m")
    assert t.evicted() == ()  # server answered; application error ≠ dead node
