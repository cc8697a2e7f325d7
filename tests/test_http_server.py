"""Socket-level tests for the bounded stdlib HTTP server.

The reference gets connection robustness from uvicorn
(/root/reference/Dockerfile:58-62); our stdlib server must provide the same
guarantees explicitly: bounded concurrent connections (fast 503 on flood),
per-connection socket timeouts (slow clients can't pin a worker), oversize
bodies refused before the read (413), and rate-limit rejection before the
body read (429). These tests drive a real server on an ephemeral port.
"""

from __future__ import annotations

import http.client
import socket
import threading
import time

import pytest

from instacart_next_order_recommendation_tpu.api.http import (
    App,
    Request,
    Response,
    make_server,
)


def _start(app: App, **kw):
    server = make_server(app, host="127.0.0.1", port=0, **kw)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, server.server_address[1]


def _stop(server):
    server.shutdown()
    server.server_close()


def _mini_app() -> App:
    app = App(title="test")

    @app.get("/health")
    def health(req: Request) -> Response:
        return Response(200, {"status": "ok"})

    @app.post("/echo")
    def echo(req: Request) -> Response:
        return Response(200, {"len": len(req.body), "query": req.query})

    @app.get("/query")
    def query(req: Request) -> Response:
        return Response(200, req.query)

    return app


def _get(port: int, path: str, timeout: float = 5.0):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("GET", path)
        resp = conn.getresponse()
        return resp.status, resp.read()
    finally:
        conn.close()


class TestQueryString:
    def test_query_params_parsed_and_routing_ignores_them(self):
        server, port = _start(_mini_app())
        try:
            status, body = _get(port, "/query?a=1&b=two%20words")
            assert status == 200
            import json

            assert json.loads(body) == {"a": "1", "b": "two words"}
            # Query string must not break route matching.
            status, _ = _get(port, "/health?probe=1")
            assert status == 200
        finally:
            _stop(server)


class TestBodyCap:
    def test_oversize_body_rejected_before_read(self):
        server, port = _start(_mini_app(), max_body_bytes=100)
        try:
            # Declare a large body but never send it: the 413 must arrive
            # anyway, proving the server responds from headers alone.
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            sock.sendall(
                b"POST /echo HTTP/1.1\r\nHost: x\r\n"
                b"Content-Type: application/json\r\nContent-Length: 100000\r\n\r\n"
            )
            resp = http.client.HTTPResponse(sock)
            resp.begin()
            assert resp.status == 413
            assert b"too large" in resp.read()
            sock.close()
        finally:
            _stop(server)

    def test_body_at_cap_accepted(self):
        server, port = _start(_mini_app(), max_body_bytes=100)
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("POST", "/echo", body=b"x" * 100)
            resp = conn.getresponse()
            assert resp.status == 200
            conn.close()
        finally:
            _stop(server)


class TestInvalidContentLength:
    def test_negative_content_length_rejected(self):
        """A negative Content-Length must get 400 without any body read —
        rfile.read(-1) would read until EOF, defeating the size cap."""
        server, port = _start(_mini_app(), max_body_bytes=100)
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            sock.sendall(
                b"POST /echo HTTP/1.1\r\nHost: x\r\nContent-Length: -1\r\n\r\n"
            )
            resp = http.client.HTTPResponse(sock)
            resp.begin()
            assert resp.status == 400
            sock.close()
            status, _ = _get(port, "/health")
            assert status == 200
        finally:
            _stop(server)

    def test_garbage_content_length_rejected(self):
        server, port = _start(_mini_app())
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            sock.sendall(
                b"POST /echo HTTP/1.1\r\nHost: x\r\nContent-Length: banana\r\n\r\n"
            )
            resp = http.client.HTTPResponse(sock)
            resp.begin()
            assert resp.status == 400
            sock.close()
        finally:
            _stop(server)


class TestKeepAliveRecycling:
    def test_connection_close_when_nearly_saturated(self):
        """Near the connection cap, responses carry Connection: close so
        pooled idle keep-alives can't pin the server at saturation."""
        server, port = _start(_mini_app(), max_concurrency=2)
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("GET", "/health")
            resp = conn.getresponse()
            assert resp.status == 200
            # 1 of 2 slots held -> free (1) <= max(1, 2//4) -> saturated.
            assert resp.getheader("Connection") == "close"
            conn.close()
        finally:
            _stop(server)

    def test_keep_alive_preserved_when_unsaturated(self):
        server, port = _start(_mini_app(), max_concurrency=64)
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("GET", "/health")
            resp = conn.getresponse()
            resp.read()
            assert resp.getheader("Connection") != "close"
            # Connection is reusable.
            conn.request("GET", "/health")
            assert conn.getresponse().status == 200
            conn.close()
        finally:
            _stop(server)


class TestSlowClient:
    def test_idle_connection_times_out_and_server_stays_healthy(self):
        server, port = _start(_mini_app(), socket_timeout=0.5)
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            # Send a partial request line, then stall. The server must drop
            # the connection after its socket timeout rather than waiting
            # forever on the incomplete request.
            sock.sendall(b"GET /heal")
            sock.settimeout(5)
            deadline = time.monotonic() + 4
            closed = False
            while time.monotonic() < deadline:
                try:
                    if sock.recv(1024) == b"":
                        closed = True
                        break
                except socket.timeout:
                    break
            assert closed, "server did not close the stalled connection"
            sock.close()
            status, _ = _get(port, "/health")
            assert status == 200
        finally:
            _stop(server)

    def test_stalled_body_read_closes_connection(self):
        server, port = _start(_mini_app(), socket_timeout=0.5)
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            # Complete headers, but only half the promised body.
            sock.sendall(
                b"POST /echo HTTP/1.1\r\nHost: x\r\nContent-Length: 50\r\n\r\n"
                + b"y" * 10
            )
            sock.settimeout(5)
            data = b"x"
            deadline = time.monotonic() + 4
            while time.monotonic() < deadline:
                try:
                    data = sock.recv(1024)
                    if data == b"":
                        break
                except socket.timeout:
                    break
            assert data == b"", "server did not close on stalled body read"
            sock.close()
            status, _ = _get(port, "/health")
            assert status == 200
        finally:
            _stop(server)


class TestConcurrencyBound:
    def test_flood_gets_fast_503(self):
        server, port = _start(_mini_app(), max_concurrency=2, socket_timeout=5.0)
        try:
            # Occupy both worker slots with idle connections (each holds a
            # handler thread blocked reading the request line).
            holders = [
                socket.create_connection(("127.0.0.1", port), timeout=5)
                for _ in range(2)
            ]
            time.sleep(0.2)  # let both handlers claim their slots
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            sock.sendall(b"GET /health HTTP/1.1\r\nHost: x\r\n\r\n")
            resp = http.client.HTTPResponse(sock)
            resp.begin()
            assert resp.status == 503
            assert b"overloaded" in resp.read()
            sock.close()
            for h in holders:
                h.close()
            # Slots must be released once holders disconnect.
            time.sleep(0.3)
            status, _ = _get(port, "/health")
            assert status == 200
        finally:
            _stop(server)


class TestRateLimitBeforeBody:
    def test_over_limit_rejected_without_body(self):
        from instacart_next_order_recommendation_tpu.api.limiter import RateLimiter

        app = _mini_app()
        limiter = RateLimiter("1/minute")
        app.add_middleware(limiter.middleware)
        app.early_checks.append(limiter.early_check)
        server, port = _start(app)
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("POST", "/echo", body=b"ok")
            assert conn.getresponse().status == 200
            conn.close()
            # Second request is over limit; declare a body and never send
            # it — the 429 must arrive from headers alone.
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            sock.sendall(
                b"POST /echo HTTP/1.1\r\nHost: x\r\nContent-Length: 100000\r\n\r\n"
            )
            resp = http.client.HTTPResponse(sock)
            resp.begin()
            assert resp.status == 429
            sock.close()
        finally:
            _stop(server)

    def test_early_check_does_not_consume_budget(self):
        from instacart_next_order_recommendation_tpu.api.limiter import RateLimiter

        limiter = RateLimiter("2/minute")
        req = Request("POST", "/echo", {}, client_ip="1.2.3.4")
        # Early checks alone never consume budget.
        for _ in range(5):
            assert limiter.early_check(req) is None
        assert limiter.allow("1.2.3.4")
        assert limiter.allow("1.2.3.4")
        assert limiter.early_check(req) is not None
        assert not limiter.allow("1.2.3.4")

    def test_exempt_paths_skip_early_check(self):
        from instacart_next_order_recommendation_tpu.api.limiter import RateLimiter

        limiter = RateLimiter("1/minute")
        assert limiter.allow("9.9.9.9")
        assert limiter.over_limit("9.9.9.9")
        req = Request("GET", "/health", {}, client_ip="9.9.9.9")
        assert limiter.early_check(req) is None


class TestAppWiring:
    def test_create_app_registers_early_check(self):
        from instacart_next_order_recommendation_tpu.api.app import create_app

        app = create_app(load_model_on_startup=False, rate_limit="1/minute")
        assert len(app.early_checks) == 1
        # Exhaust the budget through the middleware path, then the early
        # check (as the socket server would run it) must reject.
        from instacart_next_order_recommendation_tpu.api.http import TestClient

        with TestClient(app, client_ip="7.7.7.7") as client:
            client.post("/feedback", json={"events": []})
            req = Request("POST", "/feedback", {}, client_ip="7.7.7.7")
            early = app.check_early(req)
            assert early is not None and early.status_code == 429
