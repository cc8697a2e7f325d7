"""Minimal HTTP framework (stdlib http.server) for the recommendation API.

The reference serves over FastAPI/uvicorn
(/root/reference/src/api/main.py:91-166). This framework re-creates the
pieces the service actually uses — routing, JSON request/response handling,
middleware (request logging, rate limiting), pydantic validation with
FastAPI-compatible error shapes (400/401/422/429 + ``{"detail": ...}``) — on
the Python standard library, with a sans-IO core: ``App.handle()`` processes a
request tuple without sockets, so tests drive the full middleware/route stack
in-process (the analog of FastAPI's TestClient).
"""

from __future__ import annotations

import json
import logging
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Optional

logger = logging.getLogger(__name__)


class ApiError(Exception):
    """HTTP error with status code and detail payload (FastAPI-compatible)."""

    def __init__(self, status_code: int, detail: Any):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


@dataclass
class Request:
    method: str
    path: str
    headers: dict[str, str]
    body: bytes = b""
    client_ip: str = "127.0.0.1"
    state: dict = field(default_factory=dict)

    def json(self) -> Any:
        if not self.body:
            raise ApiError(422, [{"msg": "Request body required", "type": "missing"}])
        try:
            return json.loads(self.body)
        except json.JSONDecodeError as exc:
            raise ApiError(422, [{"msg": f"Invalid JSON: {exc}", "type": "json_invalid"}])

    def header(self, name: str, default: str | None = None) -> str | None:
        return self.headers.get(name.lower(), default)


@dataclass
class Response:
    status_code: int = 200
    content: Any = None
    headers: dict[str, str] = field(default_factory=dict)
    media_type: str = "application/json"

    def body_bytes(self) -> bytes:
        if isinstance(self.content, bytes):
            return self.content
        if isinstance(self.content, str):
            return self.content.encode()
        return json.dumps(self.content).encode()

    def json(self) -> Any:
        return json.loads(self.body_bytes())


Handler = Callable[[Request], Response]
Middleware = Callable[[Request, Handler], Response]


class App:
    """Route table + middleware chain + shared state."""

    def __init__(self, title: str = ""):
        self.title = title
        self.routes: dict[tuple[str, str], Handler] = {}
        self.middleware: list[Middleware] = []
        self.state: dict[str, Any] = {}
        self.on_startup: list[Callable[[App], None]] = []
        self.on_shutdown: list[Callable[[App], None]] = []
        self._started = False
        self._lock = threading.Lock()

    # -------------------------------------------------------------- registration

    def route(self, method: str, path: str):
        def deco(fn: Handler) -> Handler:
            self.routes[(method.upper(), path)] = fn
            return fn

        return deco

    def get(self, path: str):
        return self.route("GET", path)

    def post(self, path: str):
        return self.route("POST", path)

    def add_middleware(self, mw: Middleware) -> None:
        self.middleware.append(mw)

    # -------------------------------------------------------------- lifecycle

    def startup(self) -> None:
        with self._lock:
            if self._started:
                return
            for fn in self.on_startup:
                fn(self)
            self._started = True

    def shutdown(self) -> None:
        with self._lock:
            if not self._started:
                return
            for fn in self.on_shutdown:
                fn(self)
            self._started = False

    # -------------------------------------------------------------- dispatch

    def handle(self, request: Request) -> Response:
        def terminal(req: Request) -> Response:
            handler = self.routes.get((req.method, req.path))
            if handler is None:
                if any(p == req.path for (_, p) in self.routes):
                    return Response(405, {"detail": "Method Not Allowed"})
                return Response(404, {"detail": "Not Found"})
            # Resolve expected errors (401/400/422/...) INSIDE the terminal
            # handler, below the middleware chain, the way FastAPI resolves
            # HTTPException under its middleware: the request-logging
            # middleware then sees an ordinary 4xx response — it stamps
            # X-Request-ID on it and logs an access line instead of an
            # ERROR-level stack trace for routine client errors.
            try:
                return handler(req)
            except ApiError as exc:
                return Response(exc.status_code, {"detail": exc.detail})

        chain: Handler = terminal
        for mw in reversed(self.middleware):
            chain = _bind(mw, chain)

        try:
            return chain(request)
        except ApiError as exc:
            # A middleware itself rejected the request (e.g. rate limit).
            return Response(exc.status_code, {"detail": exc.detail})
        except Exception:
            logger.exception("Unhandled error on %s %s", request.method, request.path)
            return Response(500, {"detail": "Internal Server Error"})


def _bind(mw: Middleware, nxt: Handler) -> Handler:
    def bound(req: Request) -> Response:
        try:
            return mw(req, nxt)
        except ApiError as exc:
            # Convert at the raising layer so outer middleware (request
            # logging) sees a plain status response, not an exception.
            return Response(exc.status_code, {"detail": exc.detail})

    return bound


class TestClient:
    """In-process client driving the full middleware/route stack."""

    __test__ = False  # not a pytest test class

    def __init__(self, app: App, client_ip: str = "127.0.0.1"):
        self.app = app
        self.client_ip = client_ip
        self.app.startup()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.app.shutdown()

    def request(
        self,
        method: str,
        path: str,
        json_body: Any = None,
        headers: Optional[dict[str, str]] = None,
    ) -> Response:
        body = b"" if json_body is None else json.dumps(json_body).encode()
        hdrs = {k.lower(): v for k, v in (headers or {}).items()}
        if json_body is not None:
            hdrs.setdefault("content-type", "application/json")
        req = Request(method.upper(), path, hdrs, body, self.client_ip)
        return self.app.handle(req)

    def get(self, path: str, **kw) -> Response:
        return self.request("GET", path, **kw)

    def post(self, path: str, json: Any = None, **kw) -> Response:
        return self.request("POST", path, json_body=json, **kw)


def serve(app: App, host: str = "0.0.0.0", port: int = 8000) -> None:
    """Run the app on a threading HTTP server (blocks)."""
    app.startup()

    class _Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _dispatch(self, method: str) -> None:
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length) if length else b""
            headers = {k.lower(): v for k, v in self.headers.items()}
            req = Request(method, self.path.split("?")[0], headers, body, self.client_address[0])
            resp = app.handle(req)
            payload = resp.body_bytes()
            self.send_response(resp.status_code)
            self.send_header("Content-Type", resp.media_type)
            self.send_header("Content-Length", str(len(payload)))
            for k, v in resp.headers.items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def log_message(self, fmt, *args):  # route through logging, not stderr
            logger.debug("%s - %s", self.address_string(), fmt % args)

    server = ThreadingHTTPServer((host, port), _Handler)
    logger.info("Serving %s on %s:%d", app.title, host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        app.shutdown()
        server.server_close()
