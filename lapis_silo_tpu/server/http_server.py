"""HTTP API server: /query (POST), /info (GET, ?details=true), port 8081.

Protocol parity with reference src/silo_api/ (Poco): response formats,
status codes, the data-version header on every data endpoint, 404/405 error
bodies, and the reader/writer snapshot swap (DatabaseMutex).
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..query.errors import QueryParseError
from ..storage.database import Database

logger = logging.getLogger(__name__)


class DatabaseMutex:
    """Single-writer / multi-reader snapshot swap
    (reference src/silo_api/database_mutex.cpp)."""

    def __init__(self, database: Database | None = None):
        self._lock = threading.Lock()
        self._database = database if database is not None else Database.empty()

    def get_database(self) -> Database:
        with self._lock:
            return self._database

    def set_database(self, database: Database):
        with self._lock:
            self._database = database


class SiloHTTPServer(ThreadingHTTPServer):
    # Hundreds of concurrent clients open fresh connections per request:
    # the stdlib default listen backlog of 5 resets the overflow, and
    # Nagle + delayed ACK adds ~40 ms to every small keep-alive response.
    daemon_threads = True
    request_queue_size = 1024


class SiloRequestHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "lapis-silo-tpu"
    disable_nagle_algorithm = True

    # set by make_server
    database_mutex: DatabaseMutex = None

    def log_message(self, fmt, *args):  # route to logging, not stderr
        logger.info("%s %s", self.address_string(), fmt % args)

    def _send_json(self, status: int, payload: dict, data_version: str | None = None):
        body = json.dumps(payload, ensure_ascii=False).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if data_version is not None:
            self.send_header("data-version", data_version)
        self.end_headers()
        self.wfile.write(body)

    def _not_found(self):
        path = urlparse(self.path).path
        self._send_json(
            404, {"error": "Not found", "message": f"Resource {path} does not exist"}
        )

    def _method_not_allowed(self):
        path = urlparse(self.path).path
        self._send_json(
            405,
            {
                "error": "Method not allowed",
                "message": f"{self.command} is not allowed on resource {path}",
            },
        )

    # Any method other than GET/POST: 405 (reference rest_resource.cpp)
    def do_PUT(self):
        self._method_not_allowed()

    def do_DELETE(self):
        self._method_not_allowed()

    def do_PATCH(self):
        self._method_not_allowed()

    def do_HEAD(self):
        self._method_not_allowed()

    def do_GET(self):
        parsed = urlparse(self.path)
        if parsed.path == "/info":
            try:
                database = self.database_mutex.get_database()
            except Exception as ex:
                self._send_json(500, {"error": "Internal Server Error", "message": str(ex)})
                return
            params = parse_qs(parsed.query)
            detailed = params.get("details", ["false"])[0] == "true"
            tpu = params.get("tpu", ["false"])[0] == "true"
            if tpu:
                info = database.tpu_info()
            else:
                info = database.detailed_info() if detailed else database.info()
            self._send_json(200, info, data_version=database.data_version.value)
            return
        if parsed.path == "/query":
            self._method_not_allowed()
            return
        self._not_found()

    def do_POST(self):
        parsed = urlparse(self.path)
        if parsed.path == "/info":
            self._method_not_allowed()
            return
        if parsed.path != "/query":
            self._not_found()
            return
        length = int(self.headers.get("Content-Length", 0))
        query = self.rfile.read(length).decode("utf-8")
        try:
            database = self.database_mutex.get_database()
            result = database.execute_query(query)
            self._send_json(200, result, data_version=database.data_version.value)
        except QueryParseError as ex:
            logger.info("Query is invalid: %s", query)
            self._send_json(400, {"error": "Bad request", "message": str(ex)})
        except Exception as ex:  # noqa: BLE001 — parity: 500 without crashing
            logger.exception("query failed")
            self._send_json(500, {"error": "Internal Server Error", "message": str(ex)})


def make_server(database_mutex: DatabaseMutex, port: int = 8081) -> ThreadingHTTPServer:
    handler = type(
        "BoundSiloRequestHandler", (SiloRequestHandler,), {"database_mutex": database_mutex}
    )
    return SiloHTTPServer(("0.0.0.0", port), handler)


class CoordinatorRequestHandler(SiloRequestHandler):
    """The same public /query + /info protocol, answered by a multi-host
    Coordinator (fan-out + merge) instead of a local database. The
    data-version header is the slice's consistent version (the
    coordinator rejects mixed-version fan-outs, parallel/multihost.py)."""

    coordinator = None  # set by make_coordinator_server

    def do_GET(self):
        parsed = urlparse(self.path)
        if parsed.path == "/info":
            try:
                params = parse_qs(parsed.query)
                detailed = params.get("details", ["false"])[0] == "true"
                info = (self.coordinator.detailed_info() if detailed
                        else self.coordinator.info())
                version = self.coordinator.database.data_version.value
                self._send_json(200, info, data_version=version)
            except Exception as ex:  # noqa: BLE001
                self._send_json(500, {"error": "Internal Server Error",
                                      "message": str(ex)})
            return
        if parsed.path == "/query":
            self._method_not_allowed()
            return
        self._not_found()

    def do_POST(self):
        parsed = urlparse(self.path)
        if parsed.path == "/info":
            self._method_not_allowed()
            return
        if parsed.path != "/query":
            self._not_found()
            return
        length = int(self.headers.get("Content-Length", 0))
        query = self.rfile.read(length).decode("utf-8")
        try:
            result = self.coordinator.execute_query(query)
            version = self.coordinator.database.data_version.value
            self._send_json(200, result, data_version=version)
        except QueryParseError as ex:
            logger.info("Query is invalid: %s", query)
            self._send_json(400, {"error": "Bad request", "message": str(ex)})
        except Exception as ex:  # noqa: BLE001 — parity: 500 without crashing
            logger.exception("coordinated query failed")
            self._send_json(500, {"error": "Internal Server Error", "message": str(ex)})


def make_coordinator_server(coordinator, port: int = 8081) -> ThreadingHTTPServer:
    handler = type("BoundCoordinatorRequestHandler", (CoordinatorRequestHandler,),
                   {"coordinator": coordinator})
    return SiloHTTPServer(("0.0.0.0", port), handler)
