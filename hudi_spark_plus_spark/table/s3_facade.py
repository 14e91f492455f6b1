"""In-process S3 conditional-write façade — a TEST/BENCH double.

Implements the documented S3 conditional-write protocol over real HTTP
against a backing directory (reads stay on the table path, like the
production deployment note in commit_log.py): ``If-None-Match: *`` PUT,
``412 PreconditionFailed`` with an XML error body when the key exists,
``200 + ETag`` on create, ``404 NoSuchKey`` on GET of a missing key.
Fault injection knobs drive the failure protocol end-to-end:

* ``conflict_budget`` — that many ``409 ConditionalRequestConflict``
  rejections before PUTs go through (the transient rejection S3 issues
  while a concurrent conditional operation is in flight);
* ``conflict_attempts`` — specific 1-based PUT indices to 409;
* ``drop_success_responses`` — the next N successful PUTs land but the
  response connection dies (the lost-2xx read-back trap);
* ``gateway_502_after_write`` — the write lands upstream but a gateway
  answers 502 (the ambiguous-5xx trap, ADVICE r11 #2).

Lives in the engine package (not tests/) because the CDC benchmark
routes a full sync pass through it via the ``engine.table.commit.
finalizer`` plugin (``finalizer_from_env`` below) to put a number on
the conditional-write publish overhead; tests/test_s3_finalizer.py
drives the protocol suite against the same class. Localhost only —
never a real network service.
"""

from __future__ import annotations

import http.server
import os
import threading

from hudi_spark_plus_spark.table.s3_finalizer import S3ConditionalPutFinalizer


class S3Facade:
    def __init__(self, root: str):
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _xml_error(self, status, code):
                body = (
                    f'<?xml version="1.0" encoding="UTF-8"?>'
                    f"<Error><Code>{code}</Code>"
                    f"<Message>{code}</Message></Error>"
                ).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/xml")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                rel = self.path.lstrip("/")
                target = os.path.join(store.root, rel)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                with store.lock:
                    store.puts_seen += 1
                    if store.puts_seen in store.conflict_attempts:
                        self._xml_error(409, "ConditionalRequestConflict")
                        return
                    if store.conflict_budget > 0:
                        store.conflict_budget -= 1
                        self._xml_error(409, "ConditionalRequestConflict")
                        return
                    if (
                        self.headers.get("If-None-Match") == "*"
                        and os.path.exists(target)
                    ):
                        self._xml_error(412, "PreconditionFailed")
                        return
                    os.makedirs(os.path.dirname(target), exist_ok=True)
                    with open(target, "wb") as fh:
                        fh.write(body)
                    if store.drop_success_responses > 0:
                        store.drop_success_responses -= 1
                        # write landed; response never reaches the client
                        self.connection.close()
                        return
                    if store.gateway_502_after_write > 0:
                        store.gateway_502_after_write -= 1
                        # write landed upstream; a gateway in front
                        # answers 502 — the client must treat it as
                        # ambiguous, not "nothing was written"
                        self._xml_error(502, "BadGateway")
                        return
                self.send_response(200)
                self.send_header(
                    "ETag", '"%032x"' % (hash(body) & (2**128 - 1))
                )
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self):
                rel = self.path.lstrip("/")
                target = os.path.join(store.root, rel)
                # read under store.lock (ADVICE r12 #3): do_PUT writes
                # the backing file under the lock, so an unlocked read
                # racing another writer's in-flight PUT could observe a
                # partially written object — a latent flake source in
                # the concurrent soak tests
                with store.lock:
                    if not os.path.exists(target):
                        self._xml_error(404, "NoSuchKey")
                        return
                    with open(target, "rb") as fh:
                        body = fh.read()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.root = root
        self.lock = threading.Lock()
        self.conflict_budget = 0
        self.drop_success_responses = 0
        self.gateway_502_after_write = 0
        self.puts_seen = 0
        self.conflict_attempts = set()  # 1-based PUT indices to 409
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def finalizer(self, **kw) -> S3ConditionalPutFinalizer:
        root, port = self.root, self.port
        kw.setdefault("backoff_base_s", 0.01)
        return S3ConditionalPutFinalizer(
            lambda p: f"http://127.0.0.1:{port}/{os.path.relpath(p, root)}",
            **kw,
        )

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


FACADE_URL_ENV = "HSP_S3_FACADE_URL"
FACADE_ROOT_ENV = "HSP_S3_FACADE_ROOT"


def finalizer_from_env(table_path: str) -> S3ConditionalPutFinalizer:
    """``engine.table.commit.finalizer`` plugin factory (spec
    ``"hudi_spark_plus_spark.table.s3_facade:finalizer_from_env"``):
    binds the table's commit publishes to the façade advertised by the
    ``HSP_S3_FACADE_URL`` / ``HSP_S3_FACADE_ROOT`` environment — how
    the CDC benchmark routes a whole sync pass through the S3
    conditional-write protocol. A production deployment supplies its
    own factory (real endpoint + request signing) through the same
    plugin spec."""
    base = os.environ.get(FACADE_URL_ENV)
    root = os.environ.get(FACADE_ROOT_ENV)
    if not base or not root:
        raise ValueError(
            f"finalizer_from_env requires {FACADE_URL_ENV} and "
            f"{FACADE_ROOT_ENV} in the environment"
        )
    return S3ConditionalPutFinalizer(
        lambda p: f"{base}/{os.path.relpath(p, root)}",
        backoff_base_s=0.01,
    )
