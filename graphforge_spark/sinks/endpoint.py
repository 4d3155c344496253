"""SPARQL 1.1 Protocol endpoint (stdlib-only) over a forged warehouse.

Reference parity: the reference's query flow is a browser text box →
Comunica → rendered bindings (docs/scripts/document.js:930-985). The
engine-side analog any downstream SPARQL client expects is the standard
protocol: ``GET /sparql?query=…`` / ``POST /sparql`` (form-encoded or
``application/sparql-query`` body), content-negotiated against the
result serializers in :mod:`graphforge_spark.sinks.results`.

Scope: a demo/ops surface, not a production server — single
SparkSession, ``ThreadingHTTPServer``, binds loopback by default. The
heavy lifting (layer resolution, SPARQL compilation, serialization) is
all :func:`graphforge_spark.pipeline.query_warehouse`; this module is
~100 lines of protocol plumbing, which is the point: on a real cluster
the same function runs behind whatever service tier the deployment
already has.

Protocol behavior:
- SELECT/ASK results: ``application/sparql-results+json`` (default),
  ``…+xml``, ``text/csv``, ``text/tab-separated-values`` via Accept;
- CONSTRUCT/DESCRIBE: ``application/n-triples`` (their only form here);
- parse errors / unsupported syntax → 400 with the loud ValueError text
  (the module's no-silent-failure contract carried onto the wire);
- anything else → 500.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_FORMATS = [
    # (media type, query_warehouse results_format) — order = server preference
    ("application/sparql-results+json", "json"),
    ("application/sparql-results+xml", "xml"),
    ("text/csv", "csv"),
    ("text/tab-separated-values", "tsv"),
]


def _pick_format(accept: str) -> tuple[str, str]:
    """Crude-but-correct Accept matching: first server-preferred media
    type the header mentions (substring match covers q-params and
    lists); ``*/*`` or an empty header → JSON."""
    if not accept or "*/*" in accept:
        return _FORMATS[0]
    for media, fmt in _FORMATS:
        if media in accept:
            return media, fmt
    return _FORMATS[0]


def make_handler(spark, warehouse: str, layer: str = "auto", max_rows: int = 10_000):
    """Build the request-handler class bound to one warehouse."""
    from graphforge_spark.pipeline import query_warehouse

    class SparqlHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # tests stay quiet
            pass

        def _run(self, query: str) -> None:
            accept = self.headers.get("Accept", "")
            media, fmt = _pick_format(accept)
            try:
                result = query_warehouse(
                    spark, warehouse, query, layer=layer, max_rows=max_rows
                )
                if result.columns == ["subj", "pred", "obj"]:
                    # graph form (CONSTRUCT/DESCRIBE) serializes as N-Triples
                    media = "application/n-triples"
                    body = query_warehouse(
                        spark, warehouse, query, layer=layer,
                        results_format="ntriples", max_rows=max_rows,
                    )
                else:
                    from graphforge_spark.sinks import results as res

                    if fmt == "json":
                        body = (
                            res.ask_results_json(result)
                            if result.columns == ["ask"]
                            else res.sparql_results_json(result, max_rows)
                        )
                    elif fmt == "xml":
                        body = res.sparql_results_xml(result, max_rows)
                    elif fmt == "csv":
                        body = res.sparql_results_csv(result, max_rows)
                    else:
                        body = res.sparql_results_tsv(result, max_rows)
            except ValueError as e:
                self._respond(400, "text/plain", str(e))
                return
            except Exception as e:  # noqa: BLE001 — wire boundary
                self._respond(500, "text/plain", f"internal error: {e}")
                return
            self._respond(200, media, body)

        def _respond(self, code: int, media: str, body: str) -> None:
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", f"{media}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self) -> None:
            parsed = urlparse(self.path)
            qs = parse_qs(parsed.query)
            if "query" not in qs:
                self._respond(400, "text/plain", "missing 'query' parameter")
                return
            self._run(qs["query"][0])

        def do_POST(self) -> None:
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode("utf-8")
            ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
            if ctype == "application/sparql-query":
                query = body
            elif ctype == "application/x-www-form-urlencoded":
                qs = parse_qs(body)
                if "query" not in qs:
                    self._respond(400, "text/plain", "missing 'query' parameter")
                    return
                query = qs["query"][0]
            else:
                self._respond(
                    415,
                    "text/plain",
                    f"unsupported Content-Type {ctype!r} (use "
                    "application/sparql-query or x-www-form-urlencoded)",
                )
                return
            self._run(query)

    return SparqlHandler


def serve(
    spark,
    warehouse: str,
    host: str = "127.0.0.1",
    port: int = 0,
    layer: str = "auto",
    max_rows: int = 10_000,
    background: bool = False,
) -> ThreadingHTTPServer:
    """Start the endpoint. ``port=0`` picks a free port (read it back
    from ``server.server_address``). ``background=True`` serves from a
    daemon thread and returns immediately (tests, notebooks); otherwise
    blocks in ``serve_forever`` until interrupted. Always returns the
    server object — call ``.shutdown()`` to stop a background server."""
    server = ThreadingHTTPServer(
        (host, port), make_handler(spark, warehouse, layer=layer, max_rows=max_rows)
    )
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server
    try:
        server.serve_forever()
    finally:
        server.server_close()
    return server
