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
- anything else → 500;
- the protocol's UPDATE operation (POST /update) is served only when
  the operator passes ``allow_update=True`` (else 403) and applies
  through ``pipeline.apply_update`` — warehouse mutation with the
  version-bump recompute semantics documented there.
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


def make_handler(
    spark,
    warehouse: str,
    layer: str = "auto",
    max_rows: int = 10_000,
    allow_update: bool = False,
    n_buckets: int | None = None,
):
    """Build the request-handler class bound to one warehouse.

    ``allow_update=True`` additionally serves the protocol's update
    operation at ``/update`` (POST only, ``application/sparql-update``
    body or form-encoded ``update=``), applied through
    :func:`graphforge_spark.pipeline.apply_update` — the warehouse
    mutates and downstream stages recompute on the next forge. Off by
    default: a query endpoint must not mutate unless the operator
    opted in."""
    from graphforge_spark.pipeline import query_warehouse

    class SparqlHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # tests stay quiet
            pass

        def _run(self, query: str) -> None:
            accept = self.headers.get("Accept", "")
            media, fmt = _pick_format(accept)
            try:
                result = query_warehouse(
                    spark, warehouse, query, layer=layer, max_rows=max_rows,
                    with_annotations=True,
                )
                if result.columns in (
                    ["subj", "pred", "obj"],
                    ["subj", "pred", "obj", "obj_lang", "obj_dt"],
                ):
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

        def _update(self, update: str) -> None:
            import json as _json

            from graphforge_spark.pipeline import apply_update

            try:
                kw = {} if n_buckets is None else {"n_buckets": n_buckets}
                m = apply_update(spark, warehouse, update, **kw)
            except ValueError as e:
                self._respond(400, "text/plain", str(e))
                return
            except Exception as e:  # noqa: BLE001 — wire boundary
                self._respond(500, "text/plain", f"internal error: {e}")
                return
            self._respond(
                200,
                "application/json",
                _json.dumps(
                    {k: m[k] for k in ("triples_before", "triples_after")}
                ),
            )

        def do_POST(self) -> None:
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode("utf-8")
            ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
            is_update = urlparse(self.path).path.rstrip("/").endswith("/update")
            if is_update and not allow_update:
                self._respond(403, "text/plain", "update operations are disabled")
                return
            direct = "application/sparql-update" if is_update else "application/sparql-query"
            param = "update" if is_update else "query"
            if ctype == direct:
                text = body
            elif ctype == "application/x-www-form-urlencoded":
                qs = parse_qs(body)
                if param not in qs:
                    self._respond(400, "text/plain", f"missing {param!r} parameter")
                    return
                text = qs[param][0]
            else:
                self._respond(
                    415,
                    "text/plain",
                    f"unsupported Content-Type {ctype!r} (use "
                    f"{direct} or x-www-form-urlencoded)",
                )
                return
            (self._update if is_update else self._run)(text)

    return SparqlHandler


def serve(
    spark,
    warehouse: str,
    host: str = "127.0.0.1",
    port: int = 0,
    layer: str = "auto",
    max_rows: int = 10_000,
    allow_update: bool = False,
    n_buckets: int | None = None,
    background: bool = False,
) -> ThreadingHTTPServer:
    """Start the endpoint. ``port=0`` picks a free port (read it back
    from ``server.server_address``). ``background=True`` serves from a
    daemon thread and returns immediately (tests, notebooks); otherwise
    blocks in ``serve_forever`` until interrupted. Always returns the
    server object — call ``.shutdown()`` to stop a background server."""
    server = ThreadingHTTPServer(
        (host, port),
        make_handler(
            spark, warehouse, layer=layer, max_rows=max_rows,
            allow_update=allow_update, n_buckets=n_buckets,
        ),
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
