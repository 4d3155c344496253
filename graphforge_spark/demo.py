"""Demo-project seeding: the engine-side analog of the reference's
fetch-and-create-demo flow.

Reference parity (docs/scripts/fileSystem.js):
- `fetch_file` ≙ `fetchFile(url)` (:346-363) — fetch text content from a
  URL, raising on failure exactly like the reference's non-ok throw.
  Sources of truth differ by environment: `file://` URLs and plain
  paths always work; `http(s)://` is a REAL urllib branch but is
  default-disabled (`allow_network=False`) because this build's brief
  mandates no external data — flip the flag in a networked deployment.
- `create_demo` ≙ `createDemo(appFolderHandle)` (:271-307) — creates
  the `Project Demo/Source Data` folder layout and writes two ontology
  documents (`bfo.owl`, `pizza.owl`) into it. The reference downloads
  BFO and pizza.owl from GitHub; here the default sources are two
  bundled deterministic RDF/XML ontology documents built from the same
  fixture generators the extraction tests trust, so demo seeding is
  hermetic and repeatable. Pass explicit `sources={filename: url}` to
  fetch real ontologies in a networked deployment.

The seeded files are genuine inputs to the engine: `load_demo` reads
them back as one-document-per-file transcript rows shaped exactly like
the corpus tables, so `extract_rdfxml`-style queries run on them
unchanged.
"""

from __future__ import annotations

import os
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from graphforge_spark.fixtures import _rdfxml_class_doc, _rdfxml_property_doc
from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

DEMO_FOLDER = "Project Demo"
SOURCE_DATA_FOLDER = "Source Data"

_BFO = "http://purl.obolibrary.org/obo/"
_PIZZA = "http://www.co-ode.org/ontologies/pizza/pizza.owl#"


def _merge_rdfxml(docs: list[str]) -> str:
    """Merge several single-root <rdf:RDF> documents into ONE well-formed
    document (a .owl file has exactly one root): keep the first doc's
    opening tag, concatenate every doc's inner content."""
    opens = [d.index(">") + 1 for d in docs]
    inner = "".join(d[o : d.rindex("</rdf:RDF>")] for d, o in zip(docs, opens))
    return docs[0][: opens[0]] + inner + "</rdf:RDF>"


def _demo_bfo_owl() -> str:
    """Deterministic stand-in for the BFO classes-only ontology: a small
    class hierarchy in the exact RDF/XML shapes the extractor handles."""
    return _merge_rdfxml([
        _rdfxml_class_doc(f"{_BFO}BFO_0000001", "entity", f"{_BFO}owl_Thing", [])[0],
        _rdfxml_class_doc(
            f"{_BFO}BFO_0000002", "continuant", f"{_BFO}BFO_0000001", []
        )[0],
        _rdfxml_class_doc(
            f"{_BFO}BFO_0000003", "occurrent", f"{_BFO}BFO_0000001", []
        )[0],
    ])


def _demo_pizza_owl() -> str:
    """Deterministic stand-in for pizza.owl: classes plus an object
    property, exercising both extractor walkers."""
    return _merge_rdfxml([
        _rdfxml_class_doc(
            f"{_PIZZA}Pizza", "Pizza", f"{_PIZZA}Food", [f"{_PIZZA}Margherita"]
        )[0],
        _rdfxml_class_doc(f"{_PIZZA}PizzaTopping", "PizzaTopping", f"{_PIZZA}Food", [])[0],
        _rdfxml_property_doc(
            f"{_PIZZA}hasTopping", f"{_PIZZA}Pizza", f"{_PIZZA}PizzaTopping"
        )[0],
    ])


def fetch_file(url: str, allow_network: bool = False, timeout: float = 30.0) -> str:
    """Fetch text content from a URL (reference: fetchFile,
    fileSystem.js:346-363). `file://` URLs and bare filesystem paths are
    always allowed; `http(s)://` requires allow_network=True (this
    build runs hermetic). Raises on any failure — the reference throws
    on non-ok responses rather than returning partial content."""
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme in ("", "file"):
        path = url if parsed.scheme == "" else urllib.request.url2pathname(parsed.path)
        with open(path, encoding="utf-8") as fh:
            return fh.read()
    if parsed.scheme in ("http", "https"):
        if not allow_network:
            raise ValueError(
                f"network fetch of {url!r} requires allow_network=True "
                "(this build is hermetic by default: no external data)"
            )
        with urllib.request.urlopen(url, timeout=timeout) as resp:  # pragma: no cover
            if resp.status != 200:
                raise OSError(f"Failed to fetch URL: {resp.status}")
            return resp.read().decode("utf-8")
    raise ValueError(f"unsupported URL scheme {parsed.scheme!r} for {url!r}")


def create_demo(
    base_dir: str,
    sources: dict[str, str] | None = None,
    allow_network: bool = False,
) -> str:
    """Create the demo project folder layout and seed its source files
    (reference: createDemo, fileSystem.js:271-307 — `Project Demo/
    Source Data/{bfo.owl, pizza.owl}`). With no `sources`, writes the
    two bundled deterministic ontologies; with `sources` (a
    {filename: url} map), fetches each via `fetch_file`. Returns the
    Source Data directory path. Idempotent: rerunning overwrites with
    identical bytes (create:true semantics)."""
    src_dir = os.path.join(base_dir, DEMO_FOLDER, SOURCE_DATA_FOLDER)
    os.makedirs(src_dir, exist_ok=True)
    if sources is None:
        contents = {"bfo.owl": _demo_bfo_owl(), "pizza.owl": _demo_pizza_owl()}
    else:
        contents = {
            name: fetch_file(url, allow_network=allow_network)
            for name, url in sources.items()
        }
    for name, text in contents.items():
        with open(os.path.join(src_dir, name), "w", encoding="utf-8") as fh:
            fh.write(text)
    return src_dir


def load_demo(spark: SparkSession, base_dir: str) -> DataFrame:
    """Read the seeded demo files back as transcript-shaped rows (one
    file = one conversation of one xml-tool turn), so every extraction
    query runs on the demo project unchanged. Uses wholeTextFiles-style
    per-file reads driver-side: the demo project is a handful of
    documents by construction (the reference seeds exactly two)."""
    src_dir = os.path.join(base_dir, DEMO_FOLDER, SOURCE_DATA_FOLDER)
    rows = []
    for name in sorted(os.listdir(src_dir)):
        with open(os.path.join(src_dir, name), encoding="utf-8") as fh:
            rows.append((f"demo:{name}", 0, "tool", fh.read(), "xml", None))
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
