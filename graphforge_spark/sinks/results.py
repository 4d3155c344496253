"""W3C SPARQL 1.1 Query Results serializers — JSON, CSV, TSV.

Reference parity: the reference consumes Comunica's ``bindingsStream``
directly into an HTML table (docs/scripts/document.js:956-985), but the
engine it embeds speaks the standard result formats on the wire —
``application/sparql-results+json`` and the CSV/TSV result formats are
what any SPARQL client downstream of this engine expects. These
serializers make the engine's bindings frames (from ``plans.sparql``)
interchange-clean without any new execution machinery.

Term typing follows the engine's single discriminator (SURVEY §1.2, from
graphProcessor.js:222): ``_:`` prefix → blank node, ``http`` prefix →
IRI, anything else → literal. Literal annotations ride the frame as
companion columns named ``<var>__lang`` / ``<var>__dt`` (the same
annotation data the Turtle/JSON-LD extractors surface as
``obj_lang``/``obj_dt`` — alias them to the convention when exporting an
annotated extraction frame). NULL cells are UNBOUND variables (what a
null-extending OPTIONAL produces) and are omitted from JSON bindings and
emitted as empty fields in CSV/TSV, exactly per the specs.

Scale note: the three string serializers are presentation sinks for
human/client-sized results — bounded like ``render_table`` (limit +
toLocalIterator, one partition in flight). For data-sized exports use
``export_results_csv``: the columns are formatted JVM-side and written
distributed through Spark's csv writer (RFC 4180 quoting via doubled
quotes), one header line per part file.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.sinks.render import _bounded_rows

_LANG_SUF = "__lang"
_DT_SUF = "__dt"


def _split_vars(columns: list[str]) -> tuple[list[str], dict[str, str], dict[str, str]]:
    """Partition frame columns into result variables and the annotation
    companions they own. A ``__lang``/``__dt`` column with no base
    variable in the frame is an error (a typo would otherwise leak an
    annotation column out as a result variable)."""
    base = [c for c in columns if not c.endswith((_LANG_SUF, _DT_SUF))]
    base_set = set(base)
    lang, dt = {}, {}
    for c in columns:
        if c.endswith(_LANG_SUF):
            v = c[: -len(_LANG_SUF)]
            if v not in base_set:
                raise ValueError(f"annotation column {c!r} has no base variable {v!r}")
            lang[v] = c
        elif c.endswith(_DT_SUF):
            v = c[: -len(_DT_SUF)]
            if v not in base_set:
                raise ValueError(f"annotation column {c!r} has no base variable {v!r}")
            dt[v] = c
    return base, lang, dt


def _json_term(value: str, lang: str | None, dt: str | None) -> dict:
    """One RDF term → its sparql-results+json object, typed by the
    engine's discriminator. Blank-node values drop the ``_:`` prefix per
    the spec (the label alone is the value)."""
    if value.startswith("_:"):
        return {"type": "bnode", "value": value[2:]}
    if value.startswith("http"):
        return {"type": "uri", "value": value}
    out: dict = {"type": "literal", "value": value}
    if lang:  # xml:lang wins over datatype, mirroring the N-Triples sink
        out["xml:lang"] = lang
    elif dt:
        out["datatype"] = dt
    return out


def sparql_results_json(result: DataFrame, max_rows: int = 10_000) -> str:
    """Serialize a bindings frame as ``application/sparql-results+json``:
    ``{"head": {"vars": [...]}, "results": {"bindings": [...]}}``.
    Unbound (NULL) variables are omitted from each binding object, per
    spec. Row order is whatever the frame's plan produced (ORDER BY
    survives; otherwise unspecified, as in SPARQL itself)."""
    vars_, lang_cols, dt_cols = _split_vars(result.columns)
    bindings = []
    for row in _bounded_rows(result, max_rows):
        b = {}
        for v in vars_:
            val = row[v]
            if val is None:
                continue
            lg = row[lang_cols[v]] if v in lang_cols else None
            dt = row[dt_cols[v]] if v in dt_cols else None
            b[v] = _json_term(str(val), lg, dt)
        bindings.append(b)
    return json.dumps(
        {"head": {"vars": vars_}, "results": {"bindings": bindings}},
        ensure_ascii=False,
        sort_keys=False,
    )


def ask_results_json(result: DataFrame | bool) -> str:
    """Serialize an ASK result — either the one-row boolean frame that
    ``plans.sparql`` returns (column ``ask``) or a plain bool — as
    ``{"head": {}, "boolean": ...}``."""
    if isinstance(result, bool):
        value = result
    else:
        if result.columns != ["ask"]:
            raise ValueError(
                f"ask_results_json wants the single boolean column 'ask', "
                f"got columns {result.columns}"
            )
        rows = _bounded_rows(result, 2)
        if len(rows) != 1:
            raise ValueError(f"ASK frame must have exactly one row, got {len(rows)}")
        value = bool(rows[0]["ask"])
    return json.dumps({"head": {}, "boolean": value})


def _csv_field(value: str) -> str:
    """RFC 4180 field: quote when the value contains a comma, quote, CR
    or LF; embedded quotes double."""
    if any(ch in value for ch in ',"\r\n'):
        return '"' + value.replace('"', '""') + '"'
    return value


def sparql_results_csv(result: DataFrame, max_rows: int = 10_000) -> str:
    """SPARQL 1.1 CSV results: header of bare variable names, then one
    row per solution with PLAIN lexical forms for every term kind (the
    CSV format deliberately erases term typing — IRIs bare, literal
    lexical forms bare, blank nodes keep their ``_:`` label). Unbound →
    empty field. Lines end CRLF per RFC 4180. Annotation companion
    columns are consumed (they shape nothing in CSV) rather than leaked
    as extra result columns."""
    vars_, _, _ = _split_vars(result.columns)
    lines = [",".join(_csv_field(v) for v in vars_)]
    for row in _bounded_rows(result, max_rows):
        lines.append(
            ",".join(
                "" if row[v] is None else _csv_field(str(row[v])) for v in vars_
            )
        )
    return "\r\n".join(lines) + "\r\n"


def _tsv_term(value: str, lang: str | None, dt: str | None) -> str:
    """One term in SPARQL TSV syntax (Turtle-ish): ``<iri>``,
    ``_:label``, or a quoted literal with ``@lang`` / ``^^<dt>`` suffix
    and Turtle string escapes (the four that matter in a tab-separated
    line-oriented format: backslash, quote, newline escapes, tab)."""
    if value.startswith("_:"):
        return value
    if value.startswith("http"):
        return f"<{value}>"
    body = (
        value.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if lang:
        return f'"{body}"@{lang}'
    if dt:
        return f'"{body}"^^<{dt}>'
    return f'"{body}"'


def sparql_results_tsv(result: DataFrame, max_rows: int = 10_000) -> str:
    """SPARQL 1.1 TSV results: header of ``?var`` names, terms in full
    SPARQL syntax (typing survives, unlike CSV), unbound → empty field,
    LF line endings."""
    vars_, lang_cols, dt_cols = _split_vars(result.columns)
    lines = ["\t".join("?" + v for v in vars_)]
    for row in _bounded_rows(result, max_rows):
        fields = []
        for v in vars_:
            val = row[v]
            if val is None:
                fields.append("")
            else:
                lg = row[lang_cols[v]] if v in lang_cols else None
                dt = row[dt_cols[v]] if v in dt_cols else None
                fields.append(_tsv_term(str(val), lg, dt))
        lines.append("\t".join(fields))
    return "\n".join(lines) + "\n"


def _xml_term(value: str, lang: str | None, dt: str | None) -> str:
    """One RDF term → its sparql-results+xml element."""
    from xml.sax.saxutils import escape, quoteattr

    if value.startswith("_:"):
        return f"<bnode>{escape(value[2:])}</bnode>"
    if value.startswith("http"):
        return f"<uri>{escape(value)}</uri>"
    if lang:
        return f"<literal xml:lang={quoteattr(lang)}>{escape(value)}</literal>"
    if dt:
        return f"<literal datatype={quoteattr(dt)}>{escape(value)}</literal>"
    return f"<literal>{escape(value)}</literal>"


def sparql_results_xml(result: DataFrame, max_rows: int = 10_000) -> str:
    """Serialize a bindings frame — or the one-column boolean ``ask``
    frame — as ``application/sparql-results+xml`` (the original W3C
    result format). Bindings for unbound (NULL) variables are omitted,
    per spec; ASK frames serialize as ``<boolean>``."""
    from xml.sax.saxutils import escape, quoteattr

    head = '<?xml version="1.0"?>\n<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
    if result.columns == ["ask"]:
        rows = _bounded_rows(result, 2)
        if len(rows) != 1:
            raise ValueError(f"ASK frame must have exactly one row, got {len(rows)}")
        flag = "true" if rows[0]["ask"] else "false"
        return f"{head}<head/><boolean>{flag}</boolean></sparql>"
    vars_, lang_cols, dt_cols = _split_vars(result.columns)
    parts = [head, "<head>"]
    parts += [f"<variable name={quoteattr(v)}/>" for v in vars_]
    parts.append("</head><results>")
    for row in _bounded_rows(result, max_rows):
        parts.append("<result>")
        for v in vars_:
            val = row[v]
            if val is None:
                continue
            lg = row[lang_cols[v]] if v in lang_cols else None
            dt = row[dt_cols[v]] if v in dt_cols else None
            parts.append(
                f"<binding name={quoteattr(v)}>{_xml_term(str(val), lg, dt)}</binding>"
            )
        parts.append("</result>")
    parts.append("</results></sparql>")
    return "".join(parts)


def export_results_csv(result: DataFrame, path: str, mode: str = "error") -> None:
    """Distributed CSV export for data-sized results: every variable
    column cast to string and written through Spark's csv writer with
    RFC 4180 quoting (``escape`` set to the quote char → doubled quotes,
    not backslashes). Each part file carries its own header line —
    the per-part header is what makes the export splittable/parallel;
    single-file spec-exact output is ``sparql_results_csv``'s job.
    Annotation companion columns are dropped, like the bounded CSV."""
    vars_, _, _ = _split_vars(result.columns)
    (
        result.select([F.col(v).cast("string").alias(v) for v in vars_])
        .write.mode(mode)
        .option("header", True)
        .option("escape", '"')
        .option("emptyValue", "")
        .csv(path)
    )
