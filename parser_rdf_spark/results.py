"""W3C SPARQL 1.1 query-result serialization as pure Column dataflow.

The reference parser has no query engine, so result-format output is
north-star surface beyond it: a SPARQL endpoint built on this engine
needs its SELECT solutions rendered in the W3C interchange formats —
CSV/TSV (https://www.w3.org/TR/sparql11-results-csv-tsv/), the JSON
results format (https://www.w3.org/TR/sparql11-results-json/), and the
XML results format (https://www.w3.org/TR/rdf-sparql-XMLres/).

Binding representation: :func:`sparql.sparql_query` SELECT results bind
LEXICAL forms (one string column per variable — IRIs, ``_:`` labels and
literal lexical forms, datatypes/langs intentionally erased at
:func:`bgp.triples_spo`). That maps exactly onto the CSV format, which
is lossy BY SPEC (§3: "strings without datatype or language"). TSV and
JSON need full term syntax back, so they take a per-column ``kinds``
map (``'iri' | 'literal' | 'auto' | 'term'``); ``'auto'`` recovers the
term class structurally — ``_:`` prefix → blank node, absolute-IRI
shape → IRI, else plain literal — which is exact for any vocabulary
whose plain literals are not themselves absolute IRIs (documented,
caller-overridable). ``'term'`` marks a TERM-ENCODED column
(:func:`.bgp.terms_spo` / ``sparql_query(term_mode=True)`` output) and
is the one kind that is LOSSLESS: language tags surface as
``"xml:lang"`` and datatypes as ``"datatype"`` in SRJ/XML, TSV embeds
the encoding verbatim (it already is the TSV term syntax), and literal
lexical forms are unescaped exactly.

Scale shape: every serializer is a map-only projection (no shuffle, no
Python). The NDJSON surface (:func:`to_sparql_json_bindings`) is the
production path — one JSON text per solution row, written by any line
sink; :func:`sparql_json_document` assembles the single-document SRJ
form and is therefore driver-bounded BY DESIGN (a whole-result JSON
document is one string — use it for bounded result sets only, e.g.
LIMIT'd endpoint responses)."""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "to_sparql_csv",
    "to_sparql_tsv",
    "to_sparql_json_bindings",
    "sparql_json_document",
    "to_sparql_xml_results",
    "sparql_xml_document",
]

# absolute-IRI shape (RFC 3986 scheme + no characters an IRI cannot
# carry) — the structural term-class recovery for kinds='auto'
_IRI_RX = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s<>\"{}|\\^`]*$"


def _csv_field(c: Column) -> Column:
    """RFC 4180 field: quote only when the value contains a comma,
    quote, CR or LF; double embedded quotes. NULL (unbound) → empty."""
    quoted = F.concat(
        F.lit('"'), F.regexp_replace(c, '"', '""'), F.lit('"')
    )
    needs = c.rlike('[",\r\n]')
    return F.coalesce(F.when(needs, quoted).otherwise(c), F.lit(""))


def to_sparql_csv(solutions: DataFrame) -> DataFrame:
    """SELECT solutions → W3C SPARQL 1.1 CSV result lines: one ``line``
    column, header row first (``pos`` column orders: header at 0).
    Values are the lexical forms — exactly the spec's (lossy) CSV
    mapping. Map-only; write with any text sink."""
    cols = solutions.columns
    header = ",".join(cols)
    body = solutions.select(
        F.concat_ws(",", *[_csv_field(F.col(c)) for c in cols]).alias("line"),
        F.lit(1).alias("pos"),
    )
    head = body.sparkSession.createDataFrame(
        [(header, 0)], "line string, pos int"
    )
    return head.unionByName(body)


# --- 'term' kind: the column carries TERM-ENCODED values (bgp.terms_spo
# --- / sparql_query(term_mode=True) SELECT output) — the one kind that
# --- recovers language tags and datatypes LOSSLESSLY (no structural
# --- guessing): '<iri>', '_:label', '"lex"[@lang|^^<dt>]', quoted forms.
# --- A plain (non-encoded) value in a 'term' column — a LANG()/plain
# --- BIND output — renders as a simple literal.

_ENC_LIT_RX = '^"(.*)"(@[A-Za-z0-9-]+|\\^\\^<[^>]*>)?$'
_ENC_LANG_RX = '^".*"@[A-Za-z0-9-]+$'
_ENC_LANG_EXTRACT = "@([A-Za-z0-9-]+)$"
_ENC_DT_RX = '\\^\\^<[^>]*>$'
_ENC_DT_EXTRACT = "\\^\\^<([^>]*)>$"


def _decode_lit_lex(c: Column) -> Column:
    """Unescaped lexical form of an encoded literal — inverts the five
    serializer escapes (backslash pairs first via a chr(1) sentinel)."""
    s = F.regexp_extract(c, _ENC_LIT_RX, 1)
    s = F.replace(s, F.lit("\\\\"), F.lit("\x01"))
    s = F.replace(s, F.lit('\\"'), F.lit('"'))
    s = F.replace(s, F.lit("\\n"), F.lit("\n"))
    s = F.replace(s, F.lit("\\r"), F.lit("\r"))
    s = F.replace(s, F.lit("\\t"), F.lit("\t"))
    return F.replace(s, F.lit("\x01"), F.lit("\\"))


def _term_kind(c: Column, kind: str) -> Column:
    if kind == "iri":
        return F.lit("iri")
    if kind == "literal":
        return F.lit("literal")
    if kind == "term":
        return (
            F.when(c.startswith("_:"), F.lit("bnode"))
            .when(c.startswith("<<"), F.lit("quoted"))
            .when(c.startswith("<"), F.lit("iri"))
            .otherwise(F.lit("literal"))
        )
    if kind != "auto":
        raise ValueError(
            f"kind must be 'iri'|'literal'|'auto'|'term', got {kind!r}")
    return (
        F.when(c.startswith("_:"), F.lit("bnode"))
        # RDF-star quoted-triple lexical form (canonical encoding —
        # rdfstar.py); '<<' can never open an IRI or a plain literal
        # produced by this engine's relations
        .when(c.startswith("<<"), F.lit("quoted"))
        .when(c.rlike(_IRI_RX), F.lit("iri"))
        .otherwise(F.lit("literal"))
    )


def _tsv_term(c: Column, kind: str) -> Column:
    """SPARQL 1.1 TSV term syntax: ``<iri>``, ``_:label``, ``"literal"``
    with string escapes; unbound → empty field."""
    k = _term_kind(c, kind)
    lit = F.concat(
        F.lit('"'),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(c, r"\\", r"\\\\"),
                    '"', '\\\\"'),
                "\n", r"\\n"),
            "\t", r"\\t"),
        F.lit('"'),
    )
    if kind == "term":
        # encoded values ARE the TSV term syntax — embed verbatim;
        # a plain value in a term column wraps as a simple literal
        enc = (c.startswith("_:") | c.startswith("<<")
               | c.startswith("<") | c.startswith('"'))
        return F.coalesce(F.when(enc, c).otherwise(lit), F.lit(""))
    term = (
        # quoted triples embed verbatim — the canonical lexical form IS
        # the SPARQL 1.2 TSV rendering
        F.when(k.isin("bnode", "quoted"), c)
        .when(k == "iri", F.concat(F.lit("<"), c, F.lit(">")))
        .otherwise(lit)
    )
    return F.coalesce(term, F.lit(""))


def _kinds_for(cols: list[str], kinds: dict[str, str] | None) -> dict[str, str]:
    kinds = dict(kinds or {})
    unknown = set(kinds) - set(cols)
    if unknown:
        raise ValueError(f"kinds for unknown columns: {sorted(unknown)}")
    return {c: kinds.get(c, "auto") for c in cols}


def to_sparql_tsv(solutions: DataFrame,
                  kinds: dict[str, str] | None = None) -> DataFrame:
    """SELECT solutions → W3C SPARQL 1.1 TSV result lines (``line`` +
    ``pos`` columns, header ``?var<TAB>?var`` at pos 0). Terms carry
    full syntax — see module docstring for the ``kinds`` contract."""
    cols = solutions.columns
    km = _kinds_for(cols, kinds)
    header = "\t".join("?" + c for c in cols)
    body = solutions.select(
        F.concat_ws(
            "\t", *[_tsv_term(F.col(c), km[c]) for c in cols]
        ).alias("line"),
        F.lit(1).alias("pos"),
    )
    head = body.sparkSession.createDataFrame(
        [(header, 0)], "line string, pos int"
    )
    return head.unionByName(body)


def _binding_struct(c: Column, kind: str) -> Column:
    k = _term_kind(c, kind)
    if kind == "term":
        # lossless SRJ binding: language-tagged literals carry
        # "xml:lang", typed literals "datatype" (to_json drops nulls)
        has_lang = c.rlike(_ENC_LANG_RX)
        has_dt = c.startswith('"') & c.rlike(_ENC_DT_RX)
        value = (
            F.when(k == "bnode", c.substr(F.lit(3), F.length(c)))
            .when(k == "quoted", c)
            .when(k == "iri", c.substr(F.lit(2), F.length(c) - 2))
            .when(c.startswith('"'), _decode_lit_lex(c))
            .otherwise(c)  # plain value (LANG()/plain BIND output)
        )
        return F.when(
            c.isNotNull(),
            F.struct(
                F.when(k == "iri", F.lit("uri"))
                .when(k == "bnode", F.lit("bnode"))
                .when(k == "quoted", F.lit("triple"))
                .otherwise(F.lit("literal"))
                .alias("type"),
                value.alias("value"),
                F.when(has_lang,
                       F.regexp_extract(c, _ENC_LANG_EXTRACT, 1))
                .alias("xml:lang"),
                F.when(has_dt,
                       F.regexp_extract(c, _ENC_DT_EXTRACT, 1))
                .alias("datatype"),
            ),
        )
    return F.when(
        c.isNotNull(),
        F.struct(
            F.when(k == "iri", F.lit("uri"))
            .when(k == "bnode", F.lit("bnode"))
            # flat engine rendering of RDF 1.2's "triple" binding type:
            # the value is the canonical lexical form (re-parseable),
            # not the spec's recursive subject/predicate/object object
            .when(k == "quoted", F.lit("triple"))
            .otherwise(F.lit("literal"))
            .alias("type"),
            F.when(k == "bnode", F.substring_index(c, "_:", -1))
            .otherwise(c)
            .alias("value"),
        ),
    )


def to_sparql_json_bindings(solutions: DataFrame,
                            kinds: dict[str, str] | None = None) -> DataFrame:
    """SELECT solutions → one SRJ binding object per row (``binding``
    string column): ``{"var": {"type": "uri|literal|bnode", "value":
    ...}, ...}`` — the scalable NDJSON form (map-only, unbound
    variables omitted per spec via null-dropping to_json)."""
    cols = solutions.columns
    km = _kinds_for(cols, kinds)
    obj = F.struct(
        *[_binding_struct(F.col(c), km[c]).alias(c) for c in cols]
    )
    return solutions.select(F.to_json(obj).alias("binding"))


def sparql_json_document(solutions: DataFrame,
                         kinds: dict[str, str] | None = None,
                         max_rows: int = 100_000) -> str:
    """The single-document W3C SPARQL JSON results form. Collects —
    bounded by ``max_rows`` (raises beyond it): a whole-result JSON
    document is inherently one driver-side string, so this surface is
    for LIMIT'd endpoint responses; stream the NDJSON form otherwise."""
    cols = solutions.columns
    rows = to_sparql_json_bindings(solutions, kinds).take(max_rows + 1)
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; use "
            "to_sparql_json_bindings for unbounded results"
        )
    return json.dumps(
        {
            "head": {"vars": cols},
            "results": {"bindings": [json.loads(r.binding) for r in rows]},
        },
        ensure_ascii=False,
    )


def _xml_escape(c: Column) -> Column:
    out = F.regexp_replace(c, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def to_sparql_xml_results(solutions: DataFrame,
                          kinds: dict[str, str] | None = None) -> DataFrame:
    """SELECT solutions → W3C SPARQL Query Results XML ``<result>``
    elements, one per row (``result`` string column) — the scalable
    middle of the document (https://www.w3.org/TR/rdf-sparql-XMLres/).
    Map-only; assemble the envelope with :func:`sparql_xml_document`
    or stream the elements between a constant header/footer."""
    cols = solutions.columns
    km = _kinds_for(cols, kinds)
    parts = []
    for c in cols:
        col, k = F.col(c), _term_kind(F.col(c), km[c])
        if km[c] == "term":
            # lossless XML binding: xml:lang / datatype attributes
            has_lang = col.rlike(_ENC_LANG_RX)
            has_dt = col.startswith('"') & col.rlike(_ENC_DT_RX)
            lit_open = (
                F.when(has_lang,
                       F.concat(F.lit('<literal xml:lang="'),
                                F.regexp_extract(col, _ENC_LANG_EXTRACT, 1),
                                F.lit('">')))
                .when(has_dt,
                      F.concat(F.lit('<literal datatype="'),
                               _xml_escape(
                                   F.regexp_extract(col, _ENC_DT_EXTRACT, 1)),
                               F.lit('">')))
                .otherwise(F.lit("<literal>"))
            )
            lit_body = F.when(col.startswith('"'), _decode_lit_lex(col)) \
                .otherwise(col)
            body = (
                F.when(k == "iri",
                       F.concat(F.lit("<uri>"),
                                _xml_escape(
                                    col.substr(F.lit(2), F.length(col) - 2)),
                                F.lit("</uri>")))
                .when(k == "bnode",
                      F.concat(F.lit("<bnode>"),
                               _xml_escape(col.substr(F.lit(3), F.length(col))),
                               F.lit("</bnode>")))
                .when(k == "quoted",
                      F.concat(F.lit("<triple>"), _xml_escape(col),
                               F.lit("</triple>")))
                .otherwise(F.concat(lit_open, _xml_escape(lit_body),
                                    F.lit("</literal>")))
            )
            parts.append(
                F.when(
                    col.isNotNull(),
                    F.concat(F.lit(f'<binding name="{c}">'), body,
                             F.lit("</binding>")),
                ).otherwise(F.lit(""))
            )
            continue
        body = (
            F.when(k == "iri",
                   F.concat(F.lit("<uri>"), _xml_escape(col), F.lit("</uri>")))
            .when(k == "bnode",
                  F.concat(F.lit("<bnode>"),
                           _xml_escape(F.substring_index(col, "_:", -1)),
                           F.lit("</bnode>")))
            # flat engine rendering (canonical lexical form) of the
            # RDF 1.2 <triple> binding element
            .when(k == "quoted",
                  F.concat(F.lit("<triple>"), _xml_escape(col),
                           F.lit("</triple>")))
            .otherwise(F.concat(F.lit("<literal>"), _xml_escape(col),
                                F.lit("</literal>")))
        )
        parts.append(
            F.when(
                col.isNotNull(),
                F.concat(F.lit(f'<binding name="{c}">'), body,
                         F.lit("</binding>")),
            ).otherwise(F.lit(""))
        )
    return solutions.select(
        F.concat(F.lit("<result>"), *parts, F.lit("</result>")).alias("result")
    )


def sparql_xml_document(solutions: DataFrame,
                        kinds: dict[str, str] | None = None,
                        max_rows: int = 100_000) -> str:
    """The single-document W3C XML results form — driver-bounded like
    :func:`sparql_json_document` (raises beyond ``max_rows``)."""
    cols = solutions.columns
    rows = to_sparql_xml_results(solutions, kinds).take(max_rows + 1)
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; stream "
            "to_sparql_xml_results between a constant header/footer"
        )
    head = "".join(f'<variable name="{c}"/>' for c in cols)
    body = "".join(r.result for r in rows)
    return (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        f"<head>{head}</head><results>{body}</results></sparql>"
    )
