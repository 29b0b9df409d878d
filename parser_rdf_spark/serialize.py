"""N-Triples serialization: the sink-side twin of the parse stage.

The reference only consumes RDF; a KG-construction pipeline also has to
EMIT it (exports for downstream consumers, round-trip archival of the
canonicalized graph). This module renders the engine's full triples
schema (schemas.TRIPLES) back to canonical N-Triples lines as ONE pure
Column expression — no Python per row, serialization rides whole-stage
codegen, and `write_ntriples` is a plain distributed text write.

Escaping follows the W3C N-Triples canonical form the in-repo validator
accepts (parser_rdf_spark/ntriples.py:193 whitelist): backslash, quote,
LF, CR, TAB as two-character escapes inside literals; IRIs were
validated at parse time to contain none of ``<>"{}|^`\\`` or whitespace
(V5/V8), so they re-embed verbatim. Round-trip law (pinned by tests):
``parse(serialize(t)) == t`` for every triple the parser emits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    # order matters: backslash first, then the characters whose escapes
    # introduce new backslashes
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _term(col: Column) -> Column:
    # '_:' = bnode label, '<<' = RDF-star quoted-triple lexical form
    # (already canonical — embeds verbatim); anything else is an IRI
    return F.when(
        col.startswith("_:") | col.startswith("<<"), col
    ).otherwise(F.concat(F.lit("<"), col, F.lit(">")))


def object_term() -> Column:
    """The canonical N-Triples rendering of one full-schema OBJECT term:
    ``<iri>``, bnode/quoted lexical form verbatim, or
    ``"lex"[@lang|^^<dt>]``. Shared by the line renderers below and by
    :func:`.bgp.terms_spo` (the term-encoded relation of
    ``sparql_query(term_mode=True)``)."""
    return (
        F.when(F.col("obj_kind") == "iri", F.concat(F.lit("<"), F.col("obj_value"), F.lit(">")))
        .when(F.col("obj_kind").isin("bnode", "quoted"), F.col("obj_value"))
        .otherwise(
            F.concat(
                F.lit('"'),
                _escape_literal(F.col("obj_value")),
                F.lit('"'),
                F.when(
                    F.col("obj_lang").isNotNull(),
                    F.concat(F.lit("@"), F.col("obj_lang")),
                ).when(
                    F.col("obj_datatype").isNotNull(),
                    F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
                ).otherwise(F.lit("")),
            )
        )
    )


def _spo() -> Column:
    """The "subject predicate object" body shared by the N-Triples and
    N-Quads line renderings."""
    return F.concat(_term(F.col("subj")), F.lit(" "),
                    _term(F.col("pred")), F.lit(" "),
                    object_term())


def ntriples_line() -> Column:
    """The N-Triples rendering of one full-schema triples row."""
    return F.concat(_spo(), F.lit(" ."))


def to_ntriples(triples: DataFrame) -> DataFrame:
    """triples (full schema) → (doc_url, line) N-Triples lines, in the
    source document's line order when line_no is present."""
    out = triples.select("doc_url", "line_no", ntriples_line().alias("line"))
    return out.select("doc_url", "line")


def write_ntriples(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """Distributed N-Triples export: one text file per partition. N-Triples
    is line-delimited, so any per-file subset is itself a valid document —
    the property that makes this format the interchange default at scale."""
    lines = to_ntriples(triples).select("line")
    if partitions:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)


def encoded_spo_to_ntriples(spo: DataFrame) -> DataFrame:
    """TERM-ENCODED (subj, pred, obj) relation (:func:`.bgp.terms_spo`
    projections, term-mode CONSTRUCT output) → N-Triples ``line``
    column. The encoding IS the N-Triples term syntax, so this is one
    ``concat_ws`` — the cheapest export path in the engine (law pinned
    by tests: parse(serialize(construct)) recovers the triples)."""
    return spo.select(
        F.concat(F.concat_ws(" ", "subj", "pred", "obj"),
                 F.lit(" .")).alias("line")
    )


def nquads_line() -> Column:
    """The N-Quads rendering of one full-schema triples row: the
    N-Triples line plus a fourth graph term for named graphs. The
    engine's default-graph sentinel ('_:default', parse.py:41) and NULL
    both mean "no graph term" — those rows are emitted as plain
    N-Triples statements, exactly what the strict quad parser
    (ntriples.parse_document(allow_graph=True)) hands back as
    graph=None."""
    g = F.col("graph")
    gterm = F.when(
        g.isNull() | (g == "_:default"), F.lit("")
    ).otherwise(F.concat(F.lit(" "), _term(g)))
    return F.concat(_spo(), gterm, F.lit(" ."))


def to_nquads(triples: DataFrame) -> DataFrame:
    """triples (full schema incl. graph) → (doc_url, line) N-Quads lines."""
    return triples.select("doc_url", nquads_line().alias("line"))


def write_nquads(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """Distributed N-Quads export; like N-Triples, any per-file subset of
    the line-delimited output is itself a valid dataset document."""
    lines = to_nquads(triples).select("line")
    if partitions:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# Turtle serialization: prefix-compacted, subject-grouped blocks.
#
# The in-repo Turtle parser (turtle.py) consumes @prefix, prefixed names,
# `a`, predicate lists `;` and object lists `,` — this is the emitting
# twin, restricted to exactly that subset so the round-trip law
# ``turtle_parse(to_turtle(t)) == t`` holds for every triple the engine
# can represent. Everything is pure Column expressions: term compaction
# is a chained CASE over the prefix map (longest namespace wins), the
# per-subject block is two partial-aggregating groupBys sharing the
# (doc_url, subj) key prefix — no Python per row, no window over an
# unpartitioned relation, scale-clean.
# ---------------------------------------------------------------------------

RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

#: Default prefix map for compaction. Only locals matching
#: _SAFE_LOCAL_RE compact; everything else stays a full <IRI>, so an
#: incomplete map is never a correctness problem, only a verbosity one.
TURTLE_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "sh": "http://www.w3.org/ns/shacl#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "dcterms": "http://purl.org/dc/terms/",
    "schema": "https://schema.org/",
}

# conservative PN_LOCAL subset: no dots (a trailing '.' is a statement
# terminator in Turtle), no %-escapes — anything fancier keeps <IRI> form
_SAFE_LOCAL = "^[A-Za-z_][A-Za-z0-9_-]*$"


def _compact_iri(col: Column, prefixes: dict[str, str]) -> Column:
    """prefix:local when a namespace matches and the local name is safe,
    else <IRI>. Longest namespace wins (checked first)."""
    expr: Column = F.concat(F.lit("<"), col, F.lit(">"))
    # build the CASE chain inside-out: iterate SHORTEST namespace first so
    # the longest ends up as the outermost (first-checked) branch
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(col, len(ns) + 1, 1 << 30)
        expr = F.when(
            col.startswith(ns) & local.rlike(_SAFE_LOCAL),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(expr)
    return expr


def _turtle_subject(col: Column, prefixes: dict[str, str]) -> Column:
    # quoted-triple lexical forms ('<<…>>') are already valid Turtle-star
    # and embed verbatim — never prefix-compacted
    return F.when(
        col.startswith("_:") | col.startswith("<<"), col
    ).otherwise(_compact_iri(col, prefixes))


def _turtle_predicate(col: Column, prefixes: dict[str, str]) -> Column:
    return F.when(col == RDF_TYPE_IRI, F.lit("a")).otherwise(_compact_iri(col, prefixes))


def _turtle_object(prefixes: dict[str, str]) -> Column:
    return (
        F.when(F.col("obj_kind") == "iri", _compact_iri(F.col("obj_value"), prefixes))
        .when(F.col("obj_kind").isin("bnode", "quoted"), F.col("obj_value"))
        .otherwise(
            F.concat(
                F.lit('"'),
                _escape_literal(F.col("obj_value")),
                F.lit('"'),
                F.when(
                    F.col("obj_lang").isNotNull(),
                    F.concat(F.lit("@"), F.col("obj_lang")),
                ).when(
                    F.col("obj_datatype").isNotNull(),
                    F.concat(F.lit("^^"), _compact_iri(F.col("obj_datatype"), prefixes)),
                ).otherwise(F.lit("")),
            )
        )
    )


def to_turtle_blocks(triples: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """triples (full schema) → (doc_url, subj_line, block): one Turtle
    statement block per subject, predicates joined with ``;`` in first-
    line order, objects joined with ``,`` in line order. Deterministic:
    every ordering is pinned to line_no (struct sort), so the rendering
    is stable across partitionings and retries."""
    p = prefixes if prefixes is not None else TURTLE_PREFIXES
    t = triples.select(
        "doc_url",
        F.coalesce(F.col("line_no"), F.lit(0)).alias("line_no"),
        _turtle_subject(F.col("subj"), p).alias("s"),
        _turtle_predicate(F.col("pred"), p).alias("v"),
        _turtle_object(p).alias("o"),
    )
    per_pred = t.groupBy("doc_url", "s", "v").agg(
        F.min("line_no").alias("pred_line"),
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(line_no, o))),"
            " x -> x.o), ', ')"
        ).alias("objs"),
    )
    return per_pred.groupBy("doc_url", "s").agg(
        F.min("pred_line").alias("subj_line"),
        F.concat(
            F.col("s"), F.lit(" "),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(pred_line, v, objs))),"
                " x -> concat(x.v, ' ', x.objs)), ' ;\n    ')"
            ),
            F.lit(" ."),
        ).alias("block"),
    ).select("doc_url", "subj_line", "block")


def turtle_header(prefixes: dict[str, str] | None = None) -> str:
    p = prefixes if prefixes is not None else TURTLE_PREFIXES
    return "\n".join(f"@prefix {k}: <{v}> ." for k, v in sorted(p.items()))


def to_turtle_docs(triples: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """triples → (doc_url, turtle): one full Turtle document per source
    document — the @prefix header plus the subject blocks in first-seen
    order. The groupBy reuses the (doc_url, subj) exchange of
    :func:`to_turtle_blocks` (same key prefix), so the whole rendering is
    one shuffle chain."""
    header = turtle_header(prefixes)
    return (
        to_turtle_blocks(triples, prefixes)
        .groupBy("doc_url")
        .agg(
            F.concat(
                F.lit(header + "\n\n"),
                F.expr(
                    "array_join(transform(sort_array(collect_list(struct(subj_line, block))),"
                    " x -> x.block), '\n\n')"
                ),
            ).alias("turtle")
        )
    )


# ---------------------------------------------------------------------------
# TriG serialization: the Turtle rendering above, wrapped per named
# graph — the emitting twin of trig.py, restricted to its subset so the
# round-trip law ``trig_parse(to_trig(t)) == t`` holds (modulo bnode
# re-scoping, like every other serializer pair). Default-graph triples
# (NULL or the '_:default' sentinel) render as top-level statements;
# each named graph becomes one ``GRAPH <g> { … }`` block. Same plan
# shape as Turtle with ``graph`` added to every grouping key: three
# partial-aggregating groupBys sharing the (doc_url, graph) key prefix,
# zero Python per row.
# ---------------------------------------------------------------------------


def _trig_blocks(triples: DataFrame, prefixes: dict[str, str]) -> DataFrame:
    """(doc_url, g, subj_line, block): Turtle statement blocks keyed by
    graph term ('' = default graph)."""
    p = prefixes
    t = triples.select(
        "doc_url",
        F.when(
            F.col("graph").isNull() | (F.col("graph") == "_:default"), F.lit("")
        ).otherwise(F.col("graph")).alias("g"),
        F.coalesce(F.col("line_no"), F.lit(0)).alias("line_no"),
        _turtle_subject(F.col("subj"), p).alias("s"),
        _turtle_predicate(F.col("pred"), p).alias("v"),
        _turtle_object(p).alias("o"),
    )
    per_pred = t.groupBy("doc_url", "g", "s", "v").agg(
        F.min("line_no").alias("pred_line"),
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(line_no, o))),"
            " x -> x.o), ', ')"
        ).alias("objs"),
    )
    return per_pred.groupBy("doc_url", "g", "s").agg(
        F.min("pred_line").alias("subj_line"),
        F.concat(
            F.col("s"), F.lit(" "),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(pred_line, v, objs))),"
                " x -> concat(x.v, ' ', x.objs)), ' ;\n    ')"
            ),
            F.lit(" ."),
        ).alias("block"),
    ).select("doc_url", "g", "subj_line", "block")


def to_trig_docs(triples: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """triples (full schema, ``graph`` column) → (doc_url, trig): one
    TriG document per source document — @prefix header, default-graph
    statements first, then one GRAPH block per named graph in first-seen
    (min line_no) order. Deterministic like every serializer here."""
    p = prefixes if prefixes is not None else TURTLE_PREFIXES
    header = turtle_header(p)
    graphs = (
        _trig_blocks(triples, p)
        .groupBy("doc_url", "g")
        .agg(
            F.min("subj_line").alias("graph_line"),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(subj_line, block))),"
                " x -> x.block), '\n\n')"
            ).alias("body"),
        )
        .select(
            "doc_url",
            # default graph sorts first regardless of line numbers
            F.when(F.col("g") == "", F.lit(-1)).otherwise(F.col("graph_line")).alias("graph_line"),
            F.when(F.col("g") == "", F.col("body")).otherwise(
                F.concat(
                    F.lit("GRAPH "),
                    _turtle_subject(F.col("g"), p),
                    F.lit(" {\n"),
                    F.col("body"),
                    F.lit("\n}"),
                )
            ).alias("gblock"),
        )
    )
    return graphs.groupBy("doc_url").agg(
        F.concat(
            F.lit(header + "\n\n"),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(graph_line, gblock))),"
                " x -> x.gblock), '\n\n')"
            ),
        ).alias("trig")
    )


def write_trig(triples: DataFrame, path: str, prefixes: dict[str, str] | None = None,
               partitions: int | None = None) -> None:
    """One ``<doc-hash>.trig`` text per document under ``path`` — same
    sink discipline as :func:`write_turtle`."""
    docs = to_trig_docs(triples, prefixes)
    if partitions:
        docs = docs.repartition(partitions)
    docs.select(F.col("trig").alias("value")).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# JSON-LD serialization: flattened node objects under @graph.
#
# The emitting twin of jsonld.py, restricted to its accepted subset:
# inline @context of prefix → namespace mappings, a @graph array of flat
# node objects, {"@id"} references (nested nodes are emitted flat — the
# parser links them identically), and expanded-object literal values
# ({"@value"[, "@language" | "@type"]}). Every literal lexical form stays
# a JSON string, so numeric re-typing never rewrites a value. Leaf JSON
# is produced by Spark's to_json (correct JSON string escaping in the
# JVM); object/array assembly is pure concat over pre-escaped snippets —
# predicate keys and @id values are IRIs/CURIEs the parsers validated to
# contain no quotes or control characters (backslash is escaped here).
#
# Known sharp edge (inherent to the parser's expansion rule, which tries
# context prefixes before treating a term as an absolute IRI): an IRI
# whose SCHEME equals a context prefix but which is not inside that
# prefix's namespace (e.g. a literal IRI "foaf:xyz") re-expands to the
# namespace on reparse. No real-world scheme collides with the default
# prefix table; callers emitting exotic schemes should pass a prefix map
# that avoids them.
# ---------------------------------------------------------------------------


def _compact_bare(col: Column, prefixes: dict[str, str]) -> Column:
    """prefix:local when a namespace matches and the local is safe, else
    the raw IRI (no <> wrapping — JSON-LD keys/refs are bare strings)."""
    expr: Column = col
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(col, len(ns) + 1, 1 << 30)
        expr = F.when(
            col.startswith(ns) & local.rlike(_SAFE_LOCAL),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(expr)
    return expr


def _json_key_escape(col: Column) -> Column:
    # IRIs/CURIEs: parsers ban quotes and control chars; backslash can
    # legally survive (Turtle IRIREF allows it), so escape it
    return F.regexp_replace(col, r"\\", r"\\\\")


def _jsonld_leaf(prefixes: dict[str, str]) -> Column:
    """One value's JSON: {"@id"} for iri/bnode objects, expanded-object
    form for literals. to_json drops null struct fields."""
    is_ref = F.col("obj_kind").isin("iri", "bnode")
    leaf = F.struct(
        F.when(is_ref, F.col("obj_value")).alias("@id"),
        F.when(~is_ref, F.col("obj_value")).alias("@value"),
        F.when(~is_ref, F.col("obj_lang")).alias("@language"),
        F.when(
            ~is_ref & F.col("obj_lang").isNull() & F.col("obj_datatype").isNotNull(),
            _compact_bare(F.col("obj_datatype"), prefixes),
        ).alias("@type"),
    )
    return F.to_json(leaf, {"ignoreNullFields": "true"})


def to_jsonld_docs(triples: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """triples (full schema) → (doc_url, jsonld): one flattened JSON-LD
    document per source document. Same deterministic ordering discipline
    as the Turtle writer: nodes by first line_no, predicate keys by first
    line_no, values by line_no — stable across partitionings."""
    p = prefixes if prefixes is not None else TURTLE_PREFIXES
    ctx = "{" + ", ".join(
        f'"{k}": "{v}"' for k, v in sorted(p.items())
    ) + "}"
    t = triples.select(
        "doc_url",
        F.coalesce(F.col("line_no"), F.lit(0)).alias("line_no"),
        _json_key_escape(F.col("subj")).alias("s"),
        _json_key_escape(_compact_bare(F.col("pred"), p)).alias("v"),
        _jsonld_leaf(p).alias("o"),
    )
    per_pred = t.groupBy("doc_url", "s", "v").agg(
        F.min("line_no").alias("pred_line"),
        F.expr(
            "concat('\"', v, '\": [', "
            "array_join(transform(sort_array(collect_list(struct(line_no, o))),"
            " x -> x.o), ', '), ']')"
        ).alias("entry"),
    )
    nodes = per_pred.groupBy("doc_url", "s").agg(
        F.min("pred_line").alias("subj_line"),
        F.concat(
            F.lit('{"@id": "'), F.col("s"), F.lit('", '),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(pred_line, entry))),"
                " x -> x.entry), ', ')"
            ),
            F.lit("}"),
        ).alias("node"),
    )
    return nodes.groupBy("doc_url").agg(
        F.concat(
            F.lit('{"@context": ' + ctx + ', "@graph": ['),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(subj_line, node))),"
                " x -> x.node), ', ')"
            ),
            F.lit("]}"),
        ).alias("jsonld")
    )


def write_jsonld(triples: DataFrame, path: str, prefixes: dict[str, str] | None = None,
                 partitions: int | None = None) -> None:
    """Distributed JSON-LD export: one complete document per line
    (ndjson-style — each line is independently parseable)."""
    docs = to_jsonld_docs(triples, prefixes).select("jsonld")
    if partitions:
        docs = docs.repartition(partitions)
    docs.write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# RDF/XML serialization: rdf:Description property elements.
#
# The emitting twin of rdfxml.py, restricted to its accepted subset:
# an rdf:RDF root, rdf:Description nodes with rdf:about, property
# elements carrying rdf:resource references or text content with
# xml:lang / rdf:datatype. The parser subset has NO rdf:nodeID
# (spec-completeness:162-166), so blank-node labels cannot be
# represented: the writer is total over GROUND graphs and handles
# bnodes per `on_bnode` — 'error' (default: per-row raise_error, the
# job fails with a clear message) or 'skolemize' (bnodes become
# urn:bnode:<label> IRIs, RDF 1.1 skolemization — round-trips modulo
# that mapping). Literals containing XML-1.0-illegal control characters
# (anything < 0x20 except TAB/LF/CR) also raise. Everything else is
# chained-regexp escaping + the same two-groupBy assembly as the other
# writers; namespace prefixes are the well-known table where the
# predicate namespace matches, else a deterministic md5-derived prefix,
# with per-document xmlns declarations collected through the
# aggregation.
# ---------------------------------------------------------------------------

# '-' is last in the class so it needs no escaping — the pattern embeds
# verbatim in both the Python regexp_extract and the SQL expr string
_NCNAME_TAIL = "([A-Za-z_][A-Za-z0-9_.-]*)$"
_XML_ILLEGAL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"


def _xml_text_escape(col: Column) -> Column:
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    # raw CR is normalized away by XML parsers; keep it as a char ref
    return F.regexp_replace(out, "\r", "&#13;")


def _xml_attr_escape(col: Column) -> Column:
    out = _xml_text_escape(col)
    out = F.regexp_replace(out, '"', "&quot;")
    out = F.regexp_replace(out, "\n", "&#10;")
    return F.regexp_replace(out, "\t", "&#9;")


def _xml_guard(col: Column, what: str) -> Column:
    """raise_error on XML-1.0-unrepresentable control characters."""
    return F.when(
        col.rlike(_XML_ILLEGAL),
        F.expr(f"raise_error('rdfxml serialize: {what} contains an "
               "XML-1.0-illegal control character')"),
    ).otherwise(col)


def _skolem_or_error(col: Column, on_bnode: str, what: str) -> Column:
    if on_bnode == "skolemize":
        return F.when(
            col.startswith("_:"),
            F.concat(F.lit("urn:bnode:"), F.substring(col, 3, 1 << 30)),
        ).otherwise(col)
    return F.when(
        col.startswith("_:"),
        F.expr(f"raise_error('rdfxml serialize: blank-node {what} is not "
               "representable in the rdf:nodeID-free RDF/XML subset; pass "
               "on_bnode=skolemize or export Turtle/N-Quads instead')"),
    ).otherwise(col)


def _xml_prefix(ns_col: Column, prefixes: dict[str, str]) -> Column:
    """Deterministic prefix for a predicate namespace: the well-known
    table where it matches, else 'n' + md5(ns)[:8]."""
    expr: Column = F.concat(F.lit("n"), F.substring(F.md5(ns_col), 1, 8))
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        expr = F.when(ns_col == ns, F.lit(pfx)).otherwise(expr)
    return F.when(ns_col == "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
                  F.lit("rdf")).otherwise(expr)


def to_rdfxml_docs(triples: DataFrame, prefixes: dict[str, str] | None = None,
                   on_bnode: str = "error") -> DataFrame:
    """triples (full schema) → (doc_url, rdfxml): one RDF/XML document
    per source document. Deterministic ordering as the other writers:
    subjects by first line_no, property elements by line_no."""
    if on_bnode not in ("error", "skolemize"):
        raise ValueError("on_bnode must be 'error' or 'skolemize'")
    p = prefixes if prefixes is not None else TURTLE_PREFIXES

    pred_local = F.regexp_extract(F.col("pred"), _NCNAME_TAIL, 1)
    pred_ns = F.expr(
        f"substring(pred, 1, length(pred) - length(regexp_extract(pred, '{_NCNAME_TAIL}', 1)))"
    )
    pred_local = F.when(
        pred_local == "",
        F.expr("raise_error(concat('rdfxml serialize: predicate IRI has no "
               "NCName-splittable local part: ', pred))"),
    ).otherwise(pred_local)

    subj = _skolem_or_error(F.col("subj"), on_bnode, "subject")
    obj_ref = _skolem_or_error(F.col("obj_value"), on_bnode, "object")
    pfx = _xml_prefix(pred_ns, p)
    qname = F.concat(pfx, F.lit(":"), pred_local)

    lit_body = _xml_text_escape(_xml_guard(F.col("obj_value"), "literal"))
    prop_el = F.when(
        F.col("obj_kind").isin("iri", "bnode"),
        F.concat(F.lit("<"), qname, F.lit(' rdf:resource="'),
                 _xml_attr_escape(obj_ref), F.lit('"/>')),
    ).otherwise(
        F.concat(
            F.lit("<"), qname,
            F.when(F.col("obj_lang").isNotNull(),
                   F.concat(F.lit(' xml:lang="'), F.col("obj_lang"), F.lit('"')))
             .when(F.col("obj_datatype").isNotNull(),
                   F.concat(F.lit(' rdf:datatype="'),
                            _xml_attr_escape(F.col("obj_datatype")), F.lit('"')))
             .otherwise(F.lit("")),
            F.lit(">"), lit_body, F.lit("</"), qname, F.lit(">"),
        )
    )

    t = triples.select(
        "doc_url",
        F.coalesce(F.col("line_no"), F.lit(0)).alias("line_no"),
        subj.alias("s"),
        prop_el.alias("prop"),
        # rdf: is already declared on the root — an empty decl here keeps
        # the flatten/join below from emitting a duplicate attribute
        F.when(
            pred_ns == "http://www.w3.org/1999/02/22-rdf-syntax-ns#", F.lit("")
        ).otherwise(
            F.concat(F.lit(" xmlns:"), pfx, F.lit('="'),
                     _xml_attr_escape(pred_ns), F.lit('"'))
        ).alias("xmlns_decl"),
    )
    nodes = t.groupBy("doc_url", "s").agg(
        F.min("line_no").alias("subj_line"),
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(line_no, prop))),"
            " x -> x.prop), '\n    ')"
        ).alias("props"),
        F.collect_set("xmlns_decl").alias("decls"),
    ).select(
        "doc_url", "subj_line",
        F.concat(F.lit('  <rdf:Description rdf:about="'),
                 _xml_attr_escape(F.col("s")), F.lit('">\n    '),
                 F.col("props"), F.lit("\n  </rdf:Description>")).alias("node"),
        "decls",
    )
    return nodes.groupBy("doc_url").agg(
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?>\n<rdf:RDF xmlns:rdf="'
                  'http://www.w3.org/1999/02/22-rdf-syntax-ns#"'),
            F.expr(
                "array_join(array_sort(array_distinct(flatten(collect_list(decls)))), '')"
            ),
            F.lit(">\n"),
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(subj_line, node))),"
                " x -> x.node), '\n')"
            ),
            F.lit("\n</rdf:RDF>"),
        ).alias("rdfxml")
    )


def write_rdfxml(triples: DataFrame, path: str, prefixes: dict[str, str] | None = None,
                 on_bnode: str = "error", partitions: int | None = None) -> None:
    """Distributed RDF/XML export: one complete document per row. Unlike
    the line-based formats a partition file is NOT one valid XML
    document (XML forbids multiple roots) — consumers read row-wise."""
    docs = to_rdfxml_docs(triples, prefixes, on_bnode=on_bnode).select("rdfxml")
    if partitions:
        docs = docs.repartition(partitions)
    docs.write.mode("overwrite").text(path)


def write_turtle(triples: DataFrame, path: str, prefixes: dict[str, str] | None = None,
                 partitions: int | None = None) -> None:
    """Distributed Turtle export. Each row is a complete document with its
    own @prefix header, so a partition file (a concatenation of documents —
    re-declaring a prefix is legal Turtle) is itself a valid document."""
    docs = to_turtle_docs(triples, prefixes).select("turtle")
    if partitions:
        docs = docs.repartition(partitions)
    docs.write.mode("overwrite").text(path)
