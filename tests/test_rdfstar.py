"""RDF-star: N-Triples-star grammar, canonical encoding, the
reification bridge (both directions, round-trip law), star_unnest, and
SPARQL-star quoted-triple patterns.

New engine surface with no reference counterpart (the reference's
format matrix ends at RDF 1.1 — docs/spec-completeness.md:131); the
strict-validation *style* follows the reference's N-Triples discipline
(reference src/Handlers/NTriplesHandler.php) extended with the RDF 1.2
quoted-term grammar.
"""

import pytest

from parser_rdf_spark import formats, rdfstar
from parser_rdf_spark.rdfstar import NTriplesError

from conftest import pages_df

E = "http://e/"
XSD_DEC = "http://www.w3.org/2001/XMLSchema#decimal"

STAR_DOC = (
    f'<< <{E}s> <{E}p> "v1" >> <{E}confidence> "0.9"^^<{XSD_DEC}> .\n'
    f"<{E}s> <{E}p> \"v1\" .\n"
    f"<< _:b <{E}knows> <{E}o> >> <{E}source> <http://crawl/page1> .\n"
    f'<< << <{E}s> <{E}p> "v1" >> <{E}derived> <{E}d> >> <{E}depth> "2" .\n'
    f'<{E}doc> <{E}claims> << <{E}s2> <{E}p2> "a >> b" >> .\n'
)


def rows(doc):
    return [
        (t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype)
        for t in rdfstar.parse_document(doc)
    ]


# ---------------------------------------------------------------------------
# grammar: positive decisions
# ---------------------------------------------------------------------------

def test_quoted_subject_and_object():
    out = rows(STAR_DOC)
    assert out[0] == (
        f'<< <{E}s> <{E}p> "v1" >>', f"{E}confidence", "literal", "0.9",
        None, XSD_DEC,
    )
    assert out[4] == (
        f"{E}doc", f"{E}claims", "quoted",
        f'<< <{E}s2> <{E}p2> "a >> b" >>', None, None,
    )


def test_nested_quoted_term():
    out = rows(STAR_DOC)
    assert out[3][0] == f'<< << <{E}s> <{E}p> "v1" >> <{E}derived> <{E}d> >>'


def test_spacing_normalizes_to_canonical():
    # irregular input spacing re-renders canonically (single spaces)
    doc = f'<<<{E}a><{E}p>"x">> <{E}q> <{E}o> .'
    assert rows(doc)[0][0] == f'<< <{E}a> <{E}p> "x" >>'


def test_literal_escapes_inside_quoted_term():
    doc = f'<< <{E}a> <{E}p> "line\\nbreak \\"q\\"" >> <{E}q> <{E}o> .'
    lex = rows(doc)[0][0]
    assert lex == f'<< <{E}a> <{E}p> "line\\nbreak \\"q\\"" >>'
    # canonical form re-parses to itself (idempotent encoding)
    parts = rdfstar.parse_quoted(lex)
    assert parts[4] == 'line\nbreak "q"'
    assert rdfstar.quoted_lexical(parts[1], parts[2], parts[3], parts[4],
                                  parts[5], parts[6]) == lex


def test_langtag_inside_quoted_term():
    doc = f'<< <{E}a> <{E}p> "été"@fr >> <{E}q> <{E}o> .'
    assert rows(doc)[0][0] == f'<< <{E}a> <{E}p> "été"@fr >>'


def test_comments_and_blanks_skipped():
    doc = "# c\n\n" + STAR_DOC
    assert len(rows(doc)) == 5


# ---------------------------------------------------------------------------
# grammar: negative decisions
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "bad",
    [
        # quoted triple in predicate position
        f"<{E}s> << <{E}a> <{E}p> <{E}b> >> <{E}o> .",
        # missing object inside the quoted term
        f"<< <{E}s> <{E}p> >> <{E}q> <{E}o> .",
        # unclosed quoted term
        f'<< <{E}s> <{E}p> "x" <{E}q> <{E}o> .',
        # literal subject inside quoted term
        f'<< "lit" <{E}p> <{E}o> >> <{E}q> <{E}o> .',
        # relative IRI inside quoted term (V7 parity)
        f"<< <rel/iri> <{E}p> <{E}o> >> <{E}q> <{E}o> .",
        # bad language tag inside quoted term (V11 parity)
        f'<< <{E}s> <{E}p> "x"@9x >> <{E}q> <{E}o> .',
        # missing terminal dot
        f"<< <{E}s> <{E}p> <{E}o> >> <{E}q> <{E}o>",
        # trailing garbage after the dot
        f"<< <{E}s> <{E}p> <{E}o> >> <{E}q> <{E}o> . extra",
    ],
)
def test_rejections(bad):
    with pytest.raises(NTriplesError):
        rdfstar.parse_document(bad)


def test_strict_ntriples_still_rejects_star():
    # the reference-pinned strict parser must NOT silently accept star
    from parser_rdf_spark import ntriples

    with pytest.raises(ntriples.NTriplesError):
        ntriples.parse_document(STAR_DOC)


# ---------------------------------------------------------------------------
# detection chain
# ---------------------------------------------------------------------------

def test_sniffer_and_chain_order():
    assert rdfstar.can_handle(STAR_DOC)
    assert not rdfstar.can_handle(f"<{E}s> <{E}p> <{E}o> .")
    # plain N-Triples keeps its reference-pinned decision
    assert formats.detect_format(f"<{E}s> <{E}p> <{E}o> .") == "n-triples"
    # a star doc sniffs as one of the line-shaped formats first (D5) —
    # the chain decision is NOT ntriples-star; the parse-stage retry is
    # what routes it (pinned below through the Spark pipeline)
    assert formats.detect_format(STAR_DOC) in ("n-triples", "turtle")


def test_explicit_format_override():
    res = formats.parse_rdf_document(STAR_DOC, "ntriples-star")
    assert res.ok and len(res.triples) == 5


def test_pipeline_retry_routes_star(spark):
    from parser_rdf_spark.parse import parse_pages, triples_of

    parsed = parse_pages(pages_df(spark, {"https://t/star": STAR_DOC}))
    row = parsed.select("format", "error_stage", "n_triples").first()
    assert row["format"] == "ntriples-star"
    assert row["error_stage"] is None and row["n_triples"] == 5


def test_bnode_scoping_consistent_inside_quoted(spark):
    from parser_rdf_spark.parse import parse_pages, triples_of

    doc = (
        f"_:b <{E}p> <{E}o> .\n"
        f"<< _:b <{E}p> <{E}o> >> <{E}conf> \"1\" .\n"
    )
    t = triples_of(parse_pages(pages_df(spark, {"https://t/s": doc})))
    rs = t.orderBy("line_no").collect()
    scoped = rs[0]["subj"]
    assert scoped.startswith("_:d") and scoped.endswith("-b")
    assert rs[1]["subj"] == f"<< {scoped} <{E}p> <{E}o> >>"


# ---------------------------------------------------------------------------
# serializer round trip
# ---------------------------------------------------------------------------

def test_serialize_roundtrip(spark):
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.serialize import to_ntriples

    t = triples_of(parse_pages(pages_df(spark, {"https://t/star": STAR_DOC})))
    lines = [r["line"] for r in to_ntriples(t).collect()]
    reparsed = rdfstar.parse_document("\n".join(lines))
    orig = {(r["subj"], r["pred"], r["obj_kind"], r["obj_value"])
            for r in t.collect()}
    assert {(x.subj, x.pred, x.obj_kind, x.obj_value) for x in reparsed} == orig


# ---------------------------------------------------------------------------
# star_unnest + reification bridge
# ---------------------------------------------------------------------------

def _star_triples(spark):
    from parser_rdf_spark.parse import parse_pages, triples_of

    return triples_of(parse_pages(pages_df(spark, {"https://t/star": STAR_DOC})))


def test_star_unnest(spark):
    from parser_rdf_spark.starops import star_unnest

    un = {r["term"]: (r["q_subj_kind"], r["q_subj"], r["q_pred"],
                      r["q_obj_kind"], r["q_obj_value"])
          for r in star_unnest(_star_triples(spark)).collect()}
    flat = f'<< <{E}s> <{E}p> "v1" >>'
    assert un[flat] == ("iri", f"{E}s", f"{E}p", "literal", "v1")
    nested = f'<< << <{E}s> <{E}p> "v1" >> <{E}derived> <{E}d> >>'
    assert un[nested][0] == "quoted" and un[nested][1] == flat


def test_reification_bridge_roundtrip(spark):
    from parser_rdf_spark.starops import reification_to_star, star_to_reification

    t = _star_triples(spark)
    reif = star_to_reification(t)
    # no quoted terms remain after mapping, statement nodes are skolem IRIs
    assert reif.filter(
        reif.subj.startswith("<<") | (reif.obj_kind == "quoted")
    ).count() == 0
    assert reif.filter(reif.subj.startswith("urn:stmt:")).count() > 0
    back = reification_to_star(reif)
    key = ["subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"]
    a = {tuple(r) for r in t.select(*key).collect()}
    b = {tuple(r) for r in back.select(*key).collect()}
    assert a == b


def test_reification_to_star_user_authored(spark):
    # hand-written reification (bnode statement node) converts too, and
    # extra annotations on the node move onto the quoted term
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.starops import reification_to_star

    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    doc = (
        f"_:st <{rdf}type> <{rdf}Statement> .\n"
        f"_:st <{rdf}subject> <{E}a> .\n"
        f"_:st <{rdf}predicate> <{E}p> .\n"
        f'_:st <{rdf}object> "v" .\n'
        f'_:st <{E}certainty> "0.7" .\n'
    )
    t = triples_of(parse_pages(pages_df(spark, {"https://t/reif": doc})))
    out = reification_to_star(t)
    got = [(r["subj"], r["pred"], r["obj_value"]) for r in out.collect()]
    assert got == [(f'<< <{E}a> <{E}p> "v" >>', f"{E}certainty", "0.7")]


def test_reification_ignores_malformed_statements(spark):
    # two rdf:subject values -> not a well-formed statement; untouched
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.starops import reification_to_star

    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    doc = (
        f"<{E}st> <{rdf}type> <{rdf}Statement> .\n"
        f"<{E}st> <{rdf}subject> <{E}a> .\n"
        f"<{E}st> <{rdf}subject> <{E}b> .\n"
        f"<{E}st> <{rdf}predicate> <{E}p> .\n"
        f'<{E}st> <{rdf}object> "v" .\n'
    )
    t = triples_of(parse_pages(pages_df(spark, {"https://t/reif": doc})))
    out = reification_to_star(t)
    assert out.count() == t.count()
    assert out.filter(out.subj.startswith("<<")).count() == 0


# ---------------------------------------------------------------------------
# N-Quads-star (allow_graph)
# ---------------------------------------------------------------------------

NQ_STAR_DOC = (
    f"<< <{E}s> <{E}p> \"v1\" >> <{E}confidence> \"0.9\" <http://g/one> .\n"
    f"<{E}doc> <{E}claims> << <{E}x> <{E}p> <{E}y> >> _:g2 .\n"
    f"<{E}a> <{E}b> <{E}c> <http://g/one> .\n"
    f"<{E}plain> <{E}p> \"no graph\" .\n"
)


def test_nquads_star_parse():
    got = [
        (t.subj, t.pred, t.obj_kind, t.obj_value, t.graph)
        for t in rdfstar.parse_document(NQ_STAR_DOC, allow_graph=True)
    ]
    assert got[0] == (f'<< <{E}s> <{E}p> "v1" >>', f"{E}confidence",
                      "literal", "0.9", "http://g/one")
    assert got[1] == (f"{E}doc", f"{E}claims", "quoted",
                      f"<< <{E}x> <{E}p> <{E}y> >>", "_:g2")
    assert got[3][4] is None


def test_nquads_star_graph_cannot_be_quoted():
    bad = f"<{E}s> <{E}p> <{E}o> << <{E}a> <{E}b> <{E}c> >> .\n"
    with pytest.raises(NTriplesError, match="graph label"):
        rdfstar.parse_document(bad, allow_graph=True)


def test_nquads_star_sniffer():
    assert rdfstar.can_handle_quads(NQ_STAR_DOC)
    # star-but-no-graph and graph-but-no-star both decline
    assert not rdfstar.can_handle_quads(STAR_DOC)
    assert not rdfstar.can_handle_quads(f"<{E}a> <{E}b> <{E}c> <http://g> .\n")


def test_pipeline_retry_routes_quads_star(spark):
    from parser_rdf_spark.parse import parse_pages, triples_of

    parsed = parse_pages(pages_df(spark, {"https://t/nqstar": NQ_STAR_DOC}))
    row = parsed.select("format", "error_stage", "n_triples").first()
    assert row["format"] == "nquads-star"
    assert row["error_stage"] is None and row["n_triples"] == 4
    t = triples_of(parsed)
    gs = {r["graph"] for r in t.collect()}
    # quads formats carry the E21 default-graph sentinel downstream
    assert "http://g/one" in gs and "_:default" in gs
    # graph bnode label doc-scoped (P5)
    assert any(g and g.startswith("_:d") and g.endswith("-g2") for g in gs)


# ---------------------------------------------------------------------------
# Turtle-star (turtle.py extension; TriG inherits)
# ---------------------------------------------------------------------------

TTL_STAR_DOC = f"""@prefix ex: <{E}> .
ex:alice ex:worksFor ex:acme {{| ex:confidence 0.9 ; ex:source <http://crawl/p1> |}} .
<< ex:bob ex:worksFor ex:acme >> ex:confidence 0.4 .
ex:doc ex:claims << ex:x ex:p "été"@fr >> .
ex:s ex:p "a", "b" {{| ex:note "only-b" |}}, "c" .
ex:t ex:q ex:o {{| ex:w ex:v {{| ex:meta "nested" |}} |}} .
"""


def ttl_rows(doc):
    from parser_rdf_spark import turtle

    return [
        (t.subj, t.pred, t.obj_kind, t.obj_value)
        for t in turtle.parse_document(doc)[0]
    ]


def test_turtle_star_quoted_terms_and_annotations():
    out = ttl_rows(TTL_STAR_DOC)
    qa = f"<< <{E}alice> <{E}worksFor> <{E}acme> >>"
    # annotation asserts the base triple AND annotates its quoted form
    assert (f"{E}alice", f"{E}worksFor", "iri", f"{E}acme") in out
    assert (qa, f"{E}confidence", "literal", "0.9") in out
    assert (qa, f"{E}source", "iri", "http://crawl/p1") in out
    # prefixed names inside explicit quoted terms resolve
    assert (f"<< <{E}bob> <{E}worksFor> <{E}acme> >>",
            f"{E}confidence", "literal", "0.4") in out
    # quoted object, canonical encoding with language tag
    assert (f"{E}doc", f"{E}claims", "quoted",
            f'<< <{E}x> <{E}p> "été"@fr >>') in out


def test_turtle_star_annotation_applies_per_object():
    out = ttl_rows(TTL_STAR_DOC)
    assert (f'<< <{E}s> <{E}p> "b" >>', f"{E}note", "literal", "only-b") in out
    assert (f'<< <{E}s> <{E}p> "a" >>', f"{E}note", "literal", "only-b") not in out
    # all three objects of the list are still asserted
    assert sum(1 for r in out if r[0] == f"{E}s") == 3


def test_turtle_star_nested_annotation():
    out = ttl_rows(TTL_STAR_DOC)
    inner = f"<< <{E}t> <{E}q> <{E}o> >>"
    assert (inner, f"{E}w", "iri", f"{E}v") in out
    assert (f"<< {inner} <{E}w> <{E}v> >>", f"{E}meta", "literal", "nested") in out


@pytest.mark.parametrize(
    "bad",
    [
        # anon bnode inside a quoted triple
        f"@prefix ex: <{E}> .\n<< [ ex:p ex:o ] ex:q ex:o2 >> ex:r ex:o3 .",
        # collection inside a quoted triple
        f"@prefix ex: <{E}> .\n<< ex:s ex:p (1 2) >> ex:r ex:o .",
        # unclosed quoted triple
        f"@prefix ex: <{E}> .\n<< ex:s ex:p ex:o ex:r ex:o2 .",
        # unclosed annotation
        f"@prefix ex: <{E}> .\nex:s ex:p ex:o {{| ex:q ex:v .",
        # quoted triple in predicate position
        f"@prefix ex: <{E}> .\nex:s << ex:a ex:b ex:c >> ex:o .",
    ],
)
def test_turtle_star_rejections(bad):
    from parser_rdf_spark import turtle

    with pytest.raises(turtle.TurtleError):
        turtle.parse_document(bad)


def test_trig_star_annotation_in_graph_block():
    from parser_rdf_spark import trig

    doc = f"""@prefix ex: <{E}> .
GRAPH <http://g/one> {{
  ex:alice ex:worksFor ex:acme {{| ex:confidence 0.9 |}} .
}}
"""
    got = [
        (t.graph, t.subj, t.pred, t.obj_value)
        for t in trig.parse_document(doc)[0]
    ]
    assert ("http://g/one", f"{E}alice", f"{E}worksFor", f"{E}acme") in got
    assert ("http://g/one", f"<< <{E}alice> <{E}worksFor> <{E}acme> >>",
            f"{E}confidence", "0.9") in got


def test_turtle_star_pipeline_and_serializer_roundtrip(spark):
    # full pipeline: Turtle-star sniffs as turtle (D6) and parses
    # natively; serialize back to Turtle and re-parse — triple-identical
    from parser_rdf_spark.parse import parse_pages, triples_of
    from parser_rdf_spark.serialize import to_turtle_docs
    from parser_rdf_spark import turtle

    t = triples_of(parse_pages(pages_df(spark, {"https://t/ttlstar": TTL_STAR_DOC})))
    key = ["subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"]
    orig = {tuple(r) for r in t.select(*key).collect()}
    doc = to_turtle_docs(t).first()["turtle"]
    reparsed = {
        (x.subj, x.pred, x.obj_kind, x.obj_value, x.obj_lang, x.obj_datatype)
        for x in turtle.parse_document(doc)[0]
    }
    assert reparsed == orig


# ---------------------------------------------------------------------------
# quoted patterns (bgp + SPARQL text)
# ---------------------------------------------------------------------------

ANNOT_DOC = (
    f'<< <{E}alice> <{E}worksFor> <{E}acme> >> <{E}confidence> "0.9" .\n'
    f'<< <{E}bob> <{E}worksFor> <{E}acme> >> <{E}confidence> "0.4" .\n'
    f'<< <{E}bob> <{E}worksFor> <{E}globex> >> <{E}confidence> "0.8" .\n'
    f"<< <{E}alice> <{E}worksFor> <{E}acme> >> <{E}source> <http://crawl/p1> .\n"
    f"<{E}alice> <{E}worksFor> <{E}acme> .\n"
)


def _annot_spo(spark):
    from parser_rdf_spark.bgp import triples_spo
    from parser_rdf_spark.parse import parse_pages, triples_of

    return triples_spo(
        triples_of(parse_pages(pages_df(spark, {"https://t/a": ANNOT_DOC})))
    )


def test_bgp_quoted_pattern_inner_vars(spark):
    from parser_rdf_spark.bgp import bgp_query

    out = bgp_query(
        _annot_spo(spark),
        [(("quoted", "?s", f"{E}worksFor", "?o"), f"{E}confidence", "?c")],
    )
    got = {(r["s"], r["o"], r["c"]) for r in out.collect()}
    assert got == {
        (f"{E}alice", f"{E}acme", "0.9"),
        (f"{E}bob", f"{E}acme", "0.4"),
        (f"{E}bob", f"{E}globex", "0.8"),
    }


def test_bgp_quoted_pattern_joins_across_patterns(spark):
    from parser_rdf_spark.bgp import bgp_query

    out = bgp_query(
        _annot_spo(spark),
        [
            (("quoted", "?s", f"{E}worksFor", "?o"), f"{E}confidence", "?c"),
            (("quoted", "?s", f"{E}worksFor", "?o"), f"{E}source", "?src"),
        ],
    )
    got = [(r["s"], r["o"], r["c"], r["src"]) for r in out.collect()]
    assert got == [(f"{E}alice", f"{E}acme", "0.9", "http://crawl/p1")]


def test_bgp_quoted_pattern_nested_raises(spark):
    from parser_rdf_spark.bgp import bgp_query

    with pytest.raises(ValueError, match="nested quoted"):
        bgp_query(
            _annot_spo(spark),
            [(("quoted", ("quoted", "?a", "?b", "?c"), "?p", "?o"),
              f"{E}confidence", "?v")],
        ).collect()


def test_sparql_star_select(spark):
    from parser_rdf_spark.sparql import sparql_query

    q = f"""
    PREFIX e: <{E}>
    SELECT ?s ?conf WHERE {{
      << ?s e:worksFor e:acme >> e:confidence ?conf .
    }} ORDER BY ?s
    """
    got = [(r["s"], r["conf"]) for r in sparql_query(_annot_spo(spark), q).collect()]
    assert got == [(f"{E}alice", "0.9"), (f"{E}bob", "0.4")]


def test_sparql_star_ask_constant(spark):
    from parser_rdf_spark.sparql import sparql_query

    q = f'PREFIX e: <{E}> ASK {{ << e:bob e:worksFor e:globex >> e:confidence "0.8" . }}'
    assert sparql_query(_annot_spo(spark), q).first()["ask"] is True
    q2 = f'PREFIX e: <{E}> ASK {{ << e:bob e:worksFor e:acme >> e:confidence "0.8" . }}'
    assert sparql_query(_annot_spo(spark), q2).first()["ask"] is False


def test_sparql_star_annotation_block(spark):
    # {| … |} = base pattern AND quoted-subject patterns; only the
    # asserted edge (alice worksFor acme appears both quoted and plain
    # in ANNOT_DOC) solves the conjunction
    from parser_rdf_spark.sparql import sparql_query

    q = f"""
    PREFIX e: <{E}>
    SELECT ?s ?o ?c ?src WHERE {{
      ?s e:worksFor ?o {{| e:confidence ?c ; e:source ?src |}} .
    }}
    """
    got = [(r["s"], r["o"], r["c"], r["src"])
           for r in sparql_query(_annot_spo(spark), q).collect()]
    assert got == [(f"{E}alice", f"{E}acme", "0.9", "http://crawl/p1")]


def test_sparql_star_annotation_requires_plain_pattern(spark):
    from parser_rdf_spark.sparql import SparqlError, sparql_query

    q = f"PREFIX e: <{E}> SELECT ?c WHERE {{ ?s e:worksFor+ ?o {{| e:confidence ?c |}} . }}"
    with pytest.raises(SparqlError, match="plain triple pattern"):
        sparql_query(_annot_spo(spark), q)


def test_sparql_star_nested_annotation_rejected(spark):
    from parser_rdf_spark.sparql import SparqlError, sparql_query

    q = f"""PREFIX e: <{E}>
    SELECT ?m WHERE {{ ?s e:worksFor ?o {{| e:confidence ?c {{| e:meta ?m |}} |}} . }}"""
    with pytest.raises(SparqlError, match="nested annotation"):
        sparql_query(_annot_spo(spark), q)


def test_results_formats_quoted_bindings(spark):
    # a quoted term in a solution binding renders as its lexical form
    # (TSV verbatim; SRJ/XML use the flat 'triple' type), never as a
    # quoted-string literal
    import json

    from parser_rdf_spark.results import (
        to_sparql_json_bindings,
        to_sparql_tsv,
        to_sparql_xml_results,
    )
    from parser_rdf_spark.sparql import sparql_query

    q = f"PREFIX e: <{E}> SELECT ?s WHERE {{ ?s e:confidence \"0.9\" . }}"
    sol = sparql_query(_annot_spo(spark), q)
    lex = f"<< <{E}alice> <{E}worksFor> <{E}acme> >>"
    tsv = [r["line"] for r in to_sparql_tsv(sol).orderBy("pos").collect()]
    assert tsv == ["?s", lex]
    srj = json.loads(to_sparql_json_bindings(sol).first()["binding"])
    assert srj["s"] == {"type": "triple", "value": lex}
    xml = to_sparql_xml_results(sol).first()["result"]
    assert "<triple>" in xml and "&lt;&lt;" in xml


def test_sparql_star_construct_template_rejected(spark):
    from parser_rdf_spark.sparql import SparqlError, sparql_query

    q = f"""
    PREFIX e: <{E}>
    CONSTRUCT {{ << ?s e:worksFor ?o >> e:seen "1" . }}
    WHERE {{ ?s e:worksFor ?o . }}
    """
    with pytest.raises(SparqlError):
        sparql_query(_annot_spo(spark), q)


def test_sparql_star_graph_name_rejected(spark):
    from parser_rdf_spark.sparql import SparqlError, sparql_query

    q = f"PREFIX e: <{E}> SELECT ?x WHERE {{ GRAPH << e:a e:b e:c >> {{ ?x e:p e:o . }} }}"
    with pytest.raises(SparqlError, match="cannot name a GRAPH"):
        sparql_query(_annot_spo(spark), q)
