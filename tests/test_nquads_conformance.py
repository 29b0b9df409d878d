"""N-Quads graph-term conformance: the fourth-term grammar cases the
shared N-Triples suite cannot cover (W3C N-Quads suite style, scoped to
the graph term — everything else is the shared validator, pinned by the
70-case N-Triples suite)."""

import pytest

from parser_rdf_spark.ntriples import NTriplesError, parse_document

POSITIVE = {
    # name -> (doc, expected (subj, obj_kind, graph) per triple)
    "graph_iri": (
        "<http://e/s> <http://e/p> <http://e/o> <http://g/1> .",
        [("http://e/s", "iri", "http://g/1")],
    ),
    "graph_bnode": (
        "<http://e/s> <http://e/p> <http://e/o> _:g .",
        [("http://e/s", "iri", "_:g")],
    ),
    "no_graph_defaults_none": (
        "<http://e/s> <http://e/p> <http://e/o> .",
        [("http://e/s", "iri", None)],
    ),
    "mixed_triples_and_quads": (
        "<http://e/s1> <http://e/p> <http://e/o> .\n"
        "<http://e/s2> <http://e/p> <http://e/o> <http://g/2> .",
        [("http://e/s1", "iri", None), ("http://e/s2", "iri", "http://g/2")],
    ),
    "literal_object_with_graph": (
        '<http://e/s> <http://e/p> "v"@en <http://g/1> .',
        [("http://e/s", "literal", "http://g/1")],
    ),
    "datatyped_literal_with_graph": (
        '<http://e/s> <http://e/p> "1"^^<http://e/int> <http://g/1> .',
        [("http://e/s", "literal", "http://g/1")],
    ),
    "trailing_comment_after_graph": (
        "<http://e/s> <http://e/p> <http://e/o> <http://g/1> . # done",
        [("http://e/s", "iri", "http://g/1")],
    ),
    "bnode_subject_and_graph": (
        "_:s <http://e/p> <http://e/o> _:g .",
        [("_:s", "iri", "_:g")],
    ),
}

NEGATIVE = {
    "literal_as_graph": '<http://e/s> <http://e/p> <http://e/o> "g" .',
    "five_terms": "<http://e/s> <http://e/p> <http://e/o> <http://g/1> <http://x/5> .",
    "graph_iri_with_space": "<http://e/s> <http://e/p> <http://e/o> <http://g/a b> .",
    "graph_relative_iri": "<http://e/s> <http://e/p> <http://e/o> <g1> .",
    "bad_bnode_graph_label": "<http://e/s> <http://e/p> <http://e/o> _:-bad .",
    "graph_term_without_object": "<http://e/s> <http://e/p> <http://g/1> <http://g/2> <http://g/3> .",
}


@pytest.mark.parametrize("name", sorted(POSITIVE))
def test_positive_graph_cases(name):
    doc, expected = POSITIVE[name]
    triples = parse_document(doc, allow_graph=True)
    got = [(t.subj, t.obj_kind, t.graph) for t in triples]
    assert got == expected


@pytest.mark.parametrize("name", sorted(NEGATIVE))
def test_negative_graph_cases(name):
    with pytest.raises(NTriplesError):
        parse_document(NEGATIVE[name], allow_graph=True)


@pytest.mark.parametrize("name", sorted(POSITIVE))
def test_quads_rejected_without_allow_graph(name):
    doc, expected = POSITIVE[name]
    has_graph_term = any(g is not None for _, _, g in expected)
    if not has_graph_term:
        pytest.skip("triple-only doc is valid N-Triples too")
    with pytest.raises(NTriplesError):
        parse_document(doc)
