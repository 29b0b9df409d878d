"""Fuzz the never-throws contracts with hypothesis.

Web-scale rule (formats.parse_rdf_document docstring): a bad page must
never kill the job — every parser failure becomes an error-channel
DocResult, never an exception. These properties drive arbitrary hostile
input through the full detection+parse dispatch and the HTML scanner;
any uncaught exception or pathological slowdown (hypothesis deadline)
fails the build."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from parser_rdf_spark import htmldata
from parser_rdf_spark.formats import DocResult, can_parse, parse_rdf_document

# adversarial alphabet: syntax characters from every grammar the engine
# dispatches to, plus unicode filler
_SYNTAX = '<>"\'\\{}[]()@#.;,:^_|`!$%&*+-=/? \t\n\r'
_CHARS = st.one_of(
    st.sampled_from(list(_SYNTAX)),
    st.characters(blacklist_categories=("Cs",)),
)
_HOSTILE = st.text(alphabet=_CHARS, max_size=300)

_SEEDS = st.sampled_from(
    [
        "",
        "<http://a> <http://b> ",
        '{"@context": {',
        "@prefix ex: <http://e/",
        "<?xml version=",
        "<!DOCTYPE html><html><body itemscope itemprop=",
        '<script type="application/ld+json">{"@id": ',
        "_:b0 <http://p> \"unterminated",
        "( ( ( [ [ [",
        '"""',
    ]
)


@settings(max_examples=400, deadline=1000)
@given(_SEEDS, _HOSTILE)
def test_parse_dispatch_never_raises(seed, tail):
    res = parse_rdf_document(seed + tail)
    assert isinstance(res, DocResult)
    # error channel XOR success — never both, never neither
    assert (res.error_stage is None) == (res.format is not None and res.error_message is None)


@settings(max_examples=400, deadline=1000)
@given(_SEEDS, _HOSTILE)
def test_can_parse_never_raises(seed, tail):
    assert can_parse(seed + tail) in (True, False)


@settings(max_examples=400, deadline=1000)
@given(_HOSTILE)
def test_html_scanner_never_raises(text):
    doc = f"<html><body>{text}</body></html>"
    triples, prefixes = htmldata.parse_document(doc)
    assert isinstance(triples, list) and isinstance(prefixes, dict)


@settings(max_examples=200, deadline=1000)
@given(_HOSTILE, _HOSTILE)
def test_html_attrs_fuzz_never_raises(a, b):
    # hostile attribute soup on marker-bearing tags (forces attr parsing)
    doc = f'<html><div itemscope itemprop="{a}" about=\'{b}\' property={a}>x</div></html>'
    triples, _ = htmldata.parse_document(doc)
    assert isinstance(triples, list)
