"""Pure-Python N-Triples core: the W3C suite is the P/R oracle.

Mirrors the reference's conformance suite
(tests/Conformance/W3cNTriplesConformanceTest.php:59-173): 41 positive /
29 negative. The reference skips ``minimal_whitespace`` (EasyRdf
limitation); our tokenizer parses it, which is spec-correct.
"""

import pytest

from parser_rdf_spark import w3c_fixtures as w3c
from parser_rdf_spark.ntriples import (
    NTriplesError,
    can_handle,
    parse_document,
    resource_count,
    strip_trailing_comment,
    tokenize_line,
    unescape,
)


@pytest.mark.parametrize("name", w3c.POSITIVE)
def test_positive_syntax(name):
    triples = parse_document(w3c.FIXTURES[name])
    assert isinstance(triples, list)


@pytest.mark.parametrize("name", w3c.NEGATIVE)
def test_negative_syntax(name):
    with pytest.raises(NTriplesError):
        parse_document(w3c.FIXTURES[name])


def test_negative_error_carries_line_number():
    # reference: tests/Unit/NTriplesStrictValidationTest.php:114-125
    doc = '<http://example/s> <http://example/p> <http://example/o> .\n<http://example/s> <http://example/p> """bad""" .'
    with pytest.raises(NTriplesError) as e:
        parse_document(doc)
    assert e.value.line_num == 2
    assert "line 2" in str(e.value)


@pytest.mark.parametrize("ws", ["\u2028", "\u2029", "\u00a0", "\u2003", "\u200a"])
def test_unicode_whitespace_in_iri_is_accepted(ws):
    """V5 parity pin (Hypothesis-found counterexample, round 1).

    The reference's preg_match('/\\s/', $iri) runs WITHOUT the /u flag
    (reference src/Handlers/NTriplesHandler.php:202), so only ASCII
    whitespace bytes reject an IRI: U+2028/U+2029/U+00A0/U+2000-200A are
    accepted by the reference and must be accepted here (re.ASCII).
    """
    doc = f'<a:b{ws}c> <http://example/p> "x" .'
    triples = parse_document(doc)
    assert len(triples) == 1
    assert triples[0].subj == f"a:b{ws}c"
    assert can_handle(doc)


@pytest.mark.parametrize("ws", [" ", "\t", "\x0b", "\x0c"])
def test_ascii_whitespace_in_iri_still_rejected(ws):
    # escape-free whitespace inside <...> stays a validation error (V5)
    with pytest.raises(NTriplesError):
        parse_document(f'<a:b{ws}c> <http://example/p> "x" .')


def test_minimal_whitespace_parses_fully():
    triples = parse_document(w3c.FIXTURES["minimal_whitespace"])
    assert len(triples) == 6
    assert triples[0].subj == "http://example/s"
    assert triples[5].obj_value == "_:bnode1"


def test_literal_escapes_decoded():
    ts = parse_document(w3c.FIXTURES["literal_with_numeric_escape4"])
    assert ts[0].obj_value == "o"  # o
    ts = parse_document(w3c.FIXTURES["nt-syntax-str-esc-01"])
    assert ts[0].obj_value == "a\n"


def test_langtag_and_datatype():
    ts = parse_document(w3c.FIXTURES["langtagged_string"])
    assert ts[0].obj_lang == "en"
    ts = parse_document(w3c.FIXTURES["nt-syntax-datatypes-01"])
    assert ts[0].obj_datatype == "http://www.w3.org/2001/XMLSchema#byte"


def test_comment_following_triple():
    ts = parse_document(w3c.FIXTURES["comment_following_triple"])
    assert len(ts) == 5


def test_detection_caps_at_ten_lines():
    # reference: tests/Unit/Handlers/NTriplesHandlerTest.php:80-93 — a
    # triple on line 11 is never checked
    doc = "\n".join(["# filler"] * 10 + ['<http://e/s> <http://e/p> <http://e/o> .'])
    assert can_handle(doc) is False
    doc10 = "\n".join(["# filler"] * 9 + ['<http://e/s> <http://e/p> <http://e/o> .'])
    assert can_handle(doc10) is True


def test_line_length_guard():
    big = '<http://e/s> <http://e/p> "' + "x" * 1_100_000 + '" .'
    with pytest.raises(NTriplesError) as e:
        parse_document(big)
    assert "maximum length" in str(e.value)


def test_strip_trailing_comment_dot_inside_literal():
    line = '<http://e/s> <http://e/p> "v1.5" . # note'
    assert strip_trailing_comment(line) == '<http://e/s> <http://e/p> "v1.5" .'


def test_trailing_comment_with_dot_is_not_stripped():
    # dot inside the comment after the terminal dot ⇒ line unchanged ⇒
    # the tokenizer rejects trailing garbage (reference decision parity)
    line = '<http://e/s> <http://e/p> <http://e/o> . # foo.bar'
    assert strip_trailing_comment(line) == line
    with pytest.raises(NTriplesError):
        tokenize_line(line, 1)


def test_unescape_u8():
    assert unescape("\\U0001F600") == "\U0001f600"
    assert unescape("a\\\\b") == "a\\b"


def test_resource_count_matches_reference_semantics():
    # distinct subjects ∪ non-literal objects
    ts = parse_document(
        '<http://e/s> <http://e/p> <http://e/o> .\n'
        '<http://e/s> <http://e/p> "literal" .\n'
        '_:b <http://e/p> <http://e/s> .\n'
    )
    assert resource_count(ts) == 3  # s, o, _:b
