"""Property-based round-trip tests (hypothesis): serialize random triples
to N-Triples, parse with the strict pipeline, require exact recovery.

This probes the escape/unescape and tokenizer fidelity surface far beyond
the 70 W3C fixtures — quoting, backslash runs, unicode planes, langtags,
datatypes, and whitespace placement are all adversarially sampled."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from parser_rdf_spark.ntriples import Triple, parse_document

_SCHEME = st.from_regex(r"[a-z][a-z0-9+.\-]{0,8}", fullmatch=True)
# IRI chars: printable, no space/angle-brackets/quote/backslash/control
_IRI_BODY = st.text(
    alphabet=st.characters(
        min_codepoint=0x21,
        max_codepoint=0x2FFF,
        blacklist_characters='<>"\\{}|^`',
        blacklist_categories=("Cs", "Cc", "Zs"),
    ),
    max_size=24,
)
_IRIS = st.builds(lambda s, b: f"{s}:{b}", _SCHEME, _IRI_BODY)
_BNODES = st.from_regex(r"_:[A-Za-z0-9][A-Za-z0-9_]{0,12}", fullmatch=True)
# literal text: any unicode except lone surrogates (excluded by default)
_LIT = st.text(max_size=40)
_LANG = st.from_regex(r"[a-zA-Z]{1,4}(-[a-zA-Z0-9]{1,4}){0,2}", fullmatch=True)


def _esc(value: str) -> str:
    out = []
    for ch in value:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    return "".join(out)


def _serialize(t: Triple) -> str:
    s = f"<{t.subj}>" if not t.subj.startswith("_:") else t.subj
    if t.obj_kind == "iri":
        o = f"<{t.obj_value}>"
    elif t.obj_kind == "bnode":
        o = t.obj_value
    else:
        o = f'"{_esc(t.obj_value)}"'
        if t.obj_lang:
            o += f"@{t.obj_lang}"
        elif t.obj_datatype:
            o += f"^^<{t.obj_datatype}>"
    return f"{s} <{t.pred}> {o} ."


_SUBJECTS = st.one_of(_IRIS, _BNODES)
_OBJECTS = st.one_of(
    st.builds(lambda v: ("iri", v, None, None), _IRIS),
    st.builds(lambda v: ("bnode", v, None, None), _BNODES),
    st.builds(lambda v: ("literal", v, None, None), _LIT),
    st.builds(lambda v, lg: ("literal", v, lg, None), _LIT, _LANG),
    st.builds(lambda v, dt: ("literal", v, None, dt), _LIT, _IRIS),
)
_TRIPLES = st.builds(
    lambda s, p, o: Triple(s, p, o[0], o[1], o[2], o[3], 0),
    _SUBJECTS, _IRIS, _OBJECTS,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TRIPLES, min_size=1, max_size=8))
def test_ntriples_roundtrip(triples):
    doc = "\n".join(_serialize(t) for t in triples)
    parsed = parse_document(doc)
    got = [(t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype) for t in parsed]
    want = [(t.subj, t.pred, t.obj_kind, t.obj_value, t.obj_lang, t.obj_datatype) for t in triples]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(_TRIPLES, min_size=1, max_size=5))
def test_parse_is_deterministic_and_line_numbered(triples):
    doc = "\n".join(_serialize(t) for t in triples)
    a, b = parse_document(doc), parse_document(doc)
    assert [t.line_no for t in a] == list(range(1, len(triples) + 1))
    assert a == b


@settings(max_examples=150, deadline=None)
@given(_LIT, st.sampled_from(["ascii", "mixed"]))
def test_comments_and_blank_lines_are_transparent(text, _mode):
    t = Triple("http://e/s", "http://e/p", "literal", text, None, None, 0)
    doc = f"# leading comment\n\n{_serialize(t)}\n   \n# trailing comment\n"
    parsed = parse_document(doc)
    assert len(parsed) == 1 and parsed[0].obj_value == text
