"""JSON-LD subset parser (pure Python, per-document).

Scope = the subset the reference's external JsonLdHandler is documented+
tested to support (reference: docs/spec-completeness.md:175-179 and
tests/Fixtures/Integration/sample.jsonld): an inline top-level ``@context``
of prefix/term → IRI mappings, a ``@graph`` array of node objects (or a
single top-level node object), ``@id``, ``@type`` (string or list),
``prefix:term`` / absolute-IRI / context-term keys, literal values (plain
string, ``{"@value": …, "@language": …}``, ``{"@value": …, "@type": …}``),
``{"@id": …}`` object references, arrays of any of those, and nested node
objects. Remote context resolution and framing are NOT implemented (the
reference doesn't implement them either, spec-completeness:178-179).
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from .ntriples import Triple
from .turtle import RDF_TYPE

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class JsonLdError(ValueError):
    pass


class _State:
    __slots__ = ("context", "triples", "bnode_seq")

    def __init__(self) -> None:
        self.context: dict[str, str] = {}
        self.triples: list[Triple] = []
        self.bnode_seq = 0


def _fresh_bnode(st: _State) -> str:
    st.bnode_seq += 1
    return f"_:jb{st.bnode_seq}"


def _expand(term: str, st: _State, vocab: bool = False) -> Optional[str]:
    """Expand a term/CURIE/IRI against the context. None ⇒ unmappable."""
    if term.startswith("_:"):
        return term
    if ":" in term:
        prefix, _, local = term.partition(":")
        if prefix in st.context:
            return st.context[prefix] + local
        if _ABS_IRI_RE.match(term):
            return term
        return None
    if term in st.context:
        return st.context[term]
    if vocab and "@vocab" in st.context:
        return st.context["@vocab"] + term
    return None


def _emit(st: _State, subj: str, pred: str, obj_kind: str, obj_value: str,
          lang: Optional[str] = None, dt: Optional[str] = None) -> None:
    # line_no = emission sequence: JSON has no lines, but downstream
    # 'first value in document order' semantics (E5/E16) sort on line_no
    st.triples.append(Triple(subj, pred, obj_kind, obj_value, lang, dt, len(st.triples)))


def _node_subject(node: dict[str, Any], st: _State) -> str:
    nid = node.get("@id")
    if isinstance(nid, str):
        if nid.startswith("_:"):
            return nid
        expanded = _expand(nid, st)
        return expanded if expanded else nid
    return _fresh_bnode(st)


def _process_value(st: _State, subj: str, pred: str, value: Any) -> None:
    if value is None:
        return  # JSON-LD expansion drops null values (ubiquitous on the web)
    if isinstance(value, list):
        for v in value:
            _process_value(st, subj, pred, v)
        return
    if isinstance(value, dict):
        if "@value" in value:
            val = value["@value"]
            if val is None:
                return
            lang = value.get("@language")
            dt = value.get("@type")
            dt_iri = _expand(dt, st) if isinstance(dt, str) else None
            if isinstance(val, bool):
                lex = "true" if val else "false"
                dt_iri = dt_iri or "http://www.w3.org/2001/XMLSchema#boolean"
            elif isinstance(val, int):
                lex = str(val)
                dt_iri = dt_iri or "http://www.w3.org/2001/XMLSchema#integer"
            elif isinstance(val, float):
                lex = repr(val)
                dt_iri = dt_iri or "http://www.w3.org/2001/XMLSchema#double"
            else:
                lex = str(val)
            _emit(st, subj, pred, "literal", lex,
                  lang if isinstance(lang, str) else None, dt_iri)
            return
        if set(value.keys()) == {"@id"} and isinstance(value["@id"], str):
            ref = value["@id"]
            if ref.startswith("_:"):
                _emit(st, subj, pred, "bnode", ref)
            else:
                expanded = _expand(ref, st) or ref
                _emit(st, subj, pred, "iri", expanded)
            return
        # nested node object: link then recurse
        child = _node_subject(value, st)
        kind = "bnode" if child.startswith("_:") else "iri"
        _emit(st, subj, pred, kind, child)
        _process_node(st, value, presubj=child)
        return
    if isinstance(value, bool):
        _emit(st, subj, pred, "literal", "true" if value else "false",
              None, "http://www.w3.org/2001/XMLSchema#boolean")
        return
    if isinstance(value, int):
        _emit(st, subj, pred, "literal", str(value),
              None, "http://www.w3.org/2001/XMLSchema#integer")
        return
    if isinstance(value, float):
        _emit(st, subj, pred, "literal", repr(value),
              None, "http://www.w3.org/2001/XMLSchema#double")
        return
    _emit(st, subj, pred, "literal", str(value))


def _process_node(st: _State, node: dict[str, Any], presubj: Optional[str] = None) -> None:
    subj = presubj if presubj is not None else _node_subject(node, st)
    for key, value in node.items():
        if key == "@id" or key == "@context":
            continue
        if key == "@type":
            types = value if isinstance(value, list) else [value]
            for t in types:
                if isinstance(t, str):
                    expanded = _expand(t, st, vocab=True)
                    if expanded:
                        _emit(st, subj, RDF_TYPE, "iri", expanded)
            continue
        if key == "@graph":
            if isinstance(value, list):
                for child in value:
                    if isinstance(child, dict):
                        _process_node(st, child)
            continue
        if key.startswith("@"):
            continue
        pred = _expand(key, st, vocab=True)
        if pred is None:
            continue  # unmappable keys are dropped (JSON-LD expansion rule)
        _process_value(st, subj, pred, value)


def parse_document(content: str) -> tuple[list[Triple], dict[str, str]]:
    """Parse a JSON-LD document; returns (triples, context prefix map)."""
    try:
        doc = json.loads(content)
    except json.JSONDecodeError as e:
        raise JsonLdError(f"JSON-LD parsing failed: {e}") from e
    if not isinstance(doc, (dict, list)):
        raise JsonLdError("JSON-LD parsing failed: top level must be an object or array")

    st = _State()
    nodes = doc if isinstance(doc, list) else [doc]
    for node in nodes:
        if not isinstance(node, dict):
            continue
        ctx = node.get("@context")
        if isinstance(ctx, dict):
            for k, v in ctx.items():
                if isinstance(k, str) and isinstance(v, str):
                    st.context[k] = v
        elif isinstance(ctx, str) and _ABS_IRI_RE.match(ctx):
            # remote-context URL (e.g. "https://schema.org"): resolution is
            # out of scope (spec-completeness:178), but web JSON-LD leans on
            # it everywhere — treat it as an @vocab base so bare terms
            # expand to <base>/term instead of being dropped
            st.context["@vocab"] = ctx if ctx.endswith(("/", "#")) else ctx + "/"
        _process_node(st, node)
    prefixes = {
        k: v for k, v in st.context.items()
        if not k.startswith("@") and _ABS_IRI_RE.match(v)
    }
    return st.triples, prefixes


def can_handle(content: str) -> bool:
    """D7: JSON object containing ``@context`` (cheap head check, then a
    real ``json.loads`` confirm — ``canHandle`` must never throw)."""
    stripped = content.lstrip()
    if not stripped.startswith("{") and not stripped.startswith("["):
        return False
    if '"@context"' not in content and '"@graph"' not in content and '"@id"' not in content:
        return False
    try:
        doc = json.loads(content)
    except (json.JSONDecodeError, RecursionError):
        return False
    if isinstance(doc, dict):
        return "@context" in doc or "@graph" in doc or "@id" in doc
    if isinstance(doc, list):
        return any(isinstance(n, dict) and ("@context" in n or "@id" in n) for n in doc)
    return False
