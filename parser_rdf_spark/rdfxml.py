"""RDF/XML subset parser (pure Python, per-document, ElementTree-based).

Scope = the subset the reference's external RdfXmlHandler + SimpleXML
fallback is documented+tested to support (reference:
docs/spec-completeness.md:155-166 and src/Extractors/ClassExtractor.php:
131-165): an ``rdf:RDF`` root, typed node elements (``<rdfs:Class
rdf:about=…>``), ``rdf:Description`` nodes with ``rdf:type`` children,
property elements carrying text content (+ optional ``xml:lang``) or
``rdf:resource`` references, and nested typed nodes. ``rdf:ID``,
``rdf:nodeID`` and ``rdf:parseType`` are NOT implemented (the reference
doesn't implement them either, spec-completeness:162-166).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Optional

from .ntriples import Triple
from .turtle import RDF_TYPE

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

_CLARK_RE = re.compile(r"^\{([^}]*)\}(.*)$")


class RdfXmlError(ValueError):
    pass


def _split_clark(tag: str) -> tuple[str, str]:
    m = _CLARK_RE.match(tag)
    if m:
        return m.group(1), m.group(2)
    return "", tag


def _qname_iri(tag: str) -> str:
    ns, local = _split_clark(tag)
    return ns + local


class _State:
    __slots__ = ("triples", "bnode_seq")

    def __init__(self) -> None:
        self.triples: list[Triple] = []
        self.bnode_seq = 0

    def fresh_bnode(self) -> str:
        self.bnode_seq += 1
        return f"_:xb{self.bnode_seq}"


def _emit(st: _State, subj: str, pred: str, kind: str, value: str,
          lang: Optional[str] = None, dt: Optional[str] = None) -> None:
    # line_no = emission sequence (document order) so downstream
    # 'first value' semantics (E5/E16 sort on line_no) stay deterministic
    st.triples.append(Triple(subj, pred, kind, value, lang, dt, len(st.triples)))


def _node_subject(el: ET.Element, st: _State) -> str:
    about = el.get(f"{{{RDF_NS}}}about")
    if about is not None:
        return about
    return st.fresh_bnode()


def _process_node(st: _State, el: ET.Element, inherited_lang: Optional[str]) -> str:
    """Process a node element; returns its subject term."""
    subj = _node_subject(el, st)
    lang = el.get(f"{{{XML_NS}}}lang", inherited_lang)

    # typed node element: the element QName is an rdf:type (unless rdf:Description)
    type_iri = _qname_iri(el.tag)
    if type_iri != RDF_NS + "Description":
        _emit(st, subj, RDF_TYPE, "iri", type_iri)

    for prop in el:
        pred = _qname_iri(prop.tag)
        prop_lang = prop.get(f"{{{XML_NS}}}lang", lang)
        resource = prop.get(f"{{{RDF_NS}}}resource")
        children = list(prop)
        if resource is not None:
            _emit(st, subj, pred, "iri", resource)
        elif children:
            # nested node element(s)
            for child in children:
                child_subj = _process_node(st, child, prop_lang)
                kind = "bnode" if child_subj.startswith("_:") else "iri"
                _emit(st, subj, pred, kind, child_subj)
        else:
            text = prop.text if prop.text is not None else ""
            dt = prop.get(f"{{{RDF_NS}}}datatype")
            _emit(st, subj, pred, "literal", text,
                  prop_lang if dt is None else None, dt)
    return subj


def parse_document(content: str) -> tuple[list[Triple], dict[str, str]]:
    """Parse an RDF/XML document; returns (triples, xmlns prefix map)."""
    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:
        raise RdfXmlError(f"RDF/XML parsing failed: {e}") from e

    st = _State()
    root_ns, root_local = _split_clark(root.tag)
    if root_ns == RDF_NS and root_local == "RDF":
        lang = root.get(f"{{{XML_NS}}}lang")
        for child in root:
            _process_node(st, child, lang)
    else:
        # single top-level typed node without rdf:RDF wrapper
        _process_node(st, root, None)

    prefixes = extract_xmlns_prefixes(content)
    return st.triples, prefixes


def extract_xmlns_prefixes(content: str) -> dict[str, str]:
    """E14 layer for rdf/xml: ``xmlns:p="uri"`` regex over the raw text
    (reference: src/Extractors/PrefixExtractor.php:121-136)."""
    prefixes: dict[str, str] = {}
    for m in re.finditer(r'xmlns:([^=]+)="([^"]+)"', content, re.IGNORECASE):
        prefix, ns = m.group(1).strip(), m.group(2).strip()
        if prefix and ns:
            prefixes[prefix] = ns
    return prefixes


def can_handle(content: str) -> bool:
    """D8: ``<?xml`` or ``<rdf:RDF`` lead."""
    stripped = content.lstrip()
    return stripped.startswith("<?xml") or stripped.startswith("<rdf:RDF")
