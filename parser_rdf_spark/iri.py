"""RFC 3986 relative-IRI resolution (strict algorithm, §5.2).

The reference parser deliberately scopes out relative-IRI resolution
(``/root/reference/docs/spec-completeness.md:147`` — no ``@base``; its
N-Triples handler *bans* relative IRIs outright, a rule this engine
mirrors at ``ntriples.py`` V7).  The SPARQL front-end is an engine
extension beyond the reference, and SPARQL 1.1 queries legitimately
carry a ``BASE`` prologue — so the front-end needs a deterministic,
driver-side resolver.  This is the strict RFC 3986 §5.2 algorithm
(parse → merge → remove_dot_segments → recompose), not
``urllib.parse.urljoin``: ``urljoin`` special-cases a scheme whitelist
(``uses_relative``) and mis-handles non-listed schemes such as ``urn:``
— a KG engine cannot depend on that list.

Everything here is pure driver-side string work on query *text*; no
DataFrame rows flow through it, so there is no scale dimension.
"""
from __future__ import annotations

import re

__all__ = ["split_iri", "remove_dot_segments", "resolve_iri", "is_absolute_iri"]

# RFC 3986 appendix B regex, anchored.  Groups: scheme, authority
# (None when no '//'), path (always a string, possibly ''), query,
# fragment (None when the delimiter is absent).
_RFC3986 = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?"   # scheme:
    r"(?://([^/?#]*))?"                      # //authority
    r"([^?#]*)"                              # path
    r"(?:\?([^#]*))?"                        # ?query
    r"(?:#(.*))?$",                          # #fragment
    re.S,
)


def split_iri(iri: str) -> tuple[str | None, str | None, str, str | None, str | None]:
    """Split into (scheme, authority, path, query, fragment); absent
    components are ``None`` (path is always a string, possibly '')."""
    m = _RFC3986.match(iri)
    if m is None:  # pragma: no cover — the regex matches any string
        return None, None, iri, None, None
    return m.group(1), m.group(2), m.group(3) or "", m.group(4), m.group(5)


def is_absolute_iri(iri: str) -> bool:
    """True when the reference carries its own scheme (RFC 3986 §4.3;
    fragments permitted, as SPARQL IRIREFs may carry them)."""
    return split_iri(iri)[0] is not None


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — interpret and remove '.' / '..' segments."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)  # first segment incl. any leading '/'
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _merge(base_authority: str | None, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.3 merge of a relative-path reference with the base."""
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    if i == -1:
        return ref_path
    return base_path[: i + 1] + ref_path


def _recompose(scheme: str | None, authority: str | None, path: str,
               query: str | None, fragment: str | None) -> str:
    parts: list[str] = []
    if scheme is not None:
        parts.append(scheme + ":")
    if authority is not None:
        parts.append("//" + authority)
    parts.append(path)
    if query is not None:
        parts.append("?" + query)
    if fragment is not None:
        parts.append("#" + fragment)
    return "".join(parts)


def resolve_iri(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` — RFC 3986 §5.2.2, strict mode
    (a same-scheme relative reference is NOT re-interpreted)."""
    s, a, p, q, f = split_iri(ref)
    if s is not None:
        return _recompose(s, a, remove_dot_segments(p), q, f)
    bs, ba, bp, bq, _bf = split_iri(base)
    if a is not None:
        return _recompose(bs, a, remove_dot_segments(p), q, f)
    if p == "":
        return _recompose(bs, ba, bp, q if q is not None else bq, f)
    if p.startswith("/"):
        return _recompose(bs, ba, remove_dot_segments(p), q, f)
    return _recompose(bs, ba, remove_dot_segments(_merge(ba, bp, p)), q, f)
