"""HTML structured-data extraction: embedded JSON-LD, microdata, RDFa Lite.

The north star (BASELINE.json:6) targets "RDF/RDFa/microdata/JSON-LD
extraction" over Common-Crawl-style pages — real web pages carry their
triples inside HTML, not as standalone RDF documents. The reference
library has no HTML path at all (it parses RDF serializations only,
reference README.md:6); this module is new engine surface, registered as
the LOWEST-priority format handler so every RDF serialization still wins
detection (reference priority chain semantics preserved).

One streaming ``html.parser.HTMLParser`` pass per document extracts all
three carriers simultaneously:

1. **Embedded JSON-LD** — ``<script type="application/ld+json">`` blocks,
   delegated to :mod:`parser_rdf_spark.jsonld` (which maps a remote
   context URL like ``https://schema.org`` to an ``@vocab`` base).
2. **Microdata** — ``itemscope``/``itemtype``/``itemid``/``itemprop``;
   property IRIs resolve against the item's first ``itemtype`` vocabulary
   (text up to the last ``/`` or ``#``); values follow the HTML microdata
   value rules (``content`` on meta, ``href`` on a/area/link, ``src`` on
   media tags, ``datetime`` on time, text content otherwise); nested
   ``itemscope`` items become object-valued triples.
3. **RDFa Lite** — ``vocab``/``prefix``/``typeof``/``property``/
   ``about``/``resource`` (+ ``content``/``href``/``src`` values), with
   CURIE expansion against declared prefixes, the 11 common prefixes, and
   the in-scope ``vocab``. Property+typeof chaining: an element carrying
   both links the parent subject to a fresh blank node typed by typeof.

All bnode labels are document-scoped sequences (``_:md{n}``/``_:rdfa{n}``
/ JSON-LD's ``_:jb{n}``), later rewritten to ``_:d{doc_hash}-…`` by the
shared :func:`parser_rdf_spark.formats.scope_bnodes` pass, so the global
triples table never collides across pages.

Malformed HTML never raises: the stdlib tokenizer is forgiving, void
elements are depth-neutral, and unclosed capture frames simply flush at
end-of-document.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional

from .ntriples import Triple

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_HREF_TAGS = frozenset(("a", "area", "link"))
_SRC_TAGS = frozenset(("img", "audio", "video", "iframe", "embed", "source", "track"))


def _vocab_base(type_iri: str) -> str:
    """Microdata property vocabulary: the type IRI up to and including the
    last '/' or '#' (https://schema.org/Person → https://schema.org/)."""
    for sep in ("#", "/"):
        idx = type_iri.rfind(sep)
        if idx != -1:
            return type_iri[: idx + 1]
    return type_iri


class _Item:
    __slots__ = ("subject", "kind", "vocab", "depth")

    def __init__(self, subject: str, kind: str, vocab: Optional[str], depth: int):
        self.subject = subject
        self.kind = kind
        self.vocab = vocab
        self.depth = depth


class _Capture:
    """An open element whose text content will become a literal value."""

    __slots__ = ("subject", "pred", "depth", "buf")

    def __init__(self, subject: str, pred: str, depth: int):
        self.subject = subject
        self.pred = pred
        self.depth = depth
        self.buf: list[str] = []


class _RdfaCtx:
    __slots__ = ("subject", "vocab", "depth")

    def __init__(self, subject: Optional[str], vocab: Optional[str], depth: int):
        self.subject = subject
        self.vocab = vocab
        self.depth = depth


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.triples: list[Triple] = []
        self.prefixes: dict[str, str] = {}
        self.jsonld_blocks: list[str] = []
        self._in_ldjson = False
        self._ld_buf: list[str] = []
        self._depth = 0
        self._md_stack: list[_Item] = []
        self._md_seq = 0
        self._captures: list[_Capture] = []
        self._rdfa_stack: list[_RdfaCtx] = [_RdfaCtx(None, None, -1)]
        self._rdfa_seq = 0
        self._line = 0

    # -- shared helpers -----------------------------------------------------

    def _emit(self, subj: str, pred: str, kind: str, value: str,
              lang: Optional[str] = None, dt: Optional[str] = None) -> None:
        self.triples.append(Triple(subj, pred, kind, value, lang, dt, len(self.triples)))

    def _expand_curie(self, term: str, vocab: Optional[str]) -> Optional[str]:
        from .formats import COMMON_PREFIXES

        if not term:
            return None
        if term.startswith("_:"):
            return term
        if ":" in term:
            prefix, _, local = term.partition(":")
            ns = self.prefixes.get(prefix) or COMMON_PREFIXES.get(prefix)
            if ns and not term.startswith(("http:", "https:", "urn:")):
                return ns + local
            if _ABS_IRI_RE.match(term):
                return term
            return None
        if vocab:
            return vocab + term
        return None

    # -- tag events ---------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        is_void = tag in _VOID_TAGS
        depth = self._depth
        if not is_void:
            self._depth += 1

        if tag == "script":
            if (a.get("type") or "").strip().lower() == "application/ld+json":
                self._in_ldjson = True
                self._ld_buf = []
            return

        self._microdata_start(tag, a, depth, is_void)
        self._rdfa_start(tag, a, depth, is_void)

    def handle_endtag(self, tag: str) -> None:
        if tag == "script":
            if self._in_ldjson:
                self.jsonld_blocks.append("".join(self._ld_buf))
                self._in_ldjson = False
            return
        if tag in _VOID_TAGS:
            return
        self._depth = max(0, self._depth - 1)
        d = self._depth
        while self._captures and self._captures[-1].depth >= d:
            cap = self._captures.pop()
            self._emit(cap.subject, cap.pred, "literal", "".join(cap.buf).strip())
        while len(self._md_stack) > 0 and self._md_stack[-1].depth >= d:
            self._md_stack.pop()
        while len(self._rdfa_stack) > 1 and self._rdfa_stack[-1].depth >= d:
            self._rdfa_stack.pop()

    def handle_data(self, data: str) -> None:
        if self._in_ldjson:
            self._ld_buf.append(data)
            return
        for cap in self._captures:
            cap.buf.append(data)

    def close(self) -> None:  # flush unclosed captures (malformed HTML)
        super().close()
        while self._captures:
            cap = self._captures.pop()
            self._emit(cap.subject, cap.pred, "literal", "".join(cap.buf).strip())

    # -- microdata ----------------------------------------------------------

    def _microdata_start(self, tag: str, a: dict, depth: int, is_void: bool) -> None:
        has_scope = "itemscope" in a
        item: Optional[_Item] = None
        if has_scope:
            itemid = (a.get("itemid") or "").strip()
            if itemid and _ABS_IRI_RE.match(itemid):
                subject, kind = itemid, "iri"
            else:
                self._md_seq += 1
                subject, kind = f"_:md{self._md_seq}", "bnode"
            types = (a.get("itemtype") or "").split()
            vocab = _vocab_base(types[0]) if types else None
            item = _Item(subject, kind, vocab, depth)
            for t in types:
                if _ABS_IRI_RE.match(t):
                    self._emit(subject, RDF_TYPE, "iri", t)

        props = (a.get("itemprop") or "").split()
        if props and self._md_stack:
            parent = self._md_stack[-1]
            for p in props:
                pred = p if _ABS_IRI_RE.match(p) else (
                    (parent.vocab or "") + p if parent.vocab else p
                )
                if has_scope and item is not None:
                    self._emit(parent.subject, pred, item.kind, item.subject)
                else:
                    value, kind = self._md_value(tag, a)
                    if value is not None:
                        self._emit(parent.subject, pred, kind, value)
                    elif not is_void:
                        self._captures.append(_Capture(parent.subject, pred, depth))

        if item is not None:
            self._md_stack.append(item)

    @staticmethod
    def _md_value(tag: str, a: dict):
        if tag == "meta":
            return a.get("content", ""), "literal"
        if tag in _HREF_TAGS:
            href = a.get("href")
            return (href, "iri") if href else (None, None)
        if tag in _SRC_TAGS:
            src = a.get("src")
            return (src, "iri") if src else (None, None)
        if tag == "time" and a.get("datetime"):
            return a["datetime"], "literal"
        if tag in ("data", "meter") and a.get("value") is not None:
            return a["value"], "literal"
        return None, None

    # -- RDFa Lite ----------------------------------------------------------

    def _rdfa_start(self, tag: str, a: dict, depth: int, is_void: bool) -> None:
        if "prefix" in a:
            decls = (a.get("prefix") or "").split()
            for p_decl, ns in zip(decls[0::2], decls[1::2]):
                if p_decl.endswith(":") and _ABS_IRI_RE.match(ns):
                    self.prefixes[p_decl[:-1]] = ns
        ctx = self._rdfa_stack[-1]
        vocab = (a.get("vocab") or "").strip() or ctx.vocab

        about = (a.get("about") or a.get("resource") or "").strip()
        subject = self._expand_curie(about, None) if about else None

        typeof = (a.get("typeof") or "").split()
        props = (a.get("property") or "").split()

        if typeof and subject is None:
            self._rdfa_seq += 1
            subject = f"_:rdfa{self._rdfa_seq}"

        new_subject = subject
        if props and ctx.subject is not None:
            # property on this element: object is (in order) the new
            # typeof/about subject (chaining), content attr, href/src IRI,
            # else captured text content
            for p in props:
                pred = self._expand_curie(p, vocab)
                if pred is None:
                    continue
                if subject is not None:
                    kind = "bnode" if subject.startswith("_:") else "iri"
                    self._emit(ctx.subject, pred, kind, subject)
                elif "content" in a:
                    self._emit(ctx.subject, pred, "literal", a.get("content") or "")
                elif tag in _HREF_TAGS and a.get("href"):
                    self._emit(ctx.subject, pred, "iri", a["href"])
                elif tag in _SRC_TAGS and a.get("src"):
                    self._emit(ctx.subject, pred, "iri", a["src"])
                elif not is_void:
                    self._captures.append(_Capture(ctx.subject, pred, depth))
        elif props and ctx.subject is None and subject is None and vocab:
            # property with no subject context: hang off a document node
            self._rdfa_seq += 1
            doc_subj = f"_:rdfa{self._rdfa_seq}"
            self._rdfa_stack[0].subject = doc_subj
            ctx = self._rdfa_stack[0]
            for p in props:
                pred = self._expand_curie(p, vocab)
                if pred is None:
                    continue
                if "content" in a:
                    self._emit(ctx.subject, pred, "literal", a.get("content") or "")
                elif not is_void:
                    self._captures.append(_Capture(ctx.subject, pred, depth))

        if new_subject is not None:
            for t in typeof:
                t_iri = self._expand_curie(t, vocab)
                if t_iri:
                    self._emit(new_subject, RDF_TYPE, "iri", t_iri)

        if (new_subject is not None or vocab != ctx.vocab) and not is_void:
            self._rdfa_stack.append(
                _RdfaCtx(new_subject if new_subject is not None else ctx.subject, vocab, depth)
            )


_HTML_HEAD_RE = re.compile(r"^\s*(<!doctype\s+html|<html[\s>])", re.IGNORECASE)


def can_handle(content: str) -> bool:
    """HTML sniff: doctype/root-tag lead, or an html/head/body tag within
    the first 2048 chars (fragments). Never throws."""
    if not content:
        return False
    if _HTML_HEAD_RE.match(content):
        return True
    head = content[:2048].lower()
    return "<html" in head or ("<body" in head and "</" in content)


def parse_document(content: str) -> tuple[list[Triple], dict[str, str]]:
    """Extract all structured data from one HTML document.

    Returns (triples, prefixes). JSON-LD block failures are isolated (a
    broken script block never discards the microdata/RDFa triples).
    """
    from . import jsonld

    ex = _Extractor()
    try:
        ex.feed(content)
        ex.close()
    except Exception:  # noqa: BLE001 — salvage whatever was emitted
        pass

    triples = list(ex.triples)
    prefixes = dict(ex.prefixes)
    bnode_offset = 0
    for block in ex.jsonld_blocks:
        try:
            block_triples, block_prefixes = jsonld.parse_document(block)
        except Exception:  # noqa: BLE001 — bad block, keep the rest
            continue
        remapped = []
        max_jb = 0
        for t in block_triples:
            # JSON-LD bnode labels restart per block (_:jb1…); offset them
            # so two blocks on one page never collide
            subj = _offset_bnode(t.subj, bnode_offset)
            obj = _offset_bnode(t.obj_value, bnode_offset) if t.obj_kind == "bnode" else t.obj_value
            for term in (t.subj, t.obj_value if t.obj_kind == "bnode" else ""):
                m = _JB_RE.match(term)
                if m:
                    max_jb = max(max_jb, int(m.group(1)))
            remapped.append(Triple(subj, t.pred, t.obj_kind, obj, t.obj_lang, t.obj_datatype, t.line_no))
        bnode_offset += max_jb
        triples.extend(remapped)
        prefixes.update(block_prefixes)
    return triples, prefixes


_JB_RE = re.compile(r"^_:jb(\d+)$")


def _offset_bnode(term: str, offset: int) -> str:
    m = _JB_RE.match(term)
    if m:
        return f"_:jb{int(m.group(1)) + offset}"
    return term
