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

import html as _html_mod
import re
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
    """An open element whose text content will become a literal value.

    ``sink`` is None for normal item properties (flush emits a triple);
    for DETACHED properties inside an ``id``-scoped subtree awaiting an
    ``itemref`` resolution, flush appends (term, 'literal', text) to the
    id's property list instead.
    """

    __slots__ = ("subject", "pred", "depth", "buf", "sink")

    def __init__(self, subject: str, pred: str, depth: int, sink: list | None = None):
        self.subject = subject
        self.pred = pred
        self.depth = depth
        self.sink = sink
        self.buf: list[str] = []


class _RdfaCtx:
    __slots__ = ("subject", "vocab", "depth")

    def __init__(self, subject: Optional[str], vocab: Optional[str], depth: int):
        self.subject = subject
        self.vocab = vocab
        self.depth = depth


# One scan pass: comments / CDATA / decls / PIs / end tags / start tags.
# Everything between matches is character data.
_SCAN_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][-\w.:]*)[^>]*>"
    r"|<([a-zA-Z][-\w.:]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.DOTALL,
)
_ATTR_RE = re.compile(
    # unquoted values run to whitespace/> (HTML5: a '/' inside an unquoted
    # value is part of the value, not a self-closing marker — URLs!)
    r"([a-zA-Z_][-\w.:]*)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+))?"
)
# attribute substrings that make a start tag worth parsing attrs for —
# marker-free tags (the overwhelming majority on real pages) cost only
# the scan regex and a depth increment
_MARKERS = ("item", "property", "typeof", "about", "vocab", "prefix", "resource")
_SCRIPT_CLOSE_RE = re.compile(r"</script", re.IGNORECASE)
_STYLE_CLOSE_RE = re.compile(r"</style", re.IGNORECASE)


def _unescape(v: str) -> str:
    return _html_mod.unescape(v) if "&" in v else v


_COMMON_PREFIXES: dict | None = None  # lazy (circular import with formats)


class _Extractor:
    """Streaming structured-data extractor over a fast regex tag scanner.

    An earlier version subclassed html.parser.HTMLParser; that tokenizer
    costs ~350 µs per 1.3 KB page (allocation-heavy, every attribute of
    every tag parsed). The scanner below parses attributes only for tags
    carrying a structured-data marker substring and slices <script> raw
    content directly, which is ~10× cheaper on marker-sparse real pages —
    the fused parse stage's throughput is the headline benchmark metric.
    """

    def __init__(self) -> None:
        self.triples: list[Triple] = []
        self.prefixes: dict[str, str] = {}
        self.jsonld_blocks: list[str] = []
        self._depth = 0
        self._md_stack: list[_Item] = []
        self._md_seq = 0
        self._captures: list[_Capture] = []
        self._rdfa_stack: list[_RdfaCtx] = [_RdfaCtx(None, None, -1)]
        self._rdfa_seq = 0
        # itemref machinery (only active when the document contains the
        # token at all — set by feed()): id-scoped detached properties
        # and the (item, vocab, ids) resolutions applied at close()
        self._track_ids = False
        self._id_scopes: list[tuple[str, int]] = []
        self._id_props: dict[str, list[tuple[str, str, str]]] = {}
        self._pending_refs: list[tuple[str, Optional[str], list[str]]] = []

    # -- shared helpers -----------------------------------------------------

    def _emit(self, subj: str, pred: str, kind: str, value: str,
              lang: Optional[str] = None, dt: Optional[str] = None) -> None:
        self.triples.append(Triple(subj, pred, kind, value, lang, dt, len(self.triples)))

    def _expand_curie(self, term: str, vocab: Optional[str]) -> Optional[str]:
        global _COMMON_PREFIXES
        if _COMMON_PREFIXES is None:
            from .formats import COMMON_PREFIXES as CP

            _COMMON_PREFIXES = CP
        COMMON_PREFIXES = _COMMON_PREFIXES
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

    # -- scanner ------------------------------------------------------------

    @staticmethod
    def _parse_attrs(attrs_str: str) -> dict:
        a: dict = {}
        for m in _ATTR_RE.finditer(attrs_str):
            name = m.group(1).lower()
            v = m.group(2)
            if v is not None:
                if v and v[0] in "\"'":
                    v = v[1:-1]
                v = _unescape(v)
            a[name] = v
        return a

    def feed(self, content: str) -> None:
        # id-tracking costs attr parses on id-bearing tags, so it is only
        # armed when the document can possibly use it (HTML microdata
        # itemref crawl, WHATWG §5.2.4 step 6) — marker-sparse real pages
        # never pay for it
        if not self._track_ids and "itemref" in content:
            self._track_ids = True
        n = len(content)
        pos = 0
        while pos < n:
            m = _SCAN_RE.search(content, pos)
            if m is None:
                self._data(content[pos:])
                break
            if m.start() > pos:
                self._data(content[pos:m.start()])
            end_tag, start_tag, attrs_str = m.groups()
            pos = m.end()
            if end_tag:
                self._end(end_tag.lower())
            elif start_tag:
                tag = start_tag.lower()
                attrs_str = attrs_str or ""
                if tag in ("script", "style"):
                    # slice raw content straight to the closing tag — the
                    # body is never tokenized. Case-insensitive regex on
                    # the ORIGINAL string: a content.lower() copy can
                    # change length ('İ' → 2 chars) and desync offsets
                    cm = (_SCRIPT_CLOSE_RE if tag == "script" else _STYLE_CLOSE_RE).search(
                        content, pos
                    )
                    close = cm.start() if cm else -1
                    raw = content[pos: close if close != -1 else n]
                    if tag == "script" and "ld+json" in attrs_str.lower():
                        self.jsonld_blocks.append(raw)
                    if close == -1:
                        break
                    gt = content.find(">", close)
                    pos = (gt + 1) if gt != -1 else n
                    continue
                # a trailing '/' is a self-closing marker only as a
                # standalone token — in `vocab=https://schema.org/` it is
                # part of the unquoted attribute value (HTML5 tokenizer)
                s = attrs_str.rstrip()
                self_closing = s.endswith("/") and (
                    len(s) == 1 or s[-2] in " \t\n\r\"'"
                )
                a = (
                    self._parse_attrs(attrs_str)
                    if attrs_str
                    and (
                        any(k in attrs_str for k in _MARKERS)
                        or (self._track_ids and "id" in attrs_str)
                    )
                    else {}
                )
                self._start(tag, a)
                if self_closing and tag not in _VOID_TAGS:
                    self._end(tag)

    def _start(self, tag: str, a: dict) -> None:
        is_void = tag in _VOID_TAGS
        depth = self._depth
        if not is_void:
            self._depth += 1
        if a:
            if self._track_ids and not is_void and a.get("id"):
                # open an id-scope BEFORE property handling: the itemref
                # crawl includes the id element's own itemprop
                self._id_scopes.append((a["id"], depth))
            self._microdata_start(tag, a, depth, is_void)
            self._rdfa_start(tag, a, depth, is_void)

    def _end(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        self._depth = max(0, self._depth - 1)
        d = self._depth
        while self._captures and self._captures[-1].depth >= d:
            self._flush_capture(self._captures.pop())
        while len(self._md_stack) > 0 and self._md_stack[-1].depth >= d:
            self._md_stack.pop()
        while len(self._rdfa_stack) > 1 and self._rdfa_stack[-1].depth >= d:
            self._rdfa_stack.pop()
        while self._id_scopes and self._id_scopes[-1][1] >= d:
            self._id_scopes.pop()

    def _flush_capture(self, cap: _Capture) -> None:
        text = _unescape("".join(cap.buf)).strip()
        if cap.sink is not None:
            cap.sink.append((cap.pred, "literal", text))
        else:
            self._emit(cap.subject, cap.pred, "literal", text)

    def _data(self, data: str) -> None:
        if data:
            for cap in self._captures:
                cap.buf.append(data)

    def close(self) -> None:
        # flush unclosed captures (malformed HTML), then resolve itemref:
        # each referring item claims the detached properties recorded under
        # its referenced ids, resolving SHORT property terms against the
        # item's own vocabulary (WHATWG microdata: the crawl attaches the
        # property to the referring item, so vocab is the item's)
        while self._captures:
            self._flush_capture(self._captures.pop())
        for subject, vocab, ids in self._pending_refs:
            for ref_id in ids:
                for term, kind, value in self._id_props.get(ref_id, ()):
                    pred = term if _ABS_IRI_RE.match(term) else (
                        vocab + term if vocab else term
                    )
                    self._emit(subject, pred, kind, value)

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
            refs = (a.get("itemref") or "").split()
            if refs:
                self._pending_refs.append((subject, vocab, refs))

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

        if props and self._track_ids:
            # record the property under every open id-scope whose crawl
            # reaches this element (the crawl STOPS at itemscope elements:
            # if an item opened inside the id subtree, its descendants
            # belong to it, not to the id), with the RAW term — the
            # referring item's vocab resolves it at close(). A void
            # id-bearing element is its own one-element subtree.
            top_item_depth = self._md_stack[-1].depth if self._md_stack else -1
            sinks = [
                self._id_props.setdefault(sid, [])
                for sid, sdepth in self._id_scopes
                if top_item_depth < sdepth
            ]
            if is_void and a.get("id"):
                sinks.append(self._id_props.setdefault(a["id"], []))
            if sinks:
                for p in props:
                    if has_scope and item is not None:
                        for s in sinks:
                            s.append((p, item.kind, item.subject))
                    else:
                        value, kind = self._md_value(tag, a)
                        if value is not None:
                            for s in sinks:
                                s.append((p, kind, value))
                        elif not is_void:
                            for s in sinks:
                                self._captures.append(_Capture("", p, depth, sink=s))

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

        # RDFa Lite roles: `about` sets the SUBJECT for this element and
        # its descendants; `resource` names the OBJECT of this element's
        # property (and the subject for descendants); bare `typeof` mints
        # a blank node filling whichever of those roles is open
        about_attr = (a.get("about") or "").strip()
        resource_attr = (a.get("resource") or "").strip()
        subject = self._expand_curie(about_attr, None) if about_attr else None
        obj_res = self._expand_curie(resource_attr, None) if resource_attr else None

        typeof = (a.get("typeof") or "").split()
        props = (a.get("property") or "").split()

        if typeof and subject is None and obj_res is None:
            self._rdfa_seq += 1
            bn = f"_:rdfa{self._rdfa_seq}"
            if props and ctx.subject is not None:
                obj_res = bn  # property+typeof chaining: bnode is the object
            else:
                subject = bn

        if props:
            # the triple's subject: this element's `about`, else the
            # inherited context, else a fresh document node
            target = subject if subject is not None else ctx.subject
            if target is None and vocab:
                self._rdfa_seq += 1
                self._rdfa_stack[0].subject = f"_:rdfa{self._rdfa_seq}"
                target = self._rdfa_stack[0].subject
            if target is not None:
                for p in props:
                    pred = self._expand_curie(p, vocab)
                    if pred is None:
                        continue
                    if obj_res is not None:
                        kind = "bnode" if obj_res.startswith("_:") else "iri"
                        self._emit(target, pred, kind, obj_res)
                    elif "content" in a:
                        self._emit(target, pred, "literal", a.get("content") or "")
                    elif tag in _HREF_TAGS and a.get("href"):
                        self._emit(target, pred, "iri", a["href"])
                    elif tag in _SRC_TAGS and a.get("src"):
                        self._emit(target, pred, "iri", a["src"])
                    elif not is_void:
                        self._captures.append(_Capture(target, pred, depth))

        # typeof types go on: about-subject, else the resource/bnode
        # object, else the element's minted subject
        type_target = subject if subject is not None else obj_res
        if type_target is not None:
            for t in typeof:
                t_iri = self._expand_curie(t, vocab)
                if t_iri:
                    self._emit(type_target, RDF_TYPE, "iri", t_iri)

        # descendants inherit: about-subject, else the resource/chained
        # object (RDFa chaining), else the current subject
        new_ctx_subject = subject if subject is not None else obj_res
        if (new_ctx_subject is not None or vocab != ctx.vocab) and not is_void:
            self._rdfa_stack.append(
                _RdfaCtx(
                    new_ctx_subject if new_ctx_subject is not None else ctx.subject,
                    vocab,
                    depth,
                )
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
    # JSON-LD blocks carry their own block-local line_no, which collides
    # with the microdata/RDFa sequence — renumber so line_no is a unique
    # per-document triple index (provenance + deterministic salt key)
    return [t._replace(line_no=i) for i, t in enumerate(triples)], prefixes


_JB_RE = re.compile(r"^_:jb(\d+)$")


def _offset_bnode(term: str, offset: int) -> str:
    m = _JB_RE.match(term)
    if m:
        return f"_:jb{int(m.group(1)) + offset}"
    return term
