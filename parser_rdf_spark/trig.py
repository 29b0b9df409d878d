"""TriG subset parser: the Turtle grammar (the :mod:`.turtle` subset)
plus named-graph blocks — the text syntax for RDF DATASETS, completing
the quads format matrix next to line-oriented N-Quads (:mod:`.nquads`).

No reference counterpart ("TriG/N-Quads not required", reference
docs/spec-completeness.md:131) — new engine surface, same slot-in
pattern as N-Quads: the handler is appended AFTER the reference-pinned
four so every reference detection decision is preserved; TriG documents
reach this parser via explicit ``fmt="trig"``, via the appended
handler's own sniff (``GRAPH``-led or ``{``-block documents nothing
earlier claims), or via the parse-stage retry fallback when a
``@prefix``-led document detects as Turtle but fails its strict parse
on a ``{``.

Grammar scope (mirrors the Turtle subset):

* every Turtle statement form at top level → the DEFAULT graph;
* ``GRAPH <iri> { … }`` / ``GRAPH _:b { … }`` (keyword form);
* ``<iri> { … }`` / ``pname { … }`` / ``_:b { … }`` (label form);
* ``{ … }`` (anonymous block → default graph);
* inside a block, the final ``.`` of the last statement is optional
  (TriG ``triplesBlock`` production);
* nested GRAPH blocks are illegal (raise), matching the spec.

Graph bnode labels share the doc-scoping pass (:func:`.formats
.scope_bnodes`) with every other handler.
"""

from __future__ import annotations

import re
from typing import Optional

from .ntriples import Triple
from .turtle import TurtleError, TurtleParser

__all__ = ["TrigError", "parse_document", "can_handle"]

TrigError = TurtleError  # one error channel: the parse stage wraps either

# a block opener the sniffer may CLAIM: the GRAPH keyword (any label
# form), an absolute-IRI label (scheme required, no whitespace — so HTML
# tags like '<script type=...>' never match), or a bnode label, each
# immediately followed by '{'. Deliberately NOT claimed: bare '{'
# (JSON/JSON-LD/CSS/JS territory) and pname labels without the GRAPH
# keyword ('a:hover { ... }' is a CSS rule; pname-labeled TriG declares
# @prefix first, detects as Turtle, and arrives via the parse-stage
# retry).
_SNIFF_RE = re.compile(
    r"^(?:GRAPH\s+(?:<[^<>\s]+>|_:\S+|(?:[A-Za-z_][\w.\-]*)?:[\w.\-]*)"
    r"|<[A-Za-z][A-Za-z0-9+.\-]*:[^<>\s]*>"
    r"|_:[^\s{]+)\s*\{",
    re.IGNORECASE,
)


class TrigParser(TurtleParser):
    def __init__(self, content: str):
        super().__init__(content)
        self._graph: Optional[str] = None  # None = default graph

    # -- quad emission ------------------------------------------------------

    def _emit(self, subj, pred: str, obj) -> None:
        self.triples.append(
            Triple(
                subj.value,
                pred,
                obj.kind,
                obj.value,
                obj.lang,
                obj.datatype,
                self._line_of(self.i),
                self._graph,
            )
        )

    # -- block structure ----------------------------------------------------

    def _at_graph_keyword(self) -> bool:
        s, i = self.s, self.i
        if s[i : i + 5].upper() != "GRAPH":
            return False
        nxt = s[i + 5 : i + 6]
        return nxt == "" or not (nxt.isalnum() or nxt in "_-.:")

    def _graph_label(self) -> str:
        """labelOrSubject: IRI, prefixed name, or blank-node label."""
        self._skip_ws()
        if self.i >= self.n:
            raise self._err("expected graph label")
        ch = self.s[self.i]
        if ch == "<":
            return self._read_iriref()
        if self.s.startswith("_:", self.i):
            term = self._read_term(subject_pos=True)
            return term.value
        return self._read_pname()

    def _statement(self) -> None:
        """One Turtle triples statement, shared by top level and blocks;
        the caller handles the terminating '.'."""
        subj = self._read_term(subject_pos=True)
        self._skip_ws()
        # a bare '[...]'/collection subject may be a complete statement
        if self.i < self.n and self.s[self.i] in ".}" and subj.kind == "bnode":
            return
        self._predicate_object_list(subj)

    def _wrapped_graph(self, graph: Optional[str]) -> None:
        if self._graph is not None:
            raise self._err("nested GRAPH blocks are not allowed")
        self._expect("{")
        self._graph = graph
        try:
            while True:
                self._skip_ws()
                if self.i >= self.n:
                    raise self._err("unterminated graph block")
                if self.s[self.i] == "}":
                    self.i += 1
                    return
                if self.s[self.i] == "{" or self._at_graph_keyword():
                    raise self._err("nested GRAPH blocks are not allowed")
                self._statement()
                self._skip_ws()
                if self.i < self.n and self.s[self.i] == ".":
                    self.i += 1
                elif self.i >= self.n or self.s[self.i] != "}":
                    raise self._err("expected '.' or '}' in graph block")
                # trailing '.' before '}' is legal (triplesBlock)
        finally:
            self._graph = None

    # -- document -----------------------------------------------------------

    def parse(self) -> list[Triple]:
        while True:
            self._skip_ws()
            if self.i >= self.n:
                return self.triples
            if self._directive():
                continue
            if self._at_graph_keyword():
                self.i += 5
                label = self._graph_label()
                self._skip_ws()
                self._wrapped_graph(label)
                continue
            if self.s[self.i] == "{":
                self._wrapped_graph(None)  # anonymous block: default graph
                continue
            # labelOrSubject: a term followed by '{' names a graph; any
            # other continuation is a plain default-graph statement. A
            # property-carrying ANON ('[ :p :o ]') emits triples while
            # being read, so it can only be a SUBJECT, never a label.
            n_before = len(self.triples)
            subj = self._read_term(subject_pos=True)
            self._skip_ws()
            if (
                self.i < self.n
                and self.s[self.i] == "{"
                and subj.kind in ("iri", "bnode")
                and len(self.triples) == n_before
            ):
                self._wrapped_graph(subj.value)
                continue
            if self.i < self.n and self.s[self.i] == "." and subj.kind == "bnode":
                self.i += 1
                continue
            self._predicate_object_list(subj)
            self._skip_ws()
            self._expect(".")


def parse_document(content: str) -> tuple[list[Triple], dict[str, str]]:
    """Parse a TriG document; returns (triples-with-graph, prefixes)."""
    p = TrigParser(content)
    triples = p.parse()
    return triples, p.prefixes


def can_handle(content: str) -> bool:
    """Sniff: an unambiguous block opener (see ``_SNIFF_RE``) among the
    first 10 RAW lines — the same 10-line cap discipline as every other
    sniffer (D5: slice first, then trim per-line). ``@prefix``-led and
    pname-labeled TriG detect as Turtle first (reference-pinned
    priority); GRAPH-block docs with triple-shaped inner lines detect as
    N-Triples — both reach this parser via the parse-stage retry. Bare
    ``{`` documents are never claimed (JSON-LD territory; reachable via
    explicit ``fmt="trig"``)."""
    from .ntriples import php_trim

    for raw in content.split("\n")[:10]:
        line = php_trim(raw)
        if not line or line.startswith("#"):
            continue
        if _SNIFF_RE.match(line):
            return True
    return False
