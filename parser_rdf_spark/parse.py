"""Stage 2: the fused detect → validate → parse mapInPandas stage.

ONE Arrow round-trip per page batch (SURVEY.md §4 item 4): detection (D1-
D10), strict validation (V1-V13), tokenization (P1-P4), doc-scoped blank-
node rewriting (P5), per-doc prefix extraction (E14) and resource counts
(P6) all happen inside a single ``mapInPandas`` pass over the ``text``
column. Everything downstream of this stage is pure Column/SQL expressions
— zero Python after stage 2 (BASELINE.json:15 "no per-row Python" refers
to per-row *Python UDF calls*; this stage is Arrow-batched with the
per-document tokenizer loops inside the batch, the idiomatic-Spark shape
for a parser).

Output is a single wide DataFrame (schemas.PARSED) with rec_type
'triple' rows plus exactly one 'doc' row per input page carrying
format/error/metadata/prefixes. Split it with :func:`triples_of`,
:func:`errors_of`, :func:`docmeta_of` — and persist/checkpoint the parsed
frame first if you fan out to several consumers, so the 100-TB text scan
happens once.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import formats as _formats
from .schemas import PARSED

_PARSED_COLS = [f.name for f in PARSED.fields]

DEFAULT_GRAPH = "_:default"  # E21 sentinel (reference: src/RdfParser.php:136-154)


def doc_hash(url: str) -> str:
    """Deterministic 64-bit doc id used for blank-node scoping (P5)."""
    return hashlib.blake2b(url.encode("utf-8"), digest_size=8).hexdigest()


def _parse_batch(pdf: pd.DataFrame, fmt: Optional[str], scope: bool, empty_guard: bool) -> pd.DataFrame:
    cols: dict[str, list] = {c: [] for c in _PARSED_COLS}

    t_append = {
        c: cols[c].append
        for c in (
            "doc_url",
            "rec_type",
            "graph",
            "subj",
            "pred",
            "obj_kind",
            "obj_value",
            "obj_lang",
            "obj_datatype",
            "line_no",
        )
    }
    _doc_only = ("format", "error_stage", "error_line", "error_message",
                 "resource_count", "n_triples", "prefixes")

    urls = pdf["url"].tolist()
    texts = pdf["text"].tolist()
    for url, text in zip(urls, texts):
        res = _formats.parse_rdf_document(
            text if isinstance(text, str) else "", fmt, empty_guard=empty_guard
        )
        triples = res.triples
        if scope and triples:
            triples = _formats.scope_bnodes(triples, doc_hash(url))
        for t in triples:
            t_append["doc_url"](url)
            t_append["rec_type"]("triple")
            t_append["graph"](DEFAULT_GRAPH)
            t_append["subj"](t.subj)
            t_append["pred"](t.pred)
            t_append["obj_kind"](t.obj_kind)
            t_append["obj_value"](t.obj_value)
            t_append["obj_lang"](t.obj_lang)
            t_append["obj_datatype"](t.obj_datatype)
            t_append["line_no"](t.line_no)
        n_t = len(triples)
        for c in _doc_only:
            cols[c].extend([None] * n_t)

        # the single 'doc' row
        t_append["doc_url"](url)
        t_append["rec_type"]("doc")
        t_append["graph"](DEFAULT_GRAPH)
        for c in ("subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"):
            cols[c].append(None)
        cols["line_no"].append(None)
        cols["format"].append(res.format)
        cols["error_stage"].append(res.error_stage)
        cols["error_line"].append(res.error_line)
        cols["error_message"].append(res.error_message)
        cols["resource_count"].append(res.resource_count if res.ok else None)
        cols["n_triples"].append(n_t if res.ok else None)
        cols["prefixes"].append(res.prefixes if res.ok else None)

    out = pd.DataFrame(cols)
    out["line_no"] = out["line_no"].astype("Int32")
    out["error_line"] = out["error_line"].astype("Int32")
    out["resource_count"] = out["resource_count"].astype("Int64")
    out["n_triples"] = out["n_triples"].astype("Int64")
    return out


def parse_pages(
    pages: DataFrame,
    fmt: Optional[str] = None,
    scope_bnodes: bool = True,
    empty_guard: bool = True,
) -> DataFrame:
    """pages(url, …, text, …) → PARSED frame.

    ``fmt`` is the D2 explicit-format override; unknown names raise
    FormatDetectionError *here*, before any job is submitted.
    ``empty_guard=False`` gives handler-direct semantics for empty docs
    (see formats.parse_rdf_document).
    """
    if fmt is not None and fmt not in _formats.supported_formats():
        raise _formats.FormatDetectionError(
            f"No handler registered for format: {fmt}. "
            f"Available: {', '.join(_formats.supported_formats())}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _parse_batch(pdf, fmt, scope_bnodes, empty_guard)

    # column-prune before the Python boundary: only url+text cross Arrow.
    return pages.select("url", "text").mapInPandas(run, schema=PARSED)


def triples_of(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("rec_type") == "triple").select(
        "doc_url", "graph", "subj", "pred",
        "obj_kind", "obj_value", "obj_lang", "obj_datatype", "line_no",
    )


def errors_of(parsed: DataFrame) -> DataFrame:
    return parsed.filter(
        (F.col("rec_type") == "doc") & F.col("error_stage").isNotNull()
    ).select(
        "doc_url",
        F.col("error_stage").alias("stage"),
        F.col("error_line").alias("line"),
        F.col("error_message").alias("message"),
    )


def docmeta_of(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("rec_type") == "doc").select(
        "doc_url", "format", "error_stage", "error_line", "error_message",
        "resource_count", "n_triples", "prefixes",
    )


def prefixes_of(parsed: DataFrame) -> DataFrame:
    """Long-form prefixes table (doc_url, prefix, namespace)."""
    return (
        docmeta_of(parsed)
        .filter(F.col("prefixes").isNotNull())
        .select("doc_url", F.explode("prefixes").alias("prefix", "namespace"))
    )


def detected_of(parsed: DataFrame) -> DataFrame:
    """D4 canParse surface: (url, format, error)."""
    return docmeta_of(parsed).select(
        F.col("doc_url").alias("url"),
        "format",
        F.col("error_stage").alias("error"),
    )


def subject_bnode(col: Column) -> Column:
    """Predicate: is this term a (scoped) blank node?"""
    return col.startswith("_:")
