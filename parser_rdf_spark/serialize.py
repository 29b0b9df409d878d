"""N-Triples serialization: the sink-side twin of the parse stage.

The reference only consumes RDF; a KG-construction pipeline also has to
EMIT it (exports for downstream consumers, round-trip archival of the
canonicalized graph). This module renders the engine's full triples
schema (schemas.TRIPLES) back to canonical N-Triples lines as ONE pure
Column expression — no Python per row, serialization rides whole-stage
codegen, and `write_ntriples` is a plain distributed text write.

Escaping follows the W3C N-Triples canonical form the in-repo validator
accepts (parser_rdf_spark/ntriples.py:193 whitelist): backslash, quote,
LF, CR, TAB as two-character escapes inside literals; IRIs were
validated at parse time to contain none of ``<>"{}|^`\\`` or whitespace
(V5/V8), so they re-embed verbatim. Round-trip law (pinned by tests):
``parse(serialize(t)) == t`` for every triple the parser emits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    # order matters: backslash first, then the characters whose escapes
    # introduce new backslashes
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _term(col: Column) -> Column:
    return F.when(col.startswith("_:"), col).otherwise(F.concat(F.lit("<"), col, F.lit(">")))


def ntriples_line() -> Column:
    """The N-Triples rendering of one full-schema triples row."""
    obj = (
        F.when(F.col("obj_kind") == "iri", F.concat(F.lit("<"), F.col("obj_value"), F.lit(">")))
        .when(F.col("obj_kind") == "bnode", F.col("obj_value"))
        .otherwise(
            F.concat(
                F.lit('"'),
                _escape_literal(F.col("obj_value")),
                F.lit('"'),
                F.when(
                    F.col("obj_lang").isNotNull(),
                    F.concat(F.lit("@"), F.col("obj_lang")),
                ).when(
                    F.col("obj_datatype").isNotNull(),
                    F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
                ).otherwise(F.lit("")),
            )
        )
    )
    return F.concat(_term(F.col("subj")), F.lit(" "),
                    _term(F.col("pred")), F.lit(" "),
                    obj, F.lit(" ."))


def to_ntriples(triples: DataFrame) -> DataFrame:
    """triples (full schema) → (doc_url, line) N-Triples lines, in the
    source document's line order when line_no is present."""
    out = triples.select("doc_url", "line_no", ntriples_line().alias("line"))
    return out.select("doc_url", "line")


def write_ntriples(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """Distributed N-Triples export: one text file per partition. N-Triples
    is line-delimited, so any per-file subset is itself a valid document —
    the property that makes this format the interchange default at scale."""
    lines = to_ntriples(triples).select("line")
    if partitions:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)
