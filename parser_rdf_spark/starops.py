"""Distributed RDF-star operators over the string-typed triples relation.

Companion to :mod:`.rdfstar` (the pure-Python grammar layer): these are
the DataFrame jobs. Design for 100 TB: quoted-term *parsing* (the only
step Spark's built-ins can't express) runs Arrow-vectorized on the
DISTINCT quoted lexical forms only — a dictionary orders of magnitude
smaller than the corpus — and is joined back; id derivation, rewriting,
filtering and the reification quads themselves are pure Column work
inside whole-stage codegen. Statement ids are ``urn:stmt:md5(lexical)``
(rdfstar.stmt_id), so the asserted-row rewrite needs NO join at all:
``concat('urn:stmt:', md5(term))`` recomputes the id in the JVM.

Round-trip law (pinned in tests + the contract gate):
``reification_to_star(star_to_reification(t))`` ≡ ``t``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from . import rdfstar
from .rdfstar import (
    RDF_OBJECT,
    RDF_PREDICATE,
    RDF_STATEMENT,
    RDF_SUBJECT,
    RDF_TYPE,
    STMT_PREFIX,
)

_PART_FIELDS = [
    StructField("q_subj_kind", StringType(), True),
    StructField("q_subj", StringType(), True),
    StructField("q_pred", StringType(), True),
    StructField("q_obj_kind", StringType(), True),
    StructField("q_obj_value", StringType(), True),
    StructField("q_obj_lang", StringType(), True),
    StructField("q_obj_datatype", StringType(), True),
]
_PARTS_SCHEMA = StructType(_PART_FIELDS)
_EXPAND_SCHEMA = ArrayType(
    StructType([StructField("stmt", StringType(), True)] + _PART_FIELDS)
)


@F.pandas_udf(_PARTS_SCHEMA)
def _parse_quoted_udf(lex):  # pragma: no cover - exercised via Spark
    import pandas as pd

    rows = []
    for v in lex:
        try:
            s_kind, s, p, o_kind, o, o_lang, o_dt = rdfstar.parse_quoted(v)
            rows.append((s_kind, s, p, o_kind, o, o_lang, o_dt))
        except Exception:
            # not a quoted term (e.g. a literal that merely starts with
            # '<<' in a kind-collapsed relation): null parts, filtered out
            rows.append((None, None, None, None, None, None, None))
    return pd.DataFrame(
        rows, columns=[f.name for f in _PART_FIELDS]
    )


@F.pandas_udf(_EXPAND_SCHEMA)
def _expand_quoted_udf(lex):  # pragma: no cover - exercised via Spark
    import pandas as pd

    out = []
    for v in lex:
        try:
            out.append([
                (sid, sk, s, p, ok, o, ol, od)
                for (_root, sid, sk, s, p, ok, o, ol, od) in rdfstar.expand_quoted(v)
            ])
        except Exception:
            out.append([])
    return pd.Series(out)


def _quoted_terms(triples: DataFrame) -> DataFrame:
    """Distinct quoted lexical forms occurring in subject or object
    position of the full-schema triples relation → one column ``term``."""
    subs = triples.filter(F.col("subj").startswith("<<")).select(
        F.col("subj").alias("term")
    )
    objs = triples.filter(F.col("obj_kind") == "quoted").select(
        F.col("obj_value").alias("term")
    )
    return subs.unionByName(objs).distinct()


def star_unnest(triples: DataFrame) -> DataFrame:
    """The relational accessor for quoted terms: one row per distinct
    quoted lexical form with its inner parts (one level — a nested
    quoted subterm surfaces with kind 'quoted' and its own lexical
    form, so chaining star_unnest walks the nesting). Columns:
    ``term, q_subj_kind, q_subj, q_pred, q_obj_kind, q_obj_value,
    q_obj_lang, q_obj_datatype``.

    This is the scalable substitute for SPARQL-star's SUBJECT() /
    PREDICATE() / OBJECT() accessors: parse once per distinct term,
    join anywhere."""
    terms = _quoted_terms(triples)
    parts = terms.withColumn("p", _parse_quoted_udf(F.col("term")))
    return parts.select("term", "p.*").filter(F.col("q_pred").isNotNull())


def star_to_reification(triples: DataFrame) -> DataFrame:
    """W3C mapping, star → standard reification: every quoted term
    becomes a skolem statement node ``urn:stmt:md5(lexical)`` carrying
    rdf:type rdf:Statement + rdf:subject/predicate/object, emitted once
    per (doc_url, graph) that references the term; asserted rows have
    their quoted positions rewritten to the node IRI (a pure-Column
    md5 — no join). Nested quoted terms expand recursively. Output
    keeps the full triples schema; reification rows carry line_no NULL.
    """
    cols = triples.columns
    has_subj_q = F.col("subj").startswith("<<")
    has_obj_q = F.col("obj_kind") == "quoted"

    # (doc_url, graph, term) occurrences -> join target for the expanded
    # per-term reification rows (roots carry all their nested children)
    occ = (
        triples.filter(has_subj_q).select("doc_url", "graph", F.col("subj").alias("term"))
        .unionByName(
            triples.filter(has_obj_q).select(
                "doc_url", "graph", F.col("obj_value").alias("term")
            )
        )
        .distinct()
    )
    expanded = (
        occ.select("term").distinct()
        .withColumn("r", F.explode(_expand_quoted_udf(F.col("term"))))
        .select("term", "r.*")
    )
    parts = occ.join(expanded, "term").select(
        "doc_url", "graph", "stmt", "q_subj_kind", "q_subj", "q_pred",
        "q_obj_kind", "q_obj_value", "q_obj_lang", "q_obj_datatype",
    ).dropDuplicates(["doc_url", "graph", "stmt"])

    def _reif_row(pred: str, kind, value, lang=None, dt=None) -> DataFrame:
        return parts.select(
            "doc_url",
            "graph",
            F.col("stmt").alias("subj"),
            F.lit(pred).alias("pred"),
            (F.lit(kind) if isinstance(kind, str) else kind).alias("obj_kind"),
            (F.lit(value) if isinstance(value, str) else value).alias("obj_value"),
            (F.lit(None).cast("string") if lang is None else lang).alias("obj_lang"),
            (F.lit(None).cast("string") if dt is None else dt).alias("obj_datatype"),
            F.lit(None).cast("int").alias("line_no"),
        )

    reif = (
        _reif_row(RDF_TYPE, "iri", RDF_STATEMENT)
        .unionByName(_reif_row(RDF_SUBJECT, F.col("q_subj_kind"), F.col("q_subj")))
        .unionByName(_reif_row(RDF_PREDICATE, "iri", F.col("q_pred")))
        .unionByName(
            _reif_row(
                RDF_OBJECT,
                F.col("q_obj_kind"),
                F.col("q_obj_value"),
                F.col("q_obj_lang"),
                F.col("q_obj_datatype"),
            )
        )
    )

    node = lambda c: F.concat(F.lit(STMT_PREFIX), F.md5(c))  # noqa: E731
    rewritten = triples.select(
        *[
            F.when(has_subj_q, node(F.col("subj"))).otherwise(F.col("subj")).alias("subj")
            if c == "subj"
            else F.when(has_obj_q, F.lit("iri")).otherwise(F.col("obj_kind")).alias("obj_kind")
            if c == "obj_kind"
            else F.when(has_obj_q, node(F.col("obj_value"))).otherwise(F.col("obj_value")).alias("obj_value")
            if c == "obj_value"
            else F.col(c)
            for c in cols
        ]
    )
    extra = [c for c in cols if c not in reif.columns]
    for c in extra:
        reif = reif.withColumn(c, F.lit(None).cast(dict(triples.dtypes)[c]))
    return rewritten.unionByName(reif.select(*cols))


def _render_term_subj(kind: Column, value: Column) -> Column:
    return F.when(kind == "iri", F.concat(F.lit("<"), value, F.lit(">"))).otherwise(value)


def _escape_literal(col: Column) -> Column:
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _render_term_obj(kind: Column, value: Column, lang: Column, dt: Column) -> Column:
    lit = F.concat(
        F.lit('"'),
        _escape_literal(value),
        F.lit('"'),
        F.when(lang.isNotNull() & (lang != ""), F.concat(F.lit("@"), lang))
        .when(dt.isNotNull() & (dt != ""), F.concat(F.lit("^^<"), dt, F.lit(">")))
        .otherwise(F.lit("")),
    )
    return (
        F.when(kind == "iri", F.concat(F.lit("<"), value, F.lit(">")))
        .when(kind.isin("bnode", "quoted"), value)
        .otherwise(lit)
    )


def reification_to_star(triples: DataFrame, max_depth: int = 8) -> DataFrame:
    """W3C mapping, standard reification → star: statement nodes (typed
    rdf:Statement with exactly one rdf:subject / rdf:predicate /
    rdf:object in their (doc_url, graph)) are re-rendered as canonical
    quoted lexical forms; every other occurrence of the node is
    rewritten to the quoted term and the four defining quads are
    dropped. Nested reification (a statement whose subject/object is
    itself a statement node) resolves innermost-first, ``max_depth``
    rounds of pure-Column rendering — each round is one join, no UDF.

    Inverse of :func:`star_to_reification` (round-trip law pinned)."""
    cols = triples.columns
    g = F.coalesce(F.col("graph"), F.lit("_:default"))
    scoped = triples.withColumn("_g", g)

    reif_preds = [RDF_SUBJECT, RDF_PREDICATE, RDF_OBJECT]
    defs = scoped.filter(
        (F.col("pred").isin(reif_preds))
        | ((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == RDF_STATEMENT))
    )
    one = lambda p, c: F.first(F.when(F.col("pred") == p, F.col(c)), ignorenulls=True)  # noqa: E731
    cnt = lambda p: F.sum(F.when(F.col("pred") == p, 1).otherwise(0))  # noqa: E731
    stmts = (
        defs.groupBy("doc_url", "_g", F.col("subj").alias("node"))
        .agg(
            cnt(RDF_SUBJECT).alias("n_s"),
            cnt(RDF_PREDICATE).alias("n_p"),
            cnt(RDF_OBJECT).alias("n_o"),
            F.sum(
                F.when(
                    (F.col("pred") == RDF_TYPE) & (F.col("obj_value") == RDF_STATEMENT), 1
                ).otherwise(0)
            ).alias("n_t"),
            one(RDF_SUBJECT, "obj_kind").alias("s_kind"),
            one(RDF_SUBJECT, "obj_value").alias("s_val"),
            one(RDF_PREDICATE, "obj_value").alias("p_val"),
            one(RDF_PREDICATE, "obj_kind").alias("p_kind"),
            one(RDF_OBJECT, "obj_kind").alias("o_kind"),
            one(RDF_OBJECT, "obj_value").alias("o_val"),
            one(RDF_OBJECT, "obj_lang").alias("o_lang"),
            one(RDF_OBJECT, "obj_datatype").alias("o_dt"),
        )
        .filter(
            (F.col("n_s") == 1) & (F.col("n_p") == 1) & (F.col("n_o") == 1)
            & (F.col("n_t") >= 1) & (F.col("p_kind") == "iri")
        )
        .select("doc_url", "_g", "node", "s_kind", "s_val", "p_val",
                "o_kind", "o_val", "o_lang", "o_dt")
    )

    # innermost-first resolution: a statement renders once the nodes its
    # subject/object reference are themselves resolved (or are not
    # statement nodes at all). Per-round localCheckpoint is REQUIRED
    # (canonical.py discipline): without it the anti-join lineage
    # recomputes the groupBy every round.
    pending = stmts.localCheckpoint(eager=True)
    resolved = None  # (doc_url, _g, node, lex)

    def _subst(df: DataFrame, res: DataFrame, val: str, kind: str) -> DataFrame:
        """Replace ``val`` with the resolved lexical form (same doc/graph)
        and flip ``kind`` to 'quoted' where a substitution happened."""
        rs = res.select(
            F.col("doc_url").alias("rd"), F.col("_g").alias("rg"),
            F.col("node").alias("rn"), F.col("lex").alias("rlex"))
        return (
            df.join(
                rs,
                (df[val] == rs["rn"]) & (df["doc_url"] == rs["rd"])
                & (df["_g"] == rs["rg"]),
                "left",
            )
            .withColumn(val, F.coalesce(F.col("rlex"), F.col(val)))
            .withColumn(
                kind,
                F.when(F.col("rlex").isNotNull(), F.lit("quoted")).otherwise(F.col(kind)),
            )
            .drop("rd", "rg", "rn", "rlex")
        )

    for _ in range(max_depth):
        if pending.isEmpty():
            break
        # a pending statement is blocked while its subject or object
        # still references another pending statement node (same doc/graph)
        refs = pending.select(
            "doc_url", "_g", "node",
            F.explode(F.array("s_val", "o_val")).alias("ref"),
        )
        pend_ids = pending.select(
            F.col("doc_url").alias("pd"), F.col("_g").alias("pg"),
            F.col("node").alias("pn"))
        blocked = (
            refs.join(
                pend_ids,
                (refs["ref"] == pend_ids["pn"]) & (refs["doc_url"] == pend_ids["pd"])
                & (refs["_g"] == pend_ids["pg"]),
                "left_semi",
            )
            .select("doc_url", "_g", "node")
            .distinct()
        )
        ready = pending.join(blocked, ["doc_url", "_g", "node"], "left_anti")
        if resolved is not None:
            ready = _subst(ready, resolved, "s_val", "s_kind")
            ready = _subst(ready, resolved, "o_val", "o_kind")
        lex = F.concat(
            F.lit("<< "),
            _render_term_subj(F.col("s_kind"), F.col("s_val")),
            F.lit(" <"), F.col("p_val"), F.lit("> "),
            _render_term_obj(F.col("o_kind"), F.col("o_val"),
                             F.col("o_lang"), F.col("o_dt")),
            F.lit(" >>"),
        )
        new_res = ready.select(
            "doc_url", "_g", "node", lex.alias("lex")
        ).localCheckpoint(eager=True)
        if new_res.isEmpty():
            break  # cyclic reification — leave the remainder untouched
        resolved = new_res if resolved is None else resolved.unionByName(new_res)
        resolved = resolved.localCheckpoint(eager=True)
        pending = pending.join(new_res.select("doc_url", "_g", "node"),
                               ["doc_url", "_g", "node"],
                               "left_anti").localCheckpoint(eager=True)

    if resolved is None:
        return triples

    # drop the four defining quads of every resolved node, then rewrite
    # remaining occurrences to the quoted lexical form
    rnodes = resolved.select(
        F.col("doc_url").alias("rd"), F.col("_g").alias("rg"),
        F.col("node").alias("rn"), F.col("lex").alias("rlex"))
    kept = scoped.join(
        rnodes,
        (scoped["subj"] == rnodes["rn"]) & (scoped["doc_url"] == rnodes["rd"])
        & (scoped["_g"] == rnodes["rg"])
        & (
            F.col("pred").isin(reif_preds)
            | ((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == RDF_STATEMENT))
        ),
        "left_anti",
    )
    out = (
        kept.join(
            rnodes,
            (kept["subj"] == rnodes["rn"]) & (kept["doc_url"] == rnodes["rd"])
            & (kept["_g"] == rnodes["rg"]),
            "left",
        )
        .withColumn("subj", F.coalesce(F.col("rlex"), F.col("subj")))
        .drop("rd", "rg", "rn", "rlex")
    )
    out = (
        out.join(
            rnodes,
            (out["obj_value"] == rnodes["rn"]) & (out["obj_kind"] == "iri")
            & (out["doc_url"] == rnodes["rd"]) & (out["_g"] == rnodes["rg"]),
            "left",
        )
        .withColumn("obj_value", F.coalesce(F.col("rlex"), F.col("obj_value")))
        .withColumn(
            "obj_kind",
            F.when(F.col("rlex").isNotNull(), F.lit("quoted")).otherwise(F.col("obj_kind")),
        )
        .drop("rd", "rg", "rn", "rlex")
    )
    return out.select(*cols)
