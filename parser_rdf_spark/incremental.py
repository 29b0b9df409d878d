"""Incremental KG maintenance: delta merges and incremental connected
components.

A 10^12-document corpus is never rebuilt from scratch — crawls arrive as
deltas (re-crawled urls replace their old triples; new urls append), and
stage-3 entity resolution must absorb new equivalence edges without
re-running connected components over the full vertex set. Neither
operation exists in the reference (it parses one document per call;
corpus maintenance is out of its scope — reference src/RdfParser.php:83
processes a single payload), but both are mandatory for the north rule's
resumable, continuously-updated pipeline.

Scale design:

* :func:`merge_triples` is one anti-join (shuffle on the document key,
  broadcast-converted by AQE when the delta's key set is small — the
  common case: a crawl batch touches a tiny fraction of the corpus)
  plus a union. No window, no Python.
* :func:`incremental_connected_components` contracts the previous
  labelling to its component representatives and runs hash-min CC on the
  QUOTIENT graph — one node per *touched* component or new vertex, i.e.
  work proportional to the delta, not the corpus. Untouched components
  are carried over by a left join. Labels stay canonical (minimum member
  vertex), so the result is bit-identical to a full recompute — the
  contract query pins exactly that equality against a full-graph oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .linking import connected_components


def merge_triples(
    old: DataFrame,
    delta: DataFrame,
    key: str = "doc_url",
) -> DataFrame:
    """Replace-by-document merge: every ``old`` row whose ``key`` appears
    in ``delta`` is superseded by the delta's rows for that key (a
    re-crawled document replaces ALL its previous triples, including ones
    the new version no longer asserts); keys absent from ``delta`` are
    carried over untouched; delta-only keys are appended.

    Equivalent SQL: ``old ANTI JOIN delta USING (key) UNION ALL delta``.
    """
    touched = delta.select(key).distinct()
    return old.join(touched, key, "left_anti").unionByName(delta)


def merge_extracted(
    old: DataFrame,
    delta_triples: DataFrame,
    extractor,
    key: str = "doc_url",
) -> DataFrame:
    """Work-∝-delta maintenance of an extraction table (classes /
    properties / shapes): re-extract ONLY the delta documents' triples
    and replace those documents' rows in the table.

    Every extractor is per-document pure — each output row depends only
    on its own document's triples (the E19 dedupe key is
    ``(doc_url, uri)``; reference src/Extractors/*.php each see one
    payload) — so this is bit-identical to re-extracting the merged
    corpus, at delta cost instead of corpus cost. Pinned by pytest
    equality against full re-extraction and by the
    ``incremental_ontology_merge`` contract query.

    The superseded-key set comes from ``delta_triples`` (the documents
    re-crawled), NOT from the fresh extraction's rows: a re-crawled
    document whose new version defines no resources at all must still
    have its stale table rows purged.
    """
    touched = delta_triples.select(key).distinct()
    fresh = extractor(delta_triples)
    return old.join(touched, key, "left_anti").unionByName(fresh)


def merge_stats(old: DataFrame, delta: DataFrame, key: str = "doc_url") -> DataFrame:
    """Delta-merge observability: one row of counters (docs touched /
    added, triples removed / added / carried) — the per-batch lineage a
    production merge job logs."""
    old_keys = old.select(key).distinct()
    delta_keys = delta.select(key).distinct()
    updated = delta_keys.join(old_keys, key, "left_semi").count()
    added_docs = delta_keys.join(old_keys, key, "left_anti").count()
    removed = old.join(delta_keys, key, "left_semi").count()
    carried = old.count() - removed
    return old.sparkSession.createDataFrame(
        [(updated, added_docs, removed, delta.count(), carried)],
        "docs_updated bigint, docs_added bigint, triples_removed bigint, "
        "triples_added bigint, triples_carried bigint",
    )


def incremental_connected_components(
    prev: DataFrame,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Merge ``new_edges`` into a previous components labelling without
    recomputing untouched components.

    ``prev`` is (vertex, component) as returned by
    :func:`~.linking.connected_components` — ``component`` must be the
    canonical minimum member vertex (that function's contract). The
    result is exactly what ``connected_components(old_edges ∪ new_edges)``
    would return, because the quotient graph's hash-min labels are the
    minimum over component REPRESENTATIVES, every member is ≥ its
    representative, and therefore the merged minimum-of-minima is the
    true minimum member of the merged component.

    Plan: two broadcast-friendly label lookups on the (small) delta, CC
    on the quotient graph (vertices = touched representatives + new
    vertices), then one left join to relabel the full vertex set.
    """
    labels = prev.select("vertex", "component")

    # 1. project delta endpoints through the previous labelling; vertices
    #    the previous run never saw keep themselves as representative
    e = new_edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    lab_u = labels.select(F.col("vertex").alias("u"), F.col("component").alias("cu"))
    lab_v = labels.select(F.col("vertex").alias("v"), F.col("component").alias("cv"))
    quotient = (
        e.join(lab_u, "u", "left")
        .join(lab_v, "v", "left")
        .select(
            F.coalesce("cu", "u").alias("qsrc"),
            F.coalesce("cv", "v").alias("qdst"),
        )
        .filter(F.col("qsrc") != F.col("qdst"))
        .distinct()
    )

    # 2. hash-min CC over the quotient graph: |V| = touched components +
    #    new vertices — delta-sized, not corpus-sized
    qcc = connected_components(quotient, src_col="qsrc", dst_col="qdst").select(
        F.col("vertex").alias("rep"), F.col("component").alias("merged")
    )

    # 3. relabel: previous vertices follow their representative's merged
    #    label (untouched components miss the join and keep theirs)
    carried = (
        labels.join(qcc, labels.component == qcc.rep, "left")
        .select(
            "vertex",
            F.coalesce("merged", "component").alias("component"),
        )
    )

    # 4. vertices introduced by the delta (not in prev): they appear in
    #    the quotient as themselves; an isolated pair of new vertices gets
    #    its label from qcc directly
    new_vertices = (
        new_edges.select(F.col(src_col).alias("vertex"))
        .unionByName(new_edges.select(F.col(dst_col).alias("vertex")))
        .distinct()
        .join(labels.select("vertex"), "vertex", "left_anti")
    )
    fresh = (
        new_vertices.join(qcc, new_vertices.vertex == qcc.rep, "left")
        .select("vertex", F.coalesce("merged", "vertex").alias("component"))
    )

    return (
        carried.unionByName(fresh)
        .withColumn("component_id", F.xxhash64("component"))
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Schema-evolution diff between two versions of an extraction table
    (classes, properties, shapes — any keyed relation): one row per
    added / removed / changed key with the list of columns that changed.
    Unchanged rows are omitted. The ontology analogue of a crawl delta:
    run it between snapshot commits to publish "what changed in the
    schema this merge".

    Scale shape: ONE full-outer join on the key (null-safe column
    comparison via <=>; array/map/struct columns compare structurally in
    Spark) — no window, no Python. ``changed_cols`` is sorted so the
    output is deterministic."""
    compare = compare_cols or [
        c for c in new.columns if c not in key_cols and c in old.columns
    ]
    o = old.select(*key_cols, *compare).alias("o")
    n = new.select(*key_cols, *compare).alias("n")
    cond = None
    for kc in key_cols:
        c = F.col(f"o.{kc}").eqNullSafe(F.col(f"n.{kc}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")

    o_present = F.col(f"o.{key_cols[0]}").isNotNull()
    n_present = F.col(f"n.{key_cols[0]}").isNotNull()
    changed = F.array_sort(F.filter(
        F.array(*[
            F.when(~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c))
            for c in sorted(compare)
        ]),
        lambda x: x.isNotNull(),
    ))
    status = (
        F.when(~o_present, F.lit("added"))
        .when(~n_present, F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
    )
    out = j.select(
        status.alias("status"),
        *[F.coalesce(F.col(f"n.{kc}"), F.col(f"o.{kc}")).alias(kc)
          for kc in key_cols],
        F.when(o_present & n_present, changed)
         .otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )
    return out.filter(F.col("status").isNotNull())
