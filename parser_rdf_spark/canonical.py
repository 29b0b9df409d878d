"""RDF graph canonicalization: deterministic blank-node labels and an
isomorphism-invariant canonical hash per document graph.

The reference parser doc-scopes blank nodes (reference:
src/RdfParser.php:163-177 via the ``_:d<hash>-`` rewrite mirrored in
formats.py P5) but offers no way to recognize that two documents carry
the SAME graph under different blank-node names — the classic failure
of text-level dedup on RDF: serializers mint arbitrary ``_:b0/_:genid``
labels, so byte-identical semantics hash differently. This module adds
the canonicalization layer (in the spirit of W3C RDFC-1.0 / URDNA2015,
and of Weisfeiler-Leman color refinement) as pure DataFrame dataflow:

- :func:`bnode_colors` — iterative color refinement: every blank node
  starts with one shared color and each round re-hashes the sorted
  multiset of its incident edges (direction, predicate, neighbor color
  or ground term). Isomorphic graphs produce identical color multisets
  at every round because no step ever reads the original labels.
- :func:`canonical_graph_hash` — md5 over the sorted canonical triple
  encodings (blank nodes replaced by their final colors): one hash per
  ``doc_url`` that is invariant under blank-node renaming.
- :func:`canonicalize_bnodes` — rewrite labels to ``_:c0, _:c1, ...``
  ranked by final color, giving a canonical serialization input.
- :func:`isomorphic_duplicates` — group documents by canonical hash:
  graph-level dedup that text/minhash dedup cannot express.

Honest scope vs full RDFC-1.0: fixed-round WL-1 refinement
distinguishes everything except pathological automorphic structures
(e.g. unanchored symmetric cycles); RDFC-1.0 resolves those with
recursive N-degree hashing, which is inherently sequential per graph.
Ties here share a color — the canonical HASH is still
isomorphism-INVARIANT (isomorphic graphs always hash identically), but
for tied graphs it is not isomorphism-DISCRIMINATING: two
NON-isomorphic docs whose WL color multisets coincide (the classic
hexagon vs two-triangles pair) share a hash. Round 5 closes the gap in
two steps. First, soundness by construction:
:func:`canonical_graph_hash` flags any document with a color class
holding >1 blank node after refinement (``ambiguous`` column), so a
hash shared by two AMBIGUOUS docs is never trusted alone. Second,
COMPLETENESS on the ambiguous sliver: :func:`exact_canonical_hashes`
runs a true canonical labeling (individualization-refinement — the
standard exact graph-canonization scheme RDFC-1.0's recursive N-degree
hashing instantiates) per ambiguous document inside ``applyInPandas``:
WL-refine to a stable partition in pure Python, branch on every member
of the FIRST (lowest-color — an isomorphism-invariant target cell)
non-singleton class, recurse, and keep the lexicographically smallest
full serialization. Isomorphic docs now key identically even when the
automorphism orbit is entered through differently-ranked original
labels; non-isomorphic docs never do (the key is a full labeled
serialization, so equality implies graph identity). The search is
exponential only in the size of the largest unbroken symmetric
structure; a deterministic ``branch_cap`` bounds it, falling back to
the original-label tie-break serialization (sound, possibly
incomplete) with ``exact = false``. Label assignment in
:func:`canonicalize_bnodes` keeps the documented original-label
tie-break (cheap, column-only); ``rounds`` must reach the blank-node
diameter of the graph for full discrimination.

Scale shape: each round is two key-partitioned equi-joins on
``(doc_url, bnode)`` plus one groupBy — blank-node scope is per
document, so keys never cross documents and skew is bounded by the
largest single document, not the corpus. Rounds are a fixed small
constant (no driver-side convergence loop, no collect)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bnode_colors",
    "canonical_dedup_keys",
    "canonicalize_bnodes",
    "canonical_graph_hash",
    "exact_canonical_hashes",
    "isomorphic_duplicates",
]

# initial shared color: every bnode starts identical so round 1 encodes
# exactly the (direction, predicate, ground-context) signature
_SEED_COLOR = "x"


def _ground_obj() -> Column:
    """Engine-portable encoding of a non-bnode object term."""
    return F.when(
        F.col("obj_kind") == "iri", F.concat(F.lit("I:"), F.col("obj_value"))
    ).otherwise(
        F.concat(
            F.lit("L:"),
            F.col("obj_value"),
            F.lit("|"),
            F.coalesce(F.col("obj_lang"), F.lit("")),
            F.lit("|"),
            F.coalesce(F.col("obj_datatype"), F.lit("")),
        )
    )


def _graph_enc() -> Column:
    # default graph (null or the parser's _:default sentinel) encodes ""
    g = F.col("graph")
    return F.when(g.isNull() | (g == "_:default"), F.lit("")).otherwise(g)


def bnode_colors(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """Final refinement color per blank node: ``(doc_url, bnode, color)``.

    ``rounds`` fixed rounds of WL-1 refinement (no convergence loop —
    deterministic, oracle-reproducible, and bounded cost at scale). A
    round rehashes, per bnode, the SORTED list of items
    ``o|<pred>|<g>|<neighbor>`` (outgoing) and ``i|<pred>|<g>|<neighbor>``
    (incoming), where ``<neighbor>`` is the other end's previous color
    when it is a bnode, else its ground encoding (``I:``/``L:`` — the
    same strings :mod:`serialize` would emit modulo brackets)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if "graph" not in triples.columns:
        triples = triples.withColumn("graph", F.lit(None).cast("string"))
    t = triples.select(
        "doc_url",
        _graph_enc().alias("g"),
        "subj",
        "pred",
        "obj_kind",
        "obj_value",
        F.coalesce(F.col("obj_lang"), F.lit("")).alias("obj_lang"),
        F.coalesce(F.col("obj_datatype"), F.lit("")).alias("obj_datatype"),
        F.col("subj").startswith("_:").alias("s_bn"),
        (F.col("obj_kind") == "bnode").alias("o_bn"),
    ).where(F.col("s_bn") | F.col("o_bn"))
    # the bnode-incident subset is scanned twice per round — pin it, and
    # truncate each round's lineage below: round k's colors feed BOTH of
    # round k+1's joins, so an unmaterialized plan recomputes upstream
    # 2^rounds times (the connected-components localCheckpoint
    # discipline, linking.py)
    t = t.persist()

    colors = (
        t.where("s_bn").select("doc_url", F.col("subj").alias("b"))
        .unionByName(t.where("o_bn").select("doc_url", F.col("obj_value").alias("b")))
        .distinct()
        .withColumn("color", F.lit(_SEED_COLOR))
    )

    for _ in range(rounds):
        nb_obj = colors.select(
            F.col("doc_url").alias("n_doc"),
            F.col("b").alias("n_b"),
            F.col("color").alias("n_color"),
        )
        out_items = (
            t.where("s_bn")
            .join(
                nb_obj,
                (F.col("doc_url") == F.col("n_doc"))
                & (F.col("obj_value") == F.col("n_b"))
                & F.col("o_bn"),
                "left",
            )
            .select(
                "doc_url",
                F.col("subj").alias("b"),
                F.concat(
                    F.lit("o|"),
                    F.col("pred"),
                    F.lit("|"),
                    F.col("g"),
                    F.lit("|"),
                    F.when(F.col("o_bn"), F.col("n_color")).otherwise(
                        F.when(
                            F.col("obj_kind") == "iri",
                            F.concat(F.lit("I:"), F.col("obj_value")),
                        ).otherwise(
                            F.concat(
                                F.lit("L:"),
                                F.col("obj_value"),
                                F.lit("|"),
                                F.col("obj_lang"),
                                F.lit("|"),
                                F.col("obj_datatype"),
                            )
                        )
                    ),
                ).alias("item"),
            )
        )
        nb_subj = colors.select(
            F.col("doc_url").alias("n_doc"),
            F.col("b").alias("n_b"),
            F.col("color").alias("n_color"),
        )
        in_items = (
            t.where("o_bn")
            .join(
                nb_subj,
                (F.col("doc_url") == F.col("n_doc"))
                & (F.col("subj") == F.col("n_b"))
                & F.col("s_bn"),
                "left",
            )
            .select(
                "doc_url",
                F.col("obj_value").alias("b"),
                F.concat(
                    F.lit("i|"),
                    F.col("pred"),
                    F.lit("|"),
                    F.col("g"),
                    F.lit("|"),
                    F.when(F.col("s_bn"), F.col("n_color")).otherwise(
                        F.concat(F.lit("I:"), F.col("subj"))
                    ),
                ).alias("item"),
            )
        )
        colors = (
            out_items.unionByName(in_items)
            .groupBy("doc_url", "b")
            .agg(
                F.md5(
                    F.concat_ws("#", F.sort_array(F.collect_list("item")))
                ).alias("color")
            )
            .localCheckpoint()
        )
    t.unpersist()
    return colors.select("doc_url", F.col("b").alias("bnode"), "color")


def _with_colored_terms(triples: DataFrame, colors: DataFrame) -> DataFrame:
    """triples + ``subj_c`` / ``obj_c`` columns where bnode terms are
    replaced by their final color (ground terms pass through)."""
    if "graph" not in triples.columns:
        triples = triples.withColumn("graph", F.lit(None).cast("string"))
    sc = colors.select(
        F.col("doc_url").alias("s_doc"),
        F.col("bnode").alias("s_b"),
        F.col("color").alias("s_color"),
    )
    oc = colors.select(
        F.col("doc_url").alias("o_doc"),
        F.col("bnode").alias("o_b"),
        F.col("color").alias("o_color"),
    )
    return (
        triples.join(
            sc,
            (F.col("doc_url") == F.col("s_doc"))
            & (F.col("subj") == F.col("s_b"))
            & F.col("subj").startswith("_:"),
            "left",
        )
        .join(
            oc,
            (F.col("doc_url") == F.col("o_doc"))
            & (F.col("obj_value") == F.col("o_b"))
            & (F.col("obj_kind") == "bnode"),
            "left",
        )
        .withColumn(
            "subj_c",
            F.when(
                F.col("subj").startswith("_:"),
                F.concat(F.lit("B:"), F.col("s_color")),
            ).otherwise(F.concat(F.lit("I:"), F.col("subj"))),
        )
        .withColumn(
            "obj_c",
            F.when(
                F.col("obj_kind") == "bnode",
                F.concat(F.lit("B:"), F.col("o_color")),
            ).otherwise(_ground_obj()),
        )
        .drop("s_doc", "s_b", "o_doc", "o_b", "s_color", "o_color")
    )


def canonical_graph_hash(triples: DataFrame, rounds: int = 2,
                         colors: DataFrame | None = None) -> DataFrame:
    """One isomorphism-invariant hash per document:
    ``(doc_url, graph_hash, n_triples, ambiguous)``. The hash is md5
    over the sorted canonical triple encodings (bnodes → final color),
    so two documents whose graphs differ only in blank-node names hash
    identically, and ground-term differences always change it.

    ``ambiguous`` is true when ANY final color class still holds >1
    blank node — WL-1 could not fully discriminate (automorphic or
    adversarially symmetric structure), so equal hashes between two
    AMBIGUOUS docs do not alone prove isomorphism.
    :func:`isomorphic_duplicates` uses the flag to verify those groups
    by exact canonical-quads comparison; docs without blank nodes are
    never ambiguous (their encoding is ground and exact).

    ``colors`` short-circuits the refinement with a precomputed
    :func:`bnode_colors` relation (refine once, reuse everywhere — the
    canonical_dedup_keys discipline)."""
    if colors is None:
        colors = bnode_colors(triples, rounds)
    colored = _with_colored_terms(triples, colors)
    # a color class with >1 member = WL tie; one groupBy over the
    # (per-doc, checkpointed) color relation — bnode-count sized
    amb = (
        colors.groupBy("doc_url", "color")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_url")
        .agg(F.max(F.col("n") > 1).alias("ambiguous"))
    )
    enc = F.concat(
        F.col("subj_c"),
        F.lit(" "),
        F.col("pred"),
        F.lit(" "),
        F.col("obj_c"),
        F.lit(" "),
        _graph_enc(),
    )
    return (
        colored.select("doc_url", enc.alias("enc"))
        .groupBy("doc_url")
        .agg(
            F.md5(
                F.concat_ws("\n", F.sort_array(F.collect_list("enc")))
            ).alias("graph_hash"),
            F.count(F.lit(1)).alias("n_triples"),
        )
        .join(amb, "doc_url", "left")
        .withColumn("ambiguous", F.coalesce(F.col("ambiguous"), F.lit(False)))
    )


def canonicalize_bnodes(triples: DataFrame, rounds: int = 2,
                        colors: DataFrame | None = None,
                        exact: bool = False,
                        branch_cap: int = 4096) -> DataFrame:
    """Rewrite blank-node labels to canonical ``_:c<rank>`` (rank =
    row_number over (color, original label) per document — original
    label only as the tie-break within a shared color, see module
    docstring). Output schema = input schema; ground terms untouched.
    ``colors``: optional precomputed :func:`bnode_colors` relation.

    ``exact=True`` routes WL-AMBIGUOUS documents (any color class with
    >1 bnode) through :func:`exact_canonical_labels` instead of the
    label tie-break, so the relabeled output is a TRUE canonical form:
    isomorphic docs produce identical triple sets no matter how a
    re-crawl renamed labels around an automorphism orbit. Unambiguous
    docs keep the cheap column-only path; the exact search touches only
    the semi-join-pruned sliver."""
    if colors is None:
        colors = bnode_colors(triples, rounds)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_url").orderBy("color", "bnode")
    relabel = colors.select(
        "doc_url",
        "bnode",
        F.concat(F.lit("_:c"), (F.row_number().over(w) - 1)).alias("canon"),
    )
    if exact:
        amb_docs = (
            colors.groupBy("doc_url", "color")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .select("doc_url")
            .distinct()
        )
        exact_rel = exact_canonical_labels(
            triples.join(amb_docs, "doc_url", "left_semi"), branch_cap
        ).select(
            "doc_url",
            "bnode",
            F.concat(F.lit("_:c"), F.col("canon_rank")).alias("canon"),
        )
        relabel = relabel.join(amb_docs, "doc_url", "left_anti") \
            .unionByName(exact_rel)
    cols = triples.columns
    s_m = relabel.select(
        F.col("doc_url").alias("s_doc"),
        F.col("bnode").alias("s_b"),
        F.col("canon").alias("s_canon"),
    )
    o_m = relabel.select(
        F.col("doc_url").alias("o_doc"),
        F.col("bnode").alias("o_b"),
        F.col("canon").alias("o_canon"),
    )
    return (
        triples.join(
            s_m,
            (F.col("doc_url") == F.col("s_doc")) & (F.col("subj") == F.col("s_b")),
            "left",
        )
        .join(
            o_m,
            (F.col("doc_url") == F.col("o_doc"))
            & (F.col("obj_value") == F.col("o_b"))
            & (F.col("obj_kind") == "bnode"),
            "left",
        )
        .withColumn("subj", F.coalesce(F.col("s_canon"), F.col("subj")))
        .withColumn(
            "obj_value", F.coalesce(F.col("o_canon"), F.col("obj_value"))
        )
        .select(*cols)
    )


def isomorphic_duplicates(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """Graph-level duplicate groups: documents whose graphs are
    identical modulo blank-node renaming. Returns one row per group
    with >1 member: ``(graph_hash, n_docs, doc_urls)`` (members
    sorted). This is the dedup text/shingle methods cannot do: a
    Turtle and an RDF/XML rendering of the same graph with different
    ``_:genid`` labels land in one group.

    Sound AND complete under WL ties (round 5): unambiguous docs group
    by WL hash alone (refinement separated every bnode, so the hash is
    an exact canonical form). AMBIGUOUS docs — any color class with >1
    bnode — additionally group by the md5 of their EXACT canonical text
    (:func:`exact_canonical_hashes`, individualization-refinement), so
    a WL-hash collision between NON-isomorphic symmetric structures
    (hexagon vs two triangles) never merges, and an automorphic TRUE
    duplicate always groups no matter how the re-crawl renamed its
    labels around the orbit. The only residual miss is a graph whose
    unbroken symmetric structure exceeds the deterministic branch cap —
    then the key degrades to the sound original-label tie-break.

    Scale shape: the second check runs only on the ambiguous subset
    (semi-join pruned), which in web corpora is a sliver — label-
    anchored graphs almost always refine fully in 2 rounds."""
    keys = canonical_dedup_keys(triples, rounds)
    return (
        keys.groupBy("dedup_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_url")).alias("doc_urls"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            F.element_at(F.split("dedup_key", ":"), 1).alias("graph_hash"),
            "n_docs", "doc_urls",
        )
    )


def _canon_label_doc(quads, bnodes, branch_cap):
    """Exact canonical serialization of ONE document graph (pure
    Python, runs inside the Arrow batch of :func:`exact_canonical_hashes`).

    ``quads``: list of ``(g, s, p, o)`` where ``s``/``o`` are either
    ``("b", label)`` or ``("g", ground_encoding)``. Returns
    ``(canonical_text, labels, exact)`` where ``labels`` maps each
    blank-node label to its canonical rank — individualization-
    refinement keeps the lexicographically smallest full serialization
    over all branch leaves (and the labeling that produced it); if the
    leaf count would exceed ``branch_cap`` the search aborts and the
    original-label tie-break serialization/labeling is returned with
    ``exact=False`` (sound: any full labeled serialization equality
    still implies graph identity; only completeness is lost)."""
    # adjacency: per bnode, the invariant part of each incident edge
    # plus the other end (bnode label to be colored, or ground enc)
    adj = {b: [] for b in bnodes}
    for g, s, p, o in quads:
        if s[0] == "b":
            other = (0, o[1]) if o[0] == "b" else (1, o[1])
            adj[s[1]].append(("o", p, g, other))
        if o[0] == "b":
            other = (0, s[1]) if s[0] == "b" else (1, s[1])
            adj[o[1]].append(("i", p, g, other))

    def refine(colors):
        # iterate (old_color, sorted items) → rank until the partition
        # is stable; ranks derive from sorted signature content only,
        # so the partition is isomorphism-invariant
        while True:
            sigs = {}
            for b in bnodes:
                items = []
                for d, p, g, (kind, key) in adj[b]:
                    items.append(
                        (d, p, g, kind, colors[key] if kind == 0 else key)
                    )
                items.sort()
                sigs[b] = (colors[b], tuple(items))
            rank = {v: i for i, v in enumerate(sorted(set(sigs.values())))}
            new = {b: rank[sigs[b]] for b in bnodes}
            if new == colors:
                return colors
            colors = new

    def serialize(labels):
        lines = []
        for g, s, p, o in quads:
            se = "_:c%d" % labels[s[1]] if s[0] == "b" else s[1]
            oe = "_:c%d" % labels[o[1]] if o[0] == "b" else o[1]
            lines.append("%s %s %s %s" % (se, p, oe, g))
        lines.sort()
        return "\n".join(lines)

    state = {"leaves": 0, "best": None, "best_labels": None, "exact": True}

    def search(colors):
        if not state["exact"]:
            return
        colors = refine(colors)
        classes = {}
        for b in bnodes:
            classes.setdefault(colors[b], []).append(b)
        tied = [c for c, ms in classes.items() if len(ms) > 1]
        if not tied:
            state["leaves"] += 1
            if state["leaves"] > branch_cap:
                state["exact"] = False
                return
            # discrete partition: colors are already ranks 0..n-1
            text = serialize(colors)
            if state["best"] is None or text < state["best"]:
                state["best"], state["best_labels"] = text, colors
            return
        # invariant target cell: the lowest tied color class
        for b in sorted(classes[min(tied)]):
            # individualize b below its classmates, keep global order
            search({c: colors[c] * 2 + (0 if c == b else 1)
                    for c in bnodes})

    seed = {b: 0 for b in bnodes}
    try:
        search(seed)
    except RecursionError:
        # one individualization level per recursion frame: a graph with
        # thousands of tied bnodes exhausts the stack before the leaf
        # cap bites — same remedy, sound fallback
        state["exact"] = False
    if state["exact"] and state["best"] is not None:
        return state["best"], state["best_labels"], True
    # fallback: sound deterministic labeling by (color, original label)
    colors = refine(seed)
    order = sorted(bnodes, key=lambda b: (colors[b], b))
    labels = {b: i for i, b in enumerate(order)}
    return serialize(labels), labels, False


def exact_canonical_hashes(triples: DataFrame,
                           branch_cap: int = 4096) -> DataFrame:
    """Exact (isomorphism-DISCRIMINATING) canonical text hash per
    document: ``(doc_url, text_hash, exact)``. Two documents get equal
    hashes with ``exact=true`` iff their graphs are isomorphic —
    individualization-refinement canonical labeling, run per document.

    Spark shape: ``applyInPandas`` grouped by ``doc_url`` — intended
    for the WL-AMBIGUOUS sliver only (callers semi-join first, see
    :func:`canonical_dedup_keys`), where per-doc sequential search is
    the honest cost of exactness (RDFC-1.0's N-degree hashing is the
    same shape). Skew is bounded by the largest single document; the
    Arrow boundary ships only the sliver. ``branch_cap`` bounds the
    search deterministically (stable across batches and replays); a
    capped doc falls back to the WL + original-label serialization with
    ``exact=false`` — never a false merge, possibly a missed duplicate
    (the pre-round-5 behavior, now confined to adversarial graphs whose
    unbroken symmetric structure exceeds the cap)."""
    import hashlib

    import pandas as pd

    def one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        quads, bnodes = _doc_quads(pdf)
        text, _, exact = _canon_label_doc(quads, bnodes, branch_cap)
        return pd.DataFrame(
            {
                "doc_url": [pdf["doc_url"].iloc[0]],
                "text_hash": [hashlib.md5(text.encode("utf-8")).hexdigest()],
                "exact": [exact],
            }
        )

    return _amb_slim(triples).groupBy("doc_url").applyInPandas(
        one_doc, "doc_url string, text_hash string, exact boolean"
    )


def exact_canonical_labels(triples: DataFrame,
                           branch_cap: int = 4096) -> DataFrame:
    """Exact canonical blank-node ranks per document:
    ``(doc_url, bnode, canon_rank, exact)`` — the labeling behind
    :func:`exact_canonical_hashes` (same individualization-refinement
    search, same ``applyInPandas``-per-doc shape, same deterministic
    ``branch_cap`` fallback). Feed it to
    :func:`to_canonical_nquads(exact=True) <to_canonical_nquads>` for a
    serialization where ISOMORPHIC docs always emit identical line sets
    even under WL automorphism ties."""
    import pandas as pd

    def one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        quads, bnodes = _doc_quads(pdf)
        _, labels, exact = _canon_label_doc(quads, bnodes, branch_cap)
        return pd.DataFrame(
            {
                "doc_url": pdf["doc_url"].iloc[0],
                "bnode": bnodes,
                "canon_rank": [labels[b] for b in bnodes],
                "exact": exact,
            }
        )

    return _amb_slim(triples).groupBy("doc_url").applyInPandas(
        one_doc,
        "doc_url string, bnode string, canon_rank bigint, exact boolean",
    )


def _amb_slim(triples: DataFrame) -> DataFrame:
    """The per-doc quad projection both exact-canonical ops group on."""
    if "graph" not in triples.columns:
        triples = triples.withColumn("graph", F.lit(None).cast("string"))
    return triples.select(
        "doc_url",
        _graph_enc().alias("g"),
        "subj",
        "pred",
        F.col("obj_kind"),
        F.col("obj_value"),
        _ground_obj().alias("o_ground"),
    )


def _doc_quads(pdf):
    """One Arrow batch group → ``(quads, sorted bnode labels)`` in the
    ``_canon_label_doc`` input shape."""
    quads, bnodes = [], set()
    for g, s, p, ok, ov, og in zip(
        pdf["g"], pdf["subj"], pdf["pred"], pdf["obj_kind"],
        pdf["obj_value"], pdf["o_ground"],
    ):
        st = ("b", s) if s.startswith("_:") else ("g", "I:" + s)
        ot = ("b", ov) if ok == "bnode" else ("g", og)
        if st[0] == "b":
            bnodes.add(s)
        if ot[0] == "b":
            bnodes.add(ov)
        quads.append((g, st, p, ot))
    return quads, sorted(bnodes)


def canonical_dedup_keys(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """The SOUND per-document graph-identity key shared by
    :func:`isomorphic_duplicates` and the streaming dedup registry
    (:func:`~.streaming.canonical_dedup_maintenance`):
    ``(doc_url, dedup_key, ambiguous)`` where ``dedup_key`` is the WL
    ``graph_hash`` for fully-refined docs and
    ``graph_hash:md5(exact canonical text)`` for ambiguous ones — the
    :func:`exact_canonical_hashes` individualization-refinement
    labeling (md5 is hex, so ``:`` cannot collide). Two docs share a
    key iff the batch dedup would group them — so a registry keyed on
    it never merges a WL-colliding non-isomorphic pair, in streaming
    either; and since the exact labeling is canonical, two ISOMORPHIC
    ambiguous docs always share a key regardless of how their original
    labels enter the automorphism orbits (complete, up to the
    documented branch cap). Deterministic per document content, hence
    stable across micro-batches.

    Cost discipline: the WL refinement runs ONCE (colors shared by the
    hash and the ambiguity flag); the per-doc hash relation is
    localCheckpointed so the consumers below never re-execute its
    lineage; and when NO document is ambiguous — the overwhelmingly
    common corpus — the exact branch is skipped entirely (driver-side
    emptiness check on the doc-count-sized relation), so the sound path
    costs the same as plain WL hashing."""
    colors = bnode_colors(triples, rounds)
    h = canonical_graph_hash(triples, rounds, colors=colors) \
        .localCheckpoint(eager=True)
    un = h.where(~F.col("ambiguous")).select(
        "doc_url", F.col("graph_hash").alias("dedup_key"), "ambiguous")
    amb = h.where(F.col("ambiguous"))
    if amb.isEmpty():
        return un
    amb_triples = triples.join(
        amb.select("doc_url"), "doc_url", "left_semi")
    text_hash = exact_canonical_hashes(amb_triples)
    keyed_amb = amb.join(text_hash, "doc_url").select(
        "doc_url",
        F.concat_ws(":", "graph_hash", "text_hash").alias("dedup_key"),
        "ambiguous",
    )
    return un.unionByName(keyed_amb)


def to_canonical_nquads(triples: DataFrame, rounds: int = 2,
                        colors: DataFrame | None = None,
                        exact: bool = False) -> DataFrame:
    """Canonical N-Quads: relabel blank nodes to their canonical
    ``_:c<rank>`` (:func:`canonicalize_bnodes`) and render N-Quads
    lines — the W3C RDFC-1.0 deliverable shape: two isomorphic
    documents serialize to the IDENTICAL line set, so a plain text-hash
    downstream (or the exact-dedup operator) recognizes them. Returns
    ``(doc_url, line)``; map-only on top of the relabel joins.
    ``colors``: optional precomputed :func:`bnode_colors` relation.
    ``exact=True`` makes the guarantee unconditional under WL
    automorphism ties (the RDFC-1.0 parity mode): ambiguous docs are
    relabeled by the individualization-refinement search instead of the
    original-label tie-break — see :func:`canonicalize_bnodes`."""
    from .serialize import to_nquads

    return to_nquads(
        canonicalize_bnodes(triples, rounds, colors=colors, exact=exact))
