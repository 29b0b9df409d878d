"""RDFS entailment materialization: schema closure + instance inference
as DataFrame joins.

The reference extracts ontology structure (classes, properties,
subClassOf chains — reference src/Extractors/ClassExtractor.php:90,
PropertyExtractor.php:101) but never APPLIES it; at KG-construction
scale the standard next step is materializing the RDFS consequences so
downstream queries don't re-derive them per query. This module
implements the core RDFS rule set over the generic (subj, pred, obj)
relation:

  rdfs5   subPropertyOf transitivity          (schema × schema)
  rdfs7   x p1 y, p1 subPropertyOf p2 ⇒ x p2 y  (instance × schema)
  rdfs11  subClassOf transitivity             (schema × schema)
  rdfs9   x type C, C subClassOf D ⇒ x type D (instance × schema)
  rdfs2   x p y, p domain C ⇒ x type C        (instance × schema)
  rdfs3   x p y, p range C ⇒ y type C         (instance × schema)

Scale shape: the SCHEMA relations (subClassOf / subPropertyOf / domain /
range) are ontology-sized — thousands of rows against 10^12 instance
rows — so every instance-side rule is one broadcast hash join of the
closed schema onto the instance scan, no instance-side shuffle at all.
Only the schema closure iterates, via path-doubling self-joins
(O(log diameter) rounds) with per-round localCheckpoint — the same
pattern as connected components, on the tiny side of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"


def transitive_closure(
    pairs: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Transitive closure of an ontology-sized relation by path doubling:
    each round unions paths of length ≤2^k (closure ⋈ closure), so a
    chain of diameter d closes in ⌈log2 d⌉ rounds. Reflexive pairs are
    not added; cycles are safe (closure saturates). Intended for SCHEMA
    relations — the closure is materialized and broadcast onto instance
    data, never computed over instances."""
    cur = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = cur.count()
    for _ in range(max_iters):
        hop = (
            cur.alias("a")
            .join(cur.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        nxt = (
            cur.unionByName(hop)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n2 = nxt.count()
        cur = nxt
        if n2 == n:
            break
        n = n2
    return cur


def _schema(triples: DataFrame, pred: str) -> DataFrame:
    # distinct: corpus-level relations union per-document graphs, and a
    # domain/range axiom asserted by N docs would otherwise inflate every
    # broadcast-join output N× (set semantics, same discipline as shacl)
    return triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).distinct()


OWL_EQUIV_CLASS = "http://www.w3.org/2002/07/owl#equivalentClass"
OWL_EQUIV_PROP = "http://www.w3.org/2002/07/owl#equivalentProperty"

_DEFAULT_VOCAB = {
    "type": RDF_TYPE,
    "subclass": RDFS_SUBCLASS,
    "subprop": RDFS_SUBPROP,
    "domain": RDFS_DOMAIN,
    "range": RDFS_RANGE,
    "equiv_class": OWL_EQUIV_CLASS,
    "equiv_prop": OWL_EQUIV_PROP,
}


def _sym_pairs(edges: DataFrame) -> DataFrame:
    """Both directions of a (src, dst) relation — owl equivalence
    axioms entail the sub-edge each way."""
    return edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def rdfs_entailment(
    triples: DataFrame,
    include_schema_closure: bool = True,
    vocab: dict[str, str] | None = None,
) -> DataFrame:
    """Materialize the RDFS consequences of ``triples`` (generic
    (subj, pred, obj) relation). Returns ONLY the newly inferred
    triples — rows already asserted are subtracted — so callers can
    audit, merge (:func:`.incremental.merge_triples` semantics don't
    apply — inference is additive, use a plain union+distinct), or
    count inferences per rule family.

    One pass, not a fixpoint over instances: the schema relations are
    closed first (so chained subClassOf/subPropertyOf resolve fully),
    then rdfs7 runs before rdfs2/3/9 and the freshly-derived property
    assertions feed the domain/range/type rules — which makes the
    single pass complete for the rule set above (derived triples are
    all ``rdf:type`` assertions, and no rule here consumes a type
    assertion it didn't already see: type-chaining through subClassOf
    is closed because the CLASS closure, not iteration, supplies the
    transitive step).

    ``vocab`` overrides the rule predicates (keys: type, subclass,
    subprop, domain, range, equiv_class, equiv_prop) for graphs using
    compact or non-RDFS vocabularies; defaults are the full
    RDF/RDFS/OWL IRIs. owl:equivalentClass / owl:equivalentProperty
    assertions contribute their mutual sub-edges to the closures, so
    typing and property inheritance flow through equivalences.
    """
    v = {**_DEFAULT_VOCAB, **(vocab or {})}
    RDF_TYPE, RDFS_SUBCLASS, RDFS_SUBPROP = v["type"], v["subclass"], v["subprop"]
    # owl:equivalentClass/Property entail the sub-edge in BOTH
    # directions; feeding them into the closure makes rdfs9/rdfs7
    # inherit through equivalences (and emits the mutual
    # subClassOf/subPropertyOf rows with the schema closure)
    subclass = transitive_closure(
        _schema(triples, RDFS_SUBCLASS)
        .unionByName(_sym_pairs(_schema(triples, v["equiv_class"])))
    )
    subprop = transitive_closure(
        _schema(triples, RDFS_SUBPROP)
        .unionByName(_sym_pairs(_schema(triples, v["equiv_prop"])))
    )
    domain = _schema(triples, v["domain"])
    rng = _schema(triples, v["range"])

    inst = triples.select("subj", "pred", "obj")

    # rdfs7: property inheritance (broadcast the closed subproperty map)
    inherited = (
        inst.join(F.broadcast(subprop), inst.pred == subprop.src)
        .select("subj", F.col("dst").alias("pred"), "obj")
    )
    # every non-type assertion, including inherited ones, feeds domain/range
    assertions = inst.filter(F.col("pred") != RDF_TYPE).unionByName(inherited)

    # rdfs2/rdfs3: domain/range typing
    dom_types = (
        assertions.join(F.broadcast(domain), assertions.pred == domain.src)
        .select("subj", F.lit(RDF_TYPE).alias("pred"), F.col("dst").alias("obj"))
    )
    rng_types = (
        assertions.join(F.broadcast(rng), assertions.pred == rng.src)
        .select(F.col("obj").alias("subj"), F.lit(RDF_TYPE).alias("pred"),
                F.col("dst").alias("obj"))
    )

    # rdfs9: type inheritance through the CLOSED subclass relation, fed
    # by asserted types AND the domain/range-derived ones
    types = (
        inst.filter(F.col("pred") == RDF_TYPE)
        .unionByName(dom_types)
        .unionByName(rng_types)
    )
    super_types = (
        types.join(F.broadcast(subclass), types.obj == subclass.src)
        .select("subj", F.lit(RDF_TYPE).alias("pred"), F.col("dst").alias("obj"))
    )

    inferred = inherited.unionByName(dom_types).unionByName(rng_types).unionByName(super_types)
    if include_schema_closure:
        inferred = inferred.unionByName(
            subclass.select("src", F.lit(RDFS_SUBCLASS).alias("pred"), "dst")
            .toDF("subj", "pred", "obj")
        ).unionByName(
            subprop.select("src", F.lit(RDFS_SUBPROP).alias("pred"), "dst")
            .toDF("subj", "pred", "obj")
        )
    return inferred.distinct().join(inst, ["subj", "pred", "obj"], "left_anti")


def rdfs_entailment_delta(
    old: DataFrame,
    delta: DataFrame,
    prev_inferred: DataFrame | None = None,
    include_schema_closure: bool = True,
    vocab: dict[str, str] | None = None,
) -> DataFrame:
    """Delta-driven RDFS maintenance (round 5): the rows to ADD to a
    previous :func:`rdfs_entailment` materialization when an
    APPEND-ONLY ``delta`` batch joins ``old`` — semi-naive evaluation,
    never a from-scratch recompute over the merged corpus.

    Law (pinned in pytest and the ``incremental_entailment`` contract
    query): ``prev_inferred ∪ result`` equals
    ``rdfs_entailment(old ∪ delta)`` as a set, where ``prev_inferred =
    rdfs_entailment(old)`` (passed in from the previous run; computed
    here when None, for convenience only).

    Append-only means no row of ``old`` was retracted by the merge; a
    replace-by-document merge that DROPS schema or instance rows can
    invalidate previous consequences, and incremental deletion (DRed)
    is out of scope — re-materialize from scratch after a retracting
    merge.

    Scale shape — work proportional to the delta, not the corpus:

    * schema closures are ontology-sized; both the old and the merged
      closure are recomputed (trivial) and their ROW DELTA drives the
      old-corpus side;
    * every delta-instance rule application joins the DELTA against a
      broadcast of the MERGED closure (delta-sized);
    * the only old-corpus scans are broadcast joins against the schema
      closure DELTA, and each is SKIPPED outright (driver-side
      ontology-sized emptiness check, same discipline as the IVF
      centroid collect) when that schema relation didn't change — the
      common instance-only crawl batch touches ``old`` zero times;
    * previously-derived assertions/types are read from
      ``prev_inferred`` (inherited rows are its non-type subset, typing
      rows its type subset), never re-derived.
    """
    v = {**_DEFAULT_VOCAB, **(vocab or {})}
    RT, SC, SP = v["type"], v["subclass"], v["subprop"]
    if prev_inferred is None:
        prev_inferred = rdfs_entailment(
            old, include_schema_closure=include_schema_closure, vocab=vocab)

    merged = old.select("subj", "pred", "obj").unionByName(
        delta.select("subj", "pred", "obj"))

    def closures(t):
        sub_c = transitive_closure(
            _schema(t, SC).unionByName(_sym_pairs(_schema(t, v["equiv_class"]))))
        sub_p = transitive_closure(
            _schema(t, SP).unionByName(_sym_pairs(_schema(t, v["equiv_prop"]))))
        return sub_c, sub_p

    subclass_old, subprop_old = closures(old)
    subclass_new, subprop_new = closures(merged)
    subclass_d = subclass_new.join(subclass_old, ["src", "dst"], "left_anti") \
        .persist()
    subprop_d = subprop_new.join(subprop_old, ["src", "dst"], "left_anti") \
        .persist()
    domain_new, rng_new = _schema(merged, v["domain"]), _schema(merged, v["range"])
    domain_d = domain_new.join(_schema(old, v["domain"]), ["src", "dst"],
                               "left_anti").persist()
    rng_d = rng_new.join(_schema(old, v["range"]), ["src", "dst"],
                         "left_anti").persist()

    delta_inst = delta.select("subj", "pred", "obj")
    old_inst = old.select("subj", "pred", "obj")

    # rdfs7: delta instances × merged closure, plus (only when the
    # subproperty closure actually changed) old instances × closure delta
    inherited = delta_inst.join(
        F.broadcast(subprop_new), delta_inst.pred == subprop_new.src
    ).select("subj", F.col("dst").alias("pred"), "obj")
    if not subprop_d.isEmpty():
        inherited = inherited.unionByName(
            old_inst.join(F.broadcast(subprop_d),
                          old_inst.pred == subprop_d.src)
            .select("subj", F.col("dst").alias("pred"), "obj"))

    # assertion deltas feed rdfs2/3; previously-standing assertions are
    # the old non-type instances plus prev_inferred's inherited rows
    assertions_d = delta_inst.filter(F.col("pred") != RT).unionByName(inherited)
    dom_types = assertions_d.join(
        F.broadcast(domain_new), assertions_d.pred == domain_new.src
    ).select("subj", F.lit(RT).alias("pred"), F.col("dst").alias("obj"))
    rng_types = assertions_d.join(
        F.broadcast(rng_new), assertions_d.pred == rng_new.src
    ).select(F.col("obj").alias("subj"), F.lit(RT).alias("pred"),
             F.col("dst").alias("obj"))
    if not domain_d.isEmpty() or not rng_d.isEmpty():
        assertions_prev = old_inst.filter(F.col("pred") != RT).unionByName(
            prev_inferred.filter(F.col("pred") != RT))
        if not domain_d.isEmpty():
            dom_types = dom_types.unionByName(
                assertions_prev.join(F.broadcast(domain_d),
                                     assertions_prev.pred == domain_d.src)
                .select("subj", F.lit(RT).alias("pred"),
                        F.col("dst").alias("obj")))
        if not rng_d.isEmpty():
            rng_types = rng_types.unionByName(
                assertions_prev.join(F.broadcast(rng_d),
                                     assertions_prev.pred == rng_d.src)
                .select(F.col("obj").alias("subj"), F.lit(RT).alias("pred"),
                        F.col("dst").alias("obj")))

    # rdfs9: type deltas × merged closure, plus previously-standing
    # types × closure delta (prev types ⊇ dom/rng-derived: extra rows
    # re-derived through the transitive closure are already in
    # prev_inferred and vanish in the final anti-join)
    types_d = delta_inst.filter(F.col("pred") == RT) \
        .unionByName(dom_types).unionByName(rng_types)
    super_types = types_d.join(
        F.broadcast(subclass_new), types_d.obj == subclass_new.src
    ).select("subj", F.lit(RT).alias("pred"), F.col("dst").alias("obj"))
    if not subclass_d.isEmpty():
        types_prev = old_inst.filter(F.col("pred") == RT).unionByName(
            prev_inferred.filter(F.col("pred") == RT))
        super_types = super_types.unionByName(
            types_prev.join(F.broadcast(subclass_d),
                            types_prev.obj == subclass_d.src)
            .select("subj", F.lit(RT).alias("pred"),
                    F.col("dst").alias("obj")))

    added = inherited.unionByName(dom_types).unionByName(rng_types) \
        .unionByName(super_types)
    if include_schema_closure:
        added = added.unionByName(
            subclass_d.select("src", F.lit(SC).alias("pred"), "dst")
            .toDF("subj", "pred", "obj")
        ).unionByName(
            subprop_d.select("src", F.lit(SP).alias("pred"), "dst")
            .toDF("subj", "pred", "obj"))
    return (
        added.distinct()
        .join(merged, ["subj", "pred", "obj"], "left_anti")
        .join(prev_inferred.select("subj", "pred", "obj"),
              ["subj", "pred", "obj"], "left_anti")
    )


OWL_INVERSE = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"

_OWL_VOCAB = {
    "type": RDF_TYPE,
    "inverse": OWL_INVERSE,
    "symmetric": OWL_SYMMETRIC,
    "transitive": OWL_TRANSITIVE,
}


def owl_property_entailment(
    triples: DataFrame,
    vocab: dict[str, str] | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Materialize the OWL property-axiom consequences of ``triples``:

      inverseOf   p owl:inverseOf q, x p y ⇒ y q x  (both directions)
      symmetric   p a owl:SymmetricProperty, x p y ⇒ y p x
      transitive  p a owl:TransitiveProperty ⇒ closure of p's edges

    Returns inferred-only triples (asserted subtracted), same contract
    as :func:`rdfs_entailment`; ``vocab`` overrides the axiom
    predicates (keys: type, inverse, symmetric, transitive).

    Scale shape: axiom relations are ontology-sized (broadcast);
    inverse/symmetric are one broadcast join each — a pure map over the
    instance scan. TRANSITIVE closure runs per declared-transitive
    predicate over that predicate's instance edges via the same
    path-doubling loop as the schema closure — at 10^12 scale a
    transitive predicate's edge set is the one genuinely iterative
    instance workload here, and the doubling keeps it to O(log
    diameter) shuffle rounds (each round one self-join + distinct).
    Inverse/symmetric consequences feed the transitive closure (the one
    cross-rule dependency that matters: p symmetric + transitive must
    close over BOTH edge directions). Reflexive consequences of cycles
    (x p ... p x ⇒ x p x) are deliberately not emitted, matching
    :func:`transitive_closure`.
    """
    v = {**_OWL_VOCAB, **(vocab or {})}
    inst = triples.select("subj", "pred", "obj")

    inv = _schema(triples, v["inverse"])
    # inverseOf is symmetric in its arguments: close both directions
    inv_both = inv.unionByName(
        inv.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    inv_inferred = (
        inst.join(F.broadcast(inv_both), inst.pred == inv_both.src)
        .select(F.col("obj").alias("subj"), F.col("dst").alias("pred"),
                F.col("subj").alias("obj"))
    )

    sym_preds = (
        triples.filter((F.col("pred") == v["type"]) & (F.col("obj") == v["symmetric"]))
        .select(F.col("subj").alias("p"))
        .distinct()
    )
    sym_inferred = (
        inst.join(F.broadcast(sym_preds), inst.pred == sym_preds.p)
        .select(F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj"))
    )

    # transitive: close each declared predicate over asserted + the
    # inverse/symmetric-derived edges of that predicate
    trans_preds = (
        triples.filter((F.col("pred") == v["type"]) & (F.col("obj") == v["transitive"]))
        .select(F.col("subj").alias("p"))
        .distinct()
    )
    base = (
        inst.unionByName(inv_inferred)
        .unionByName(sym_inferred)
        .join(F.broadcast(trans_preds), F.col("pred") == F.col("p"))
        .select("subj", "pred", "obj")
        .distinct()
    )
    cur = _pred_closure(base, max_iters)

    inferred = inv_inferred.unionByName(sym_inferred).unionByName(cur)
    return inferred.distinct().join(inst, ["subj", "pred", "obj"], "left_anti")


def _pred_closure(base: DataFrame, max_iters: int) -> DataFrame:
    """Per-predicate transitive closure of a (subj, pred, obj) edge
    relation — one path-doubling loop with pred in the join key, each
    round localCheckpointed (shared by :func:`owl_property_entailment`
    and its delta form so the two can never drift)."""
    cur = base.localCheckpoint(eager=True)
    n = cur.count()
    for _ in range(max_iters):
        hop = (
            cur.alias("a")
            .join(
                cur.alias("b"),
                (F.col("a.obj") == F.col("b.subj")) & (F.col("a.pred") == F.col("b.pred")),
            )
            .select(F.col("a.subj").alias("subj"), F.col("a.pred").alias("pred"),
                    F.col("b.obj").alias("obj"))
        )
        nxt = (
            cur.unionByName(hop)
            .filter(F.col("subj") != F.col("obj"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n2 = nxt.count()
        cur = nxt
        if n2 == n:
            break
        n = n2
    return cur


def owl_property_entailment_delta(
    old: DataFrame,
    delta: DataFrame,
    prev_inferred: DataFrame | None = None,
    vocab: dict[str, str] | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Delta-driven OWL property-axiom maintenance (round 5), the OWL
    twin of :func:`rdfs_entailment_delta`: the rows an APPEND-ONLY
    ``delta`` batch adds to a previous :func:`owl_property_entailment`
    materialization. Same law (``prev ∪ result == full(old ∪ delta)``
    as sets, pinned in pytest and the ``incremental_owl_entailment``
    contract query) and the same append-only caveat (retraction ⇒
    re-materialize).

    Scale shape:

    * inverse/symmetric: delta instances × broadcast MERGED axiom maps;
      the old corpus is scanned only against the AXIOM DELTA (skipped
      when no inverse/symmetric axiom changed);
    * transitive: the closure re-runs ONLY for TOUCHED predicates —
      those newly declared transitive, or receiving any new base edge
      (delta-asserted or newly derived inverse/symmetric). The re-run
      reads just those predicates' edge sets (pushed ``isin`` over the
      ontology-sized collected touched list); an untouched transitive
      predicate's closure is already in ``prev_inferred`` and its base
      cannot have changed, so it contributes nothing.
    """
    v = {**_OWL_VOCAB, **(vocab or {})}
    if prev_inferred is None:
        prev_inferred = owl_property_entailment(old, vocab=vocab,
                                                max_iters=max_iters)
    old_inst = old.select("subj", "pred", "obj")
    delta_inst = delta.select("subj", "pred", "obj")
    merged = old_inst.unionByName(delta_inst)

    def inv_both(t):
        inv = _schema(t, v["inverse"])
        return inv.unionByName(
            inv.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

    def decl_preds(t, cls):
        return (
            t.filter((F.col("pred") == v["type"]) & (F.col("obj") == cls))
            .select(F.col("subj").alias("p")).distinct()
        )

    inv_new = inv_both(merged)
    inv_d = inv_new.join(inv_both(old), ["src", "dst"], "left_anti").persist()
    sym_new = decl_preds(merged, v["symmetric"])
    sym_d = sym_new.join(decl_preds(old, v["symmetric"]), ["p"],
                         "left_anti").persist()
    trans_new = decl_preds(merged, v["transitive"])
    trans_d = trans_new.join(decl_preds(old, v["transitive"]), ["p"],
                             "left_anti")

    inv_rows = delta_inst.join(
        F.broadcast(inv_new), delta_inst.pred == inv_new.src
    ).select(F.col("obj").alias("subj"), F.col("dst").alias("pred"),
             F.col("subj").alias("obj"))
    if not inv_d.isEmpty():
        inv_rows = inv_rows.unionByName(
            old_inst.join(F.broadcast(inv_d), old_inst.pred == inv_d.src)
            .select(F.col("obj").alias("subj"), F.col("dst").alias("pred"),
                    F.col("subj").alias("obj")))
    sym_rows = delta_inst.join(
        F.broadcast(sym_new), delta_inst.pred == sym_new.p
    ).select(F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj"))
    if not sym_d.isEmpty():
        sym_rows = sym_rows.unionByName(
            old_inst.join(F.broadcast(sym_d), old_inst.pred == sym_d.p)
            .select(F.col("obj").alias("subj"), "pred",
                    F.col("subj").alias("obj")))

    # touched transitive predicates: newly declared, or gaining any new
    # base edge; the list is ontology-sized (driver collect, the IVF-
    # centroid discipline) and becomes a pushed isin filter
    new_edges = delta_inst.unionByName(inv_rows).unionByName(sym_rows)
    touched = (
        new_edges.join(F.broadcast(trans_new), new_edges.pred == trans_new.p)
        .select("p")
        .unionByName(trans_d.select("p"))
        .distinct()
    )
    touched_list = [r.p for r in touched.collect()]
    added = inv_rows.unionByName(sym_rows)
    if touched_list:
        inv_touch = inv_new.filter(F.col("dst").isin(touched_list))
        sym_touch = sym_new.filter(F.col("p").isin(touched_list))
        base = (
            merged.filter(F.col("pred").isin(touched_list))
            .unionByName(
                merged.join(F.broadcast(inv_touch),
                            merged.pred == inv_touch.src)
                .select(F.col("obj").alias("subj"),
                        F.col("dst").alias("pred"),
                        F.col("subj").alias("obj")))
            .unionByName(
                merged.join(F.broadcast(sym_touch),
                            merged.pred == sym_touch.p)
                .select(F.col("obj").alias("subj"), "pred",
                        F.col("subj").alias("obj")))
            .distinct()
        )
        added = added.unionByName(_pred_closure(base, max_iters))
    return (
        added.distinct()
        .join(merged, ["subj", "pred", "obj"], "left_anti")
        .join(prev_inferred.select("subj", "pred", "obj"),
              ["subj", "pred", "obj"], "left_anti")
    )


OWL_PROP_CHAIN = "http://www.w3.org/2002/07/owl#propertyChainAxiom"


def owl_chain_entailment(
    triples: DataFrame,
    chains: DataFrame | None = None,
) -> DataFrame:
    """owl:propertyChainAxiom consequences (OWL 2 RL prp-spo2):

      p owl:propertyChainAxiom (p1 p2 … pn),
      x0 p1 x1, x1 p2 x2, …, x(n-1) pn xn  ⇒  x0 p xn

    (e.g. hasParent∘hasParent ⇒ hasGrandparent). Returns inferred-only
    (subj, pred, obj) rows, asserted triples subtracted.

    ``chains`` may be passed directly as (p, chain_id, pos, step) —
    pos 0-based along the chain; otherwise the axioms are read from
    ``triples`` itself: the rdf:list spines behind owl:propertyChainAxiom
    objects are resolved doc-locally by :func:`extract.resolve_rdf_lists`
    (requires the full triples schema), and chain identity is
    (doc_url, list head) so the same property may carry several chains.

    Scale shape: chain axioms are ontology-sized — the step table
    broadcasts. The instance scan is joined once per chain POSITION
    (chains are short; the loop bound is the longest declared chain, a
    scalar aggregate, not data volume), each step an equi-join on the
    running frontier — no closure loop, no lineage growth."""
    obj = F.col("obj") if "obj" in triples.columns else F.col("obj_value")
    inst = triples.select("subj", "pred", obj.alias("obj")).distinct()

    if chains is None:
        from .extract import resolve_rdf_lists

        heads = (
            triples.filter(
                (F.col("pred") == OWL_PROP_CHAIN) & (F.col("obj_kind") == "bnode")
            )
            .select("doc_url", F.col("subj").alias("p"),
                    F.col("obj_value").alias("head"))
            .distinct()
        )
        resolved = resolve_rdf_lists(
            triples, heads.select("doc_url", "head").distinct()
        )
        chains = resolved.join(heads, ["doc_url", "head"]).select(
            "p",
            F.concat_ws("#", "doc_url", "head").alias("chain_id"),
            "pos",
            F.col("member").alias("step"),
        )

    lens = chains.groupBy("p", "chain_id").agg(
        (F.max("pos") + 1).alias("chain_len")
    )
    steps = chains.join(lens, ["p", "chain_id"])
    max_len = lens.agg(F.max("chain_len")).first()[0]
    if not max_len:
        return inst.limit(0)

    s0 = steps.filter(F.col("pos") == 0).select("p", "chain_id", "chain_len", "step")
    cur = (
        inst.join(F.broadcast(s0), inst.pred == s0.step)
        .select("p", "chain_id", "chain_len",
                F.col("subj").alias("start"), F.col("obj").alias("frontier"))
    )
    inferred = None
    for i in range(1, int(max_len) + 1):
        done = cur.filter(F.col("chain_len") == i).select(
            F.col("start").alias("subj"), F.col("p").alias("pred"),
            F.col("frontier").alias("obj"),
        )
        inferred = done if inferred is None else inferred.unionByName(done)
        if i == max_len:
            break
        si = steps.filter(F.col("pos") == i).select(
            "p", "chain_id", F.col("step").alias("_step")
        )
        cur = (
            cur.filter(F.col("chain_len") > i)
            .join(F.broadcast(si), ["p", "chain_id"])
            .join(
                inst.select(F.col("subj").alias("frontier"),
                            F.col("pred").alias("_pred"),
                            F.col("obj").alias("_next")),
                ["frontier"],
            )
            .filter(F.col("_pred") == F.col("_step"))
            .select("p", "chain_id", "chain_len", "start",
                    F.col("_next").alias("frontier"))
        )
    return inferred.distinct().join(inst, ["subj", "pred", "obj"], "left_anti")


OWL_FUNCTIONAL = "http://www.w3.org/2002/07/owl#FunctionalProperty"
OWL_INV_FUNCTIONAL = "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"


def owl_functional_sameas(
    triples: DataFrame,
    vocab: dict[str, str] | None = None,
) -> DataFrame:
    """owl:sameAs consequences of (inverse-)functional properties — the
    classic web-KG entity-resolution rule (OWL 2 RL prp-fp / prp-ifp):

      IFP  p a owl:InverseFunctionalProperty, x p y, z p y ⇒ x sameAs z
      FP   p a owl:FunctionalProperty,        x p y, x p z ⇒ y sameAs z

    (e.g. two page-local IRIs sharing a foaf:mbox are the same entity).
    Returns (subj, pred=owl:sameAs, obj) rows, subj != obj.

    Scale shape: declared-functional predicate sets are ontology-sized
    and broadcast; the grouping is ONE keyed-window shuffle per rule.
    Groups are STAR-PAIRED to their minimum member (same discipline as
    the MinHash mega-bucket fix, linking.py) — sameAs is closed
    transitively downstream by connected components
    (:func:`sameas_canonicalize`), so the star preserves every
    equivalence class while keeping a hostile k-member collision group
    at k-1 output rows instead of k². FP consequences over literal
    objects are skipped (sameAs relates resources; a functional-property
    literal clash is a data-quality signal, not an identity).
    """
    v = {**_OWL_VOCAB, **(vocab or {})}
    fp_type = v.get("functional", OWL_FUNCTIONAL)
    ifp_type = v.get("inv_functional", OWL_INV_FUNCTIONAL)

    # accept both the module's bare (subj, pred, obj) relation and the
    # engine's full triples schema (obj_value + obj_kind); without a
    # kind column every object is treated as a resource
    obj = F.col("obj") if "obj" in triples.columns else F.col("obj_value")
    kind = F.col("obj_kind") if "obj_kind" in triples.columns else F.lit("iri")
    inst = triples.select(
        "subj", "pred", obj.alias("obj"), kind.alias("obj_kind")
    ).distinct()

    def declared(axiom: str) -> DataFrame:
        return (
            inst.filter((F.col("pred") == v["type"]) & (F.col("obj") == axiom))
            .select(F.col("subj").alias("p"))
            .distinct()
        )

    def star_pairs(edges: DataFrame, group_cols: list[str], member: str) -> DataFrame:
        w = Window.partitionBy(*group_cols)
        return (
            edges.withColumn("_canon", F.min(member).over(w))
            .filter(F.col(member) != F.col("_canon"))
            .select(
                F.col(member).alias("subj"),
                F.lit(OWL_SAMEAS).alias("pred"),
                F.col("_canon").alias("obj"),
            )
        )

    ifp_edges = (
        inst.join(F.broadcast(declared(ifp_type)), inst.pred == F.col("p"))
        .select("pred", "subj", "obj")
    )
    ifp_pairs = star_pairs(ifp_edges, ["pred", "obj"], "subj")

    fp_edges = (
        inst.filter(F.col("obj_kind") != "literal")
        .join(F.broadcast(declared(fp_type)), inst.pred == F.col("p"))
        .select("pred", "subj", "obj")
    )
    fp_pairs = star_pairs(fp_edges, ["pred", "subj"], "obj")

    return ifp_pairs.unionByName(fp_pairs).distinct()


def owl_haskey_sameas(
    triples: DataFrame,
    keys: DataFrame,
    vocab: dict[str, str] | None = None,
    max_subjects_per_value: int = 256,
) -> DataFrame:
    """owl:hasKey consequences (OWL 2 RL prp-key): two instances of the
    keyed class that share a value on EVERY key property are inferred
    owl:sameAs.

    ``keys`` is (cls, key_id, prop) — one row per key property (a class
    may carry several keys under distinct key_ids; a single-property key
    degenerates to class-scoped IFP).

    Scale shape: the key table is ontology-sized (broadcast). Candidate
    pairs are generated per (key property, shared value) by a self-join
    INSIDE value groups — the standard ER blocking step — then a pair
    survives only if it appears under all |key| properties (one
    count-distinct aggregation). Unlike the IFP star, pairs must be
    explicit here (stars around different per-property centers would not
    intersect), so value groups larger than ``max_subjects_per_value``
    are dropped with the junk-key rationale: a "key" value shared by
    hundreds of subjects (empty string, 'N/A') identifies nothing and
    would only quadratically inflate the candidate set. Literal values
    participate (keys are usually literal-valued); the INFERRED subjects
    are resources by construction."""
    v = {**_OWL_VOCAB, **(vocab or {})}
    obj = F.col("obj") if "obj" in triples.columns else F.col("obj_value")
    inst = triples.select("subj", "pred", obj.alias("obj")).distinct()

    typed = (
        inst.filter(F.col("pred") == v["type"])
        .select(F.col("subj").alias("x"), F.col("obj").alias("cls"))
        .distinct()
    )
    key_sizes = keys.groupBy("cls", "key_id").agg(
        F.countDistinct("prop").alias("key_size")
    )
    kp = keys.join(key_sizes, ["cls", "key_id"])

    vals = (
        typed.join(F.broadcast(kp), "cls")
        .join(
            inst.select(F.col("subj").alias("x"), F.col("pred").alias("prop"),
                        F.col("obj").alias("val")),
            ["x", "prop"],
        )
        .select("cls", "key_id", "key_size", "prop", "x", "val")
        .distinct()
    )
    wv = Window.partitionBy("cls", "key_id", "prop", "val")
    blocked = vals.withColumn("_n", F.count(F.lit(1)).over(wv)).filter(
        F.col("_n") <= max_subjects_per_value
    ).drop("_n")

    a, b = blocked.alias("a"), blocked.alias("b")
    pair_votes = (
        a.join(b, ["cls", "key_id", "key_size", "prop", "val"])
        .filter(F.col("a.x") < F.col("b.x"))
        .select("cls", "key_id", "key_size",
                F.col("a.x").alias("x1"), F.col("b.x").alias("x2"), "prop")
        .distinct()
    )
    matched = (
        pair_votes.groupBy("cls", "key_id", "key_size", "x1", "x2")
        .agg(F.countDistinct("prop").alias("n_props"))
        .filter(F.col("n_props") == F.col("key_size"))
    )
    return (
        matched.select(
            F.col("x2").alias("subj"),
            F.lit(OWL_SAMEAS).alias("pred"),
            F.col("x1").alias("obj"),
        )
        .distinct()
    )


OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_canonicalize(
    triples: DataFrame,
    sameas_pred: str = OWL_SAMEAS,
    max_iters: int = 50,
) -> DataFrame:
    """owl:sameAs equality reasoning as CANONICALIZATION: equivalence
    classes of the (symmetric, transitive) sameAs relation are computed
    by the hash-min connected-components routine over the sameAs edge
    subset only, then every member IRI — subject or object position —
    is rewritten to its class's lexicographically-least member. The
    sameAs assertions themselves are dropped from the output (their
    information is now carried by the rewrite), and the result is a
    distinct (subj, pred, obj) set, since two non-canonical spellings
    of one fact collapse to the same row.

    This is the standard scalable alternative to materializing the full
    sameAs entailment (which is quadratic in class size: every fact
    restated for every member); rewriting to one representative keeps
    the relation linear and preserves query answers up to IRI choice.

    Scale shape: the CC loop touches only sameAs edges (ontology-/
    linkage-sized, orders of magnitude smaller than the corpus); the
    rewrite is two left equi-joins of the corpus against the
    (member → canonical) map — AQE broadcasts the map when it fits.
    Literals never appear in the map, so they pass through untouched.
    """
    from .linking import connected_components

    edges = (
        triples.filter(F.col("pred") == F.lit(sameas_pred))
        .select("subj", "obj")
    )
    mapping = connected_components(
        edges, src_col="subj", dst_col="obj", max_iters=max_iters
    ).select("vertex", F.col("component").alias("canon"))

    rest = (
        triples.filter(F.col("pred") != F.lit(sameas_pred))
        .select("subj", "pred", "obj")
    )
    m_subj = mapping.select(F.col("vertex").alias("subj"),
                            F.col("canon").alias("__subj_canon"))
    m_obj = mapping.select(F.col("vertex").alias("obj"),
                           F.col("canon").alias("__obj_canon"))
    return (
        rest.join(m_subj, on="subj", how="left")
        .join(m_obj, on="obj", how="left")
        .select(
            F.coalesce("__subj_canon", "subj").alias("subj"),
            "pred",
            F.coalesce("__obj_canon", "obj").alias("obj"),
        )
        .distinct()
    )


def resolve_entities(
    triples: DataFrame,
    keys: DataFrame | None = None,
    extra_sameas: DataFrame | None = None,
    vocab: dict[str, str] | None = None,
    use_functional: bool = True,
    max_iters: int = 50,
) -> DataFrame:
    """Stage-3 identity resolution in ONE call: gather every identity
    signal — asserted owl:sameAs, (inverse-)functional-property
    inference (:func:`owl_functional_sameas`), optional compound keys
    (:func:`owl_haskey_sameas`), and any caller-supplied extra pairs
    (e.g. :func:`.linking.fuzzy_name_pairs` matches promoted to sameAs)
    — then close the equivalence classes ONCE with connected components
    and rewrite every member to its canonical representative
    (:func:`sameas_canonicalize`).

    Returns the canonicalized (subj, pred, obj) relation; sameAs
    assertions are consumed by the rewrite. Running the closure once
    over the union of signals matters: mailbox-pair {a,b} and key-pair
    {b,c} merge into one class {a,b,c}, which per-signal
    canonicalization would miss."""
    obj = F.col("obj") if "obj" in triples.columns else F.col("obj_value")
    base = triples.select("subj", "pred", obj.alias("obj"))
    parts = [base]
    if use_functional:
        parts.append(owl_functional_sameas(triples, vocab))
    if keys is not None:
        parts.append(owl_haskey_sameas(triples, keys, vocab))
    if extra_sameas is not None:
        parts.append(
            extra_sameas.select("subj", F.lit(OWL_SAMEAS).alias("pred"), "obj")
        )
    kg = parts[0]
    for p in parts[1:]:
        kg = kg.unionByName(p)
    return sameas_canonicalize(kg, max_iters=max_iters)


OWL_ON_PROPERTY = "http://www.w3.org/2002/07/owl#onProperty"
OWL_SOME_VALUES = "http://www.w3.org/2002/07/owl#someValuesFrom"
OWL_ALL_VALUES = "http://www.w3.org/2002/07/owl#allValuesFrom"
OWL_HAS_VALUE = "http://www.w3.org/2002/07/owl#hasValue"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"

_RESTRICTION_VOCAB = {
    "type": RDF_TYPE,
    "on_property": OWL_ON_PROPERTY,
    "some_values": OWL_SOME_VALUES,
    "all_values": OWL_ALL_VALUES,
    "has_value": OWL_HAS_VALUE,
    "thing": OWL_THING,
}


def owl_restriction_entailment(
    triples: DataFrame,
    vocab: dict[str, str] | None = None,
) -> DataFrame:
    """Materialize the OWL 2 RL restriction-class consequences — the
    semantics behind the reference's E20 ``restrictions`` placeholder
    (reference src/RdfParser.php:214-217 reserves the slot; this is the
    engine actually applying them). Rules (OWL 2 RL profile names):

      cls-svf1  R owl:onProperty p ∧ R owl:someValuesFrom C ∧
                x p y ∧ y rdf:type C                     ⇒ x rdf:type R
      cls-svf2  … owl:someValuesFrom owl:Thing ∧ x p y   ⇒ x rdf:type R
      cls-avf   R owl:onProperty p ∧ R owl:allValuesFrom C ∧
                x rdf:type R ∧ x p y                     ⇒ y rdf:type C
      cls-hv1   R owl:onProperty p ∧ R owl:hasValue v ∧
                x rdf:type R                             ⇒ x p v
      cls-hv2   … ∧ x p v                               ⇒ x rdf:type R

    Returns inferred-only triples (asserted subtracted), same contract
    as :func:`rdfs_entailment`. One pass (no fixpoint): each rule fires
    once over asserted triples — chained restriction derivations
    (a freshly derived type re-triggering svf1) need iteration, which
    callers get by composing passes; documented, not silent.

    Scale shape: restriction axioms are ontology-sized → assembled on
    the driver-free broadcast side (three `_schema` slices joined on
    the restriction node, still ontology-sized), every rule is then one
    broadcast join against the instance scan (plus the one (p, C)-keyed
    equi-join svf1 needs between property assertions and type
    assertions — key-partitioned, output-sized)."""
    v = {**_RESTRICTION_VOCAB, **(vocab or {})}
    inst = triples.select("subj", "pred", "obj").distinct()
    types = inst.filter(F.col("pred") == v["type"]).select(
        F.col("subj").alias("t_subj"), F.col("obj").alias("t_class")
    )
    on_prop = _schema(triples, v["on_property"])  # (R, p)

    def axioms(pred: str) -> DataFrame:
        # (restriction R, property p, class/value c)
        return (
            on_prop.alias("op")
            .join(
                _schema(triples, pred).alias("ax"),
                F.col("op.src") == F.col("ax.src"),
            )
            .select(
                F.col("op.src").alias("r"),
                F.col("op.dst").alias("p"),
                F.col("ax.dst").alias("c"),
            )
            .distinct()
        )

    typed = F.lit(v["type"])
    props = inst.filter(F.col("pred") != v["type"])

    svf = axioms(v["some_values"])
    svf_thing = svf.filter(F.col("c") == v["thing"])
    svf_class = svf.filter(F.col("c") != v["thing"])
    # cls-svf1: x p y ∧ y type C — the (p) broadcast prunes the scan,
    # then one (y, C)-keyed join against the type slice
    svf1 = (
        props.join(F.broadcast(svf_class), props.pred == svf_class.p)
        .join(
            types,
            (F.col("obj") == F.col("t_subj")) & (F.col("c") == F.col("t_class")),
            "left_semi",
        )
        .select("subj", typed.alias("pred"), F.col("r").alias("obj"))
    )
    svf2 = (
        props.join(F.broadcast(svf_thing), props.pred == svf_thing.p)
        .select("subj", typed.alias("pred"), F.col("r").alias("obj"))
    )

    avf = axioms(v["all_values"])
    avf_out = (
        props.join(F.broadcast(avf), props.pred == avf.p)
        .join(
            types,
            (F.col("subj") == F.col("t_subj")) & (F.col("r") == F.col("t_class")),
            "left_semi",
        )
        .select(F.col("obj").alias("subj"), typed.alias("pred"),
                F.col("c").alias("obj"))
    )

    hv = axioms(v["has_value"])
    hv1 = (
        types.join(F.broadcast(hv), types.t_class == hv.r)
        .select(F.col("t_subj").alias("subj"), F.col("p").alias("pred"),
                F.col("c").alias("obj"))
    )
    hv2 = (
        props.join(
            F.broadcast(hv),
            (props.pred == hv.p) & (props.obj == hv.c),
        )
        .select("subj", typed.alias("pred"), F.col("r").alias("obj"))
    )

    inferred = (
        svf1.unionByName(svf2).unionByName(avf_out)
        .unionByName(hv1).unionByName(hv2)
        .distinct()
    )
    return inferred.join(inst, ["subj", "pred", "obj"], "left_anti")
