

def test_owl_restriction_entailment(spark):
    from parser_rdf_spark.inference import owl_restriction_entailment

    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    OP = "http://www.w3.org/2002/07/owl#onProperty"
    SV = "http://www.w3.org/2002/07/owl#someValuesFrom"
    AV = "http://www.w3.org/2002/07/owl#allValuesFrom"
    HV = "http://www.w3.org/2002/07/owl#hasValue"
    TH = "http://www.w3.org/2002/07/owl#Thing"
    rows = [
        # R1: someValuesFrom(hasPet, Dog); R2: someValuesFrom(knows, Thing)
        ("R1", OP, "hasPet"), ("R1", SV, "Dog"),
        ("R2", OP, "knows"), ("R2", SV, TH),
        # R3: allValuesFrom(worksAt, Org); R4: hasValue(status, active)
        ("R3", OP, "worksAt"), ("R3", AV, "Org"),
        ("R4", OP, "status"), ("R4", HV, "active"),
        # instances
        ("a", "hasPet", "rex"), ("rex", T, "Dog"),
        ("b", "hasPet", "mittens"),              # mittens not a Dog: no svf1
        ("c", "knows", "d"),                     # svf2 -> c type R2
        ("e", T, "R3"), ("e", "worksAt", "acme"),  # avf -> acme type Org
        ("f", T, "R4"),                           # hv1 -> f status active
        ("g", "status", "active"),                # hv2 -> g type R4
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    inf = sorted((r.subj, r.pred, r.obj)
                 for r in owl_restriction_entailment(t).collect())
    assert ("a", T, "R1") in inf
    assert all(s != "b" for s, _, _ in inf)
    assert ("c", T, "R2") in inf
    assert ("acme", T, "Org") in inf
    assert ("f", "status", "active") in inf
    assert ("g", T, "R4") in inf
    # asserted triples are never re-emitted
    assert ("e", T, "R3") not in inf


# ---------------------------------------------------------------------------
# round 5: delta-driven entailment maintenance (VERDICT task 6)
# ---------------------------------------------------------------------------

def _spo(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _entail_sets(df):
    return {tuple(r) for r in df.collect()}


def test_rdfs_delta_instance_only_batch_bit_identical(spark):
    from parser_rdf_spark.inference import rdfs_entailment, rdfs_entailment_delta

    v = {"type": "a", "subclass": "sc", "subprop": "sp",
         "domain": "dom", "range": "rng"}
    old = _spo(spark, [
        ("Cust", "sc", "Agent"), ("Agent", "sc", "Entity"),
        ("inNation", "sp", "locatedIn"), ("locatedIn", "rng", "Place"),
        ("c1", "a", "Cust"), ("c1", "inNation", "n1"),
    ])
    delta = _spo(spark, [
        ("c2", "a", "Cust"), ("c2", "inNation", "n2"),
    ])
    prev = rdfs_entailment(old, vocab=v)
    added = rdfs_entailment_delta(old, delta, prev_inferred=prev, vocab=v)
    full = rdfs_entailment(old.unionByName(delta), vocab=v)
    assert _entail_sets(prev) | _entail_sets(added) == _entail_sets(full)
    # delta rows are genuinely new
    assert _entail_sets(added) & _entail_sets(prev) == set()
    assert ("c2", "a", "Agent") in _entail_sets(added)
    assert ("n2", "a", "Place") in _entail_sets(added)


def test_rdfs_delta_schema_batch_reaches_old_instances(spark):
    from parser_rdf_spark.inference import rdfs_entailment, rdfs_entailment_delta

    v = {"type": "a", "subclass": "sc", "subprop": "sp",
         "domain": "dom", "range": "rng"}
    old = _spo(spark, [
        ("Cust", "sc", "Agent"),
        ("c1", "a", "Cust"), ("c1", "inNation", "n1"),
        ("c9", "knows", "c1"),
    ])
    # schema-extending delta: a new superclass link, a new subproperty
    # edge over an OLD predicate, and a domain axiom over an OLD pred —
    # consequences must reach the old instances
    delta = _spo(spark, [
        ("Agent", "sc", "Entity"),
        ("inNation", "sp", "locatedIn"),
        ("locatedIn", "rng", "Place"),
        ("knows", "dom", "Person"),
        ("c2", "a", "Cust"),
    ])
    prev = rdfs_entailment(old, vocab=v)
    added = rdfs_entailment_delta(old, delta, prev_inferred=prev, vocab=v)
    full = rdfs_entailment(old.unionByName(delta), vocab=v)
    assert _entail_sets(prev) | _entail_sets(added) == _entail_sets(full)
    a = _entail_sets(added)
    assert ("c1", "a", "Entity") in a          # old type × new closure edge
    assert ("c1", "locatedIn", "n1") in a      # old assertion × new subprop
    assert ("n1", "a", "Place") in a           # chained rdfs7 -> rdfs3
    assert ("c9", "a", "Person") in a          # old assertion × new domain
    assert ("c2", "a", "Entity") in a          # delta instance × new closure


def test_rdfs_delta_chained_subclass_through_delta_edge(spark):
    from parser_rdf_spark.inference import rdfs_entailment, rdfs_entailment_delta

    v = {"type": "a", "subclass": "sc", "subprop": "sp",
         "domain": "dom", "range": "rng"}
    # closure DELTA must include the chained pair (Cust,Top) even though
    # neither closure edge is asserted directly by the delta alone
    old = _spo(spark, [("Cust", "sc", "Mid"), ("x", "a", "Cust")])
    delta = _spo(spark, [("Mid", "sc", "Top")])
    prev = rdfs_entailment(old, vocab=v)
    added = rdfs_entailment_delta(old, delta, prev_inferred=prev, vocab=v)
    full = rdfs_entailment(old.unionByName(delta), vocab=v)
    assert _entail_sets(prev) | _entail_sets(added) == _entail_sets(full)
    a = _entail_sets(added)
    assert ("x", "a", "Top") in a
    assert ("Cust", "sc", "Top") in a          # schema-closure delta row


def test_owl_delta_instance_batch_bit_identical(spark):
    from parser_rdf_spark.inference import (owl_property_entailment,
                                            owl_property_entailment_delta)

    v = {"type": "a", "inverse": "inv", "symmetric": "Sym",
         "transitive": "Trans"}
    old = _spo(spark, [
        ("partOf", "a", "Trans"), ("touches", "a", "Sym"),
        ("contains", "inv", "partOf"),
        ("x", "partOf", "y"), ("y", "partOf", "z"),
        ("p", "touches", "q"),
    ])
    # instance-only batch extends the transitive chain and adds a
    # symmetric edge — partOf's closure must be re-run, touches' rows
    # are delta-local, inverse rows derive for the new edges
    delta = _spo(spark, [
        ("z", "partOf", "w"), ("q", "touches", "r"),
    ])
    prev = owl_property_entailment(old, vocab=v)
    added = owl_property_entailment_delta(old, delta, prev_inferred=prev,
                                          vocab=v)
    full = owl_property_entailment(old.unionByName(delta), vocab=v)
    assert _entail_sets(prev) | _entail_sets(added) == _entail_sets(full)
    a = _entail_sets(added)
    assert ("x", "partOf", "w") in a       # closure through the new edge
    assert ("w", "contains", "z") in a     # inverse of the new edge
    assert ("r", "touches", "q") in a      # symmetry of the new edge
    assert _entail_sets(added) & _entail_sets(prev) == set()


def test_owl_delta_axiom_batch_touches_old_edges(spark):
    from parser_rdf_spark.inference import (owl_property_entailment,
                                            owl_property_entailment_delta)

    v = {"type": "a", "inverse": "inv", "symmetric": "Sym",
         "transitive": "Trans"}
    old = _spo(spark, [
        ("x", "next", "y"), ("y", "next", "z"), ("z", "next", "w"),
        ("m", "near", "n"),
    ])
    # axiom-only batch: next becomes transitive (old edges must close),
    # near becomes symmetric, prev becomes next's inverse
    delta = _spo(spark, [
        ("next", "a", "Trans"), ("near", "a", "Sym"),
        ("prev", "inv", "next"),
    ])
    prev = owl_property_entailment(old, vocab=v)
    assert _entail_sets(prev) == set()     # no axioms → nothing inferred
    added = owl_property_entailment_delta(old, delta, prev_inferred=prev,
                                          vocab=v)
    full = owl_property_entailment(old.unionByName(delta), vocab=v)
    assert _entail_sets(added) == _entail_sets(full)
    a = _entail_sets(added)
    assert ("x", "next", "w") in a         # closure over OLD edges
    assert ("y", "prev", "x") in a         # inverse over OLD edges
    assert ("n", "near", "m") in a         # symmetry over OLD edges


def test_owl_delta_untouched_transitive_pred_skipped(spark):
    from parser_rdf_spark.inference import (owl_property_entailment,
                                            owl_property_entailment_delta)

    v = {"type": "a", "inverse": "inv", "symmetric": "Sym",
         "transitive": "Trans"}
    old = _spo(spark, [
        ("partOf", "a", "Trans"),
        ("x", "partOf", "y"), ("y", "partOf", "z"),
    ])
    # the delta never touches partOf: its closure must not resurface
    delta = _spo(spark, [("a1", "other", "b1")])
    prev = owl_property_entailment(old, vocab=v)
    added = owl_property_entailment_delta(old, delta, prev_inferred=prev,
                                          vocab=v)
    full = owl_property_entailment(old.unionByName(delta), vocab=v)
    assert _entail_sets(prev) | _entail_sets(added) == _entail_sets(full)
    assert _entail_sets(added) == set()
