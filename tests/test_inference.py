"""RDFS entailment rules + schema transitive closure (inference.py)."""

import pytest
from pyspark.sql import functions as F

from parser_rdf_spark.inference import rdfs_entailment, transitive_closure

VOCAB = {"type": "a", "subclass": "sub", "subprop": "subp",
         "domain": "dom", "range": "rng"}

SCHEMA = "subj string, pred string, obj string"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def pairs(df):
    return sorted((r.src, r.dst) for r in df.collect())


def test_transitive_closure_chain(spark):
    p = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    assert pairs(transitive_closure(p)) == [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")
    ]


def test_transitive_closure_cycle_saturates(spark):
    p = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    # closure of a 2-cycle: both cross pairs, no reflexive rows
    assert pairs(transitive_closure(p)) == [("a", "b"), ("b", "a")]


def _kg(spark, extra=()):
    base = [
        # schema
        ("Student", "sub", "Person"),
        ("Person", "sub", "Agent"),
        ("enrolledAt", "subp", "memberOf"),
        ("memberOf", "dom", "Member"),
        ("memberOf", "rng", "Org"),
        # instances
        ("alice", "a", "Student"),
        ("alice", "enrolledAt", "mit"),
        ("bob", "a", "Agent"),
    ]
    return spark.createDataFrame(list(base) + list(extra), SCHEMA)


def test_rdfs9_type_inheritance_through_closed_chain(spark):
    inf = rows(rdfs_entailment(_kg(spark), vocab=VOCAB, include_schema_closure=False))
    assert ("alice", "a", "Person") in inf
    assert ("alice", "a", "Agent") in inf  # needs the CLOSED subclass chain
    assert ("bob", "a", "Agent") not in inf  # already asserted → subtracted


def test_rdfs7_property_inheritance(spark):
    inf = rows(rdfs_entailment(_kg(spark), vocab=VOCAB, include_schema_closure=False))
    assert ("alice", "memberOf", "mit") in inf


def test_rdfs2_3_domain_range_via_inherited_property(spark):
    # alice only asserts enrolledAt; domain/range live on the SUPER
    # property — the inherited assertion must feed the typing rules
    inf = rows(rdfs_entailment(_kg(spark), vocab=VOCAB, include_schema_closure=False))
    assert ("alice", "a", "Member") in inf
    assert ("mit", "a", "Org") in inf


def test_schema_closure_rows_emitted_once(spark):
    inf = rdfs_entailment(_kg(spark), vocab=VOCAB, include_schema_closure=True)
    got = rows(inf)
    assert ("Student", "sub", "Agent") in got  # new transitive edge
    assert ("Student", "sub", "Person") not in got  # asserted → subtracted


def test_inferred_disjoint_from_asserted_and_distinct(spark):
    inf = rdfs_entailment(_kg(spark), vocab=VOCAB)
    asserted = _kg(spark)
    assert inf.join(asserted, ["subj", "pred", "obj"], "left_semi").count() == 0
    assert inf.count() == inf.distinct().count()


def test_default_vocab_full_iris(spark):
    t = spark.createDataFrame(
        [
            ("C", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "D"),
            ("x", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "C"),
        ],
        SCHEMA,
    )
    inf = rows(rdfs_entailment(t, include_schema_closure=False))
    assert inf == [("x", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "D")]


# -- OWL property entailment ------------------------------------------------

OWL_VOCAB = {"type": "a", "inverse": "inv", "symmetric": "Sym", "transitive": "Trans"}


def _owl_kg(spark, extra=()):
    from parser_rdf_spark.inference import owl_property_entailment  # noqa: F401

    base = [
        ("hasPart", "inv", "partOf"),
        ("adjacentTo", "a", "Sym"),
        ("ancestorOf", "a", "Trans"),
        ("car", "hasPart", "engine"),
        ("wheel", "partOf", "car"),
        ("fr", "adjacentTo", "de"),
        ("x", "ancestorOf", "y"),
        ("y", "ancestorOf", "z"),
        ("z", "ancestorOf", "w"),
    ]
    return spark.createDataFrame(list(base) + list(extra), SCHEMA)


def test_owl_inverse_both_directions(spark):
    from parser_rdf_spark.inference import owl_property_entailment

    inf = rows(owl_property_entailment(_owl_kg(spark), vocab=OWL_VOCAB))
    assert ("engine", "partOf", "car") in inf       # p -> inverse
    assert ("car", "hasPart", "wheel") in inf       # inverse -> p


def test_owl_symmetric(spark):
    from parser_rdf_spark.inference import owl_property_entailment

    inf = rows(owl_property_entailment(_owl_kg(spark), vocab=OWL_VOCAB))
    assert ("de", "adjacentTo", "fr") in inf


def test_owl_transitive_closure_full_chain(spark):
    from parser_rdf_spark.inference import owl_property_entailment

    inf = rows(owl_property_entailment(_owl_kg(spark), vocab=OWL_VOCAB))
    for pair in (("x", "z"), ("x", "w"), ("y", "w")):
        assert (pair[0], "ancestorOf", pair[1]) in inf
    # asserted hops are subtracted
    assert ("x", "ancestorOf", "y") not in inf


def test_owl_symmetric_plus_transitive_interplay(spark):
    from parser_rdf_spark.inference import owl_property_entailment

    kg = _owl_kg(spark, extra=[
        ("near", "a", "Sym"), ("near", "a", "Trans"),
        ("p1", "near", "p2"), ("p3", "near", "p2"),
    ])
    inf = rows(owl_property_entailment(kg, vocab=OWL_VOCAB))
    # p1-p2 symmetric + p2-p3 (from symmetry of p3-p2) chain to p1-p3
    assert ("p1", "near", "p3") in inf and ("p3", "near", "p1") in inf


def test_owl_no_axioms_no_inferences(spark):
    from parser_rdf_spark.inference import owl_property_entailment

    t = spark.createDataFrame([("a", "p", "b")], SCHEMA)
    assert owl_property_entailment(t, vocab=OWL_VOCAB).count() == 0


def test_sameas_canonicalize_chain_and_literals(spark):
    from parser_rdf_spark.inference import sameas_canonicalize

    rows = [
        # a ~ b ~ c: canonical is "a" (lexicographic minimum)
        ("b", "sameAs", "a"),
        ("c", "sameAs", "b"),
        ("c", "name", "Carol"),          # literal object untouched
        ("b", "knows", "d"),             # subject rewritten
        ("e", "knows", "c"),             # object rewritten
        ("a", "knows", "d"),             # collapses with the b-row
        ("x", "knows", "y"),             # untouched (no sameAs)
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = sorted(
        tuple(r)
        for r in sameas_canonicalize(t, sameas_pred="sameAs").collect()
    )
    assert out == [
        ("a", "knows", "d"),
        ("a", "name", "Carol"),
        ("e", "knows", "a"),
        ("x", "knows", "y"),
    ]


def test_equivalent_class_and_property(spark):
    vocab = {**VOCAB, "equiv_class": "eqc", "equiv_prop": "eqp"}
    rows_in = [
        ("B", "eqc", "C"),           # B ≡ C
        ("p", "eqp", "q"),           # p ≡ q
        ("x", "a", "B"),
        ("y", "p", "z"),
    ]
    t = spark.createDataFrame(rows_in, SCHEMA)
    out = rows(rdfs_entailment(t, vocab=vocab))
    # typing flows through the equivalence, both mutual sub rows
    # emitted with the schema closure, property inherited both ways
    assert ("x", "a", "C") in out
    assert ("B", "sub", "C") in out and ("C", "sub", "B") in out
    assert ("p", "subp", "q") in out and ("q", "subp", "p") in out
    assert ("y", "q", "z") in out


def test_owl_ifp_and_fp_sameas(spark):
    from parser_rdf_spark.inference import owl_functional_sameas

    SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
    t = spark.createDataFrame([
        # axioms
        ("mbox", "a", "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"),
        ("bornIn", "a", "http://www.w3.org/2002/07/owl#FunctionalProperty"),
        # IFP: x/y/z share a mailbox -> star to min member x
        ("x", "mbox", "m1"), ("y", "mbox", "m1"), ("z", "mbox", "m1"),
        ("w", "mbox", "m2"),  # singleton group: no pair
        # FP: one subject, two birthplace resources -> they're the same
        ("s", "bornIn", "cityB"), ("s", "bornIn", "cityA"),
    ], SCHEMA)
    out = rows(owl_functional_sameas(t, vocab={"type": "a"}))
    assert out == sorted([
        ("y", SAMEAS, "x"), ("z", SAMEAS, "x"),
        ("cityB", SAMEAS, "cityA"),
    ])


def test_owl_fp_skips_literals(spark):
    from parser_rdf_spark.inference import owl_functional_sameas

    t = spark.createDataFrame([
        ("https://d/1", None, "age", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "iri", "http://www.w3.org/2002/07/owl#FunctionalProperty", None, None, 1),
        ("https://d/1", None, "s", "age", "literal", "41", None, None, 2),
        ("https://d/1", None, "s", "age", "literal", "42", None, None, 3),
    ], __import__("parser_rdf_spark.schemas", fromlist=["TRIPLES"]).TRIPLES)
    # a functional-property literal clash is data quality, not identity
    assert owl_functional_sameas(t).count() == 0


def test_owl_ifp_feeds_canonicalization(spark):
    from parser_rdf_spark.inference import owl_functional_sameas, sameas_canonicalize

    t = spark.createDataFrame([
        ("mbox", "a", "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"),
        ("b", "mbox", "m1"), ("a", "mbox", "m1"),
        ("b", "likes", "c"),
    ], SCHEMA)
    sameas = owl_functional_sameas(t, vocab={"type": "a"})
    canon = sameas_canonicalize(t.unionByName(sameas))
    got = sorted((r.subj, r.pred, r.obj) for r in canon.collect())
    # b collapses into a: b's edges now assert from a
    assert ("a", "likes", "c") in got and ("a", "mbox", "m1") in got


def test_owl_property_chain_direct(spark):
    from parser_rdf_spark.inference import owl_chain_entailment

    chains = spark.createDataFrame(
        [("grand", "c1", 0, "parent"), ("grand", "c1", 1, "parent"),
         ("uncle", "c2", 0, "parent"), ("uncle", "c2", 1, "brother")],
        "p string, chain_id string, pos int, step string",
    )
    t = spark.createDataFrame([
        ("a", "parent", "b"), ("b", "parent", "c"), ("c", "parent", "d"),
        ("b", "brother", "e"),
        ("x", "grand", "pre"),  # asserted: stays out of the inferred set
    ], SCHEMA)
    out = rows(owl_chain_entailment(t, chains=chains))
    assert out == sorted([
        ("a", "grand", "c"), ("b", "grand", "d"),
        ("a", "uncle", "e"),
    ])


def test_owl_property_chain_from_turtle_list(spark):
    """Chain axioms read from the KG itself: the rdf:list spine parsed
    out of a Turtle document and resolved doc-locally."""
    from parser_rdf_spark.inference import owl_chain_entailment
    from parser_rdf_spark.parse import parse_pages, triples_of

    from conftest import pages_df

    doc = """\
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://e/> .
ex:hasGrandparent owl:propertyChainAxiom ( ex:hasParent ex:hasParent ) .
ex:a ex:hasParent ex:b .
ex:b ex:hasParent ex:c .
ex:b ex:hasParent ex:d .
"""
    t = triples_of(parse_pages(pages_df(spark, {"https://d/chain": doc}), fmt="turtle"))
    out = sorted((r.subj, r.pred, r.obj) for r in owl_chain_entailment(t).collect())
    assert out == [
        ("http://e/a", "http://e/hasGrandparent", "http://e/c"),
        ("http://e/a", "http://e/hasGrandparent", "http://e/d"),
    ]


def test_owl_property_chain_no_axioms(spark):
    from parser_rdf_spark.inference import owl_chain_entailment

    chains = spark.createDataFrame([], "p string, chain_id string, pos int, step string")
    t = spark.createDataFrame([("a", "p", "b")], SCHEMA)
    assert owl_chain_entailment(t, chains=chains).count() == 0


def test_owl_haskey_two_prop_key(spark):
    from parser_rdf_spark.inference import owl_haskey_sameas

    SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
    keys = spark.createDataFrame(
        [("Person", "k1", "email"), ("Person", "k1", "phone")],
        "cls string, key_id string, prop string",
    )
    t = spark.createDataFrame([
        ("x", "a", "Person"), ("y", "a", "Person"), ("z", "a", "Person"),
        ("x", "email", "e1"), ("y", "email", "e1"), ("z", "email", "e1"),
        ("x", "phone", "p1"), ("y", "phone", "p1"), ("z", "phone", "p9"),
        # multi-valued: any shared value per property counts
        ("x", "email", "e-extra"),
    ], SCHEMA)
    out = rows(owl_haskey_sameas(t, keys, vocab={"type": "a"}))
    # x~y match on BOTH props; z shares email only
    assert out == [("y", SAMEAS, "x")]


def test_owl_haskey_junk_value_cap(spark):
    from parser_rdf_spark.inference import owl_haskey_sameas

    keys = spark.createDataFrame(
        [("Person", "k1", "email")], "cls string, key_id string, prop string")
    t = spark.createDataFrame(
        [(s, "a", "Person") for s in "abcd"]
        + [(s, "email", "JUNK") for s in "abcd"]
        + [("p", "a", "Person"), ("q", "a", "Person"),
           ("p", "email", "real"), ("q", "email", "real")],
        SCHEMA,
    )
    out = rows(owl_haskey_sameas(t, keys, vocab={"type": "a"},
                                 max_subjects_per_value=2))
    # the 4-subject JUNK group is dropped; the 2-subject real group pairs
    assert out == [("q", "http://www.w3.org/2002/07/owl#sameAs", "p")]


def test_owl_haskey_requires_class_membership(spark):
    from parser_rdf_spark.inference import owl_haskey_sameas

    keys = spark.createDataFrame(
        [("Person", "k1", "email")], "cls string, key_id string, prop string")
    t = spark.createDataFrame([
        ("x", "a", "Person"), ("x", "email", "e1"),
        ("y", "email", "e1"),  # same mailbox but not typed Person
    ], SCHEMA)
    assert owl_haskey_sameas(t, keys, vocab={"type": "a"}).count() == 0


def test_resolve_entities_merges_signals_into_one_class(spark):
    from parser_rdf_spark.inference import resolve_entities

    keys = spark.createDataFrame(
        [("Person", "k1", "phone")], "cls string, key_id string, prop string")
    t = spark.createDataFrame([
        ("mbox", "a", "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"),
        ("x", "a", "Person"), ("y", "a", "Person"), ("z", "a", "Person"),
        # IFP links x~y; hasKey links y~z: ONE class {x,y,z}
        ("x", "mbox", "m1"), ("y", "mbox", "m1"),
        ("y", "phone", "p1"), ("z", "phone", "p1"),
        ("z", "likes", "w"),
    ], SCHEMA)
    out = rows(resolve_entities(t, keys=keys, vocab={"type": "a"}))
    # z's edge now asserts from the class minimum x; no sameAs remains
    assert ("x", "likes", "w") in out
    assert not any(p == "http://www.w3.org/2002/07/owl#sameAs" for _, p, _o in out)
    assert not any(s in ("y", "z") for s, _, _ in out)
