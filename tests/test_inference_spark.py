

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
