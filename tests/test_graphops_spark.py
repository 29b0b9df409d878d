"""Graph analytics: degrees, degree-oriented triangle counting, and
fixed-iteration PageRank — pinned against hand-computed graphs and a
pure-Python reference implementation on a deterministic pseudo-random
graph."""

import pytest

from parser_rdf_spark import graphops


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")


def _pseudo_random_pairs(n_vertices=40, n_edges=300):
    # deterministic 64-bit LCG, HIGH bits taken — a 31-bit LCG's low bits
    # alternate parity, which silently makes the graph bipartite
    # (triangle-free) when n_vertices is even
    x, pairs = 12345, []
    for _ in range(n_edges):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x >> 33) % n_vertices
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (x >> 33) % n_vertices
        pairs.append((a, b))
    return pairs


def test_degrees_counts_multi_edges_and_directions(spark):
    out = {
        r.vertex: (r.out_degree, r.in_degree, r.degree)
        for r in graphops.degrees(_edges(spark, [(1, 2), (1, 2), (2, 3), (3, 1)])).collect()
    }
    assert out == {1: (2, 1, 3), 2: (1, 2, 3), 3: (1, 1, 2)}


def test_triangle_count_k4(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]  # both directions + dups
    assert graphops.triangle_count(_edges(spark, k4)).collect()[0].n_triangles == 4


def test_triangle_count_square_is_zero(spark):
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert graphops.triangle_count(_edges(spark, square)).collect()[0].n_triangles == 0


def test_triangle_count_ignores_self_loops_and_duplicates(spark):
    e = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 1), (2, 0), (0, 2)]
    assert graphops.triangle_count(_edges(spark, e)).collect()[0].n_triangles == 1


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    pairs = _pseudo_random_pairs()
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = (
        sum(
            1
            for v in adj
            for w in adj[v]
            for x in adj[w]
            if v < w < x and x in adj[v]
        )
    )
    got = graphops.triangle_count(_edges(spark, pairs)).collect()[0].n_triangles
    assert got == expected and expected > 0


def _py_pagerank(pairs, n_iter, damping=0.85):
    edges = {(a, b) for a, b in pairs if a != b}
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: 1.0 / n for v in verts}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in verts}
        for a, b in edges:
            contrib[b] += rank[a] / outdeg[a]
        rank = {v: (1.0 - damping) / n + damping * contrib[v] for v in verts}
    return rank


def test_pagerank_matches_pure_python_reference(spark):
    pairs = _pseudo_random_pairs(n_vertices=30, n_edges=150)
    expected = _py_pagerank(pairs, n_iter=3)
    got = {r.vertex: r.rank for r in graphops.pagerank(_edges(spark, pairs), n_iter=3).collect()}
    assert set(got) == set(expected)
    for v, r in expected.items():
        assert got[v] == pytest.approx(r, abs=1e-12)


def test_pagerank_star_hand_computed(spark):
    # 1->0, 2->0, 3->0 ; N=4, one iteration:
    # rank(0) = 0.15/4 + 0.85 * 3 * (0.25/1) = 0.675
    # leaves   = 0.15/4                       = 0.0375 (dangling mass leaks)
    got = {
        r.vertex: r.rank
        for r in graphops.pagerank(
            _edges(spark, [(1, 0), (2, 0), (3, 0)]), n_iter=1
        ).collect()
    }
    assert got[0] == pytest.approx(0.675, abs=1e-12)
    for leaf in (1, 2, 3):
        assert got[leaf] == pytest.approx(0.0375, abs=1e-12)


def test_pagerank_zero_iterations_is_uniform(spark):
    got = {
        r.vertex: r.rank
        for r in graphops.pagerank(_edges(spark, [(0, 1), (1, 2)]), n_iter=0).collect()
    }
    assert got == {0: pytest.approx(1 / 3), 1: pytest.approx(1 / 3), 2: pytest.approx(1 / 3)}


def _py_lpa(pairs, n_iter):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(n_iter):
        new = {}
        for v, ns in adj.items():
            counts = {}
            for nb in ns:
                counts[lab[nb]] = counts.get(lab[nb], 0) + 1
            # most frequent, ties -> smallest label
            new[v] = min(counts, key=lambda c: (-counts[c], c))
        lab = new
    return lab


def test_label_propagation_triangle_with_pendant(spark):
    e = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = {
        r.vertex: r.label
        for r in graphops.label_propagation(_edges(spark, e), n_iter=2).collect()
    }
    # after 2 synchronous rounds the whole component converges to label 1
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_label_propagation_matches_pure_python(spark):
    pairs = _pseudo_random_pairs(n_vertices=30, n_edges=120)
    for it in (0, 1, 2):
        expected = _py_lpa(pairs, it)
        got = {
            r.vertex: r.label
            for r in graphops.label_propagation(_edges(spark, pairs), n_iter=it).collect()
        }
        assert got == expected, f"n_iter={it}"


def test_khop_reachability_hand_traced(spark):
    # 1 -> 2 -> 3 -> 4, plus 1 -> 3 shortcut and an unreachable 9 -> 1
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (9, 1)], "src long, dst long"
    )
    got = {
        r.vertex: r.hops
        for r in graphops.khop_reachability(e, [1], k=2).collect()
    }
    # 3 is reached at hop 1 via the shortcut (min hop), not hop 2
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}
    # k=0 returns only the seeds
    got0 = {
        r.vertex: r.hops
        for r in graphops.khop_reachability(e, [1], k=0).collect()
    }
    assert got0 == {1: 0}


def test_khop_reachability_early_stop_and_duplicate_seeds(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    # frontier dries up after hop 1; k=5 must not loop further or fail
    got = {
        r.vertex: r.hops
        for r in graphops.khop_reachability(e, [1, 1], k=5).collect()
    }
    assert got == {1: 0, 2: 1}


def test_neighborhood_jaccard_basic(spark):
    from parser_rdf_spark.graphops import neighborhood_jaccard

    edges = spark.createDataFrame(
        [("a", "n1"), ("a", "n2"), ("a", "n3"),
         ("b", "n1"), ("b", "n2"),
         ("c", "n3")],
        "src string, dst string",
    )
    out = {(r.node1, r.node2): (r.shared, r.union_size, r.jaccard_pct)
           for r in neighborhood_jaccard(edges).collect()}
    # a: {n1,n2,n3}, b: {n1,n2} -> shared 2, union 3
    assert out[("a", "b")] == (2, 3, 6666)
    # a and c share n3: shared 1, union 3 (deg c = 1)
    assert out[("a", "c")] == (1, 3, 3333)
    # n1..n3 pair through their shared neighbor a
    assert ("n1", "n2") in out
    assert ("b", "c") not in out  # no shared neighbor


def test_neighborhood_jaccard_hub_cap(spark):
    from parser_rdf_spark.graphops import neighborhood_jaccard

    # hub h has 5 spokes; x,y also share a private neighbor p
    edges = spark.createDataFrame(
        [(s, "h") for s in "abcxy"] + [("x", "p"), ("y", "p")],
        "src string, dst string",
    )
    out = {(r.node1, r.node2): (r.shared, r.union_size)
           for r in neighborhood_jaccard(edges, max_fanout=4).collect()}
    # blocking through the capped hub is dropped, but x,y still pair
    # via p — and the DENOMINATOR still counts the hub edge (deg 2 each)
    assert out[("x", "y")] == (1, 3)
    assert ("a", "b") not in out  # only shared neighbor is the hub


def test_kcore_peels_tail_chain(spark):
    from parser_rdf_spark.graphops import kcore

    # triangle a-b-c plus a pendant chain c-d-e: the 2-core is the
    # triangle only — d survives round 1 (degree 2) but falls in round 2
    # after e is peeled, pinning the ITERATIVE part
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    out = sorted((r.node, r.core_degree) for r in kcore(edges, 2).collect())
    assert out == [("a", 2), ("b", 2), ("c", 2)]


def test_kcore_empty_when_k_exceeds_density(spark):
    from parser_rdf_spark.graphops import kcore

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string")
    assert kcore(edges, 3).count() == 0


def test_random_walks_deterministic_and_sink_bounded(spark):
    from parser_rdf_spark.graphops import random_walks

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    out1 = {r.walk_id: (r.walk, r.n_steps)
            for r in random_walks(edges, 5, num_walks=2).collect()}
    out2 = {r.walk_id: (r.walk, r.n_steps)
            for r in random_walks(edges, 5, num_walks=2).collect()}
    assert out1 == out2  # bit-identical across runs
    # every walk from a ends at the sink d in exactly 2 steps
    for w in range(2):
        walk, n = out1[f"a#{w}"]
        assert n == 2 and walk.startswith("a->") and walk.endswith("->d")
    # walks from b/c are the single forced hop
    assert out1["b#0"] == ("b->d", 1)
    # different walk_no can take different branches (hash-dependent) but
    # each is a valid path
    assert out1["a#0"][0].split("->")[1] in ("b", "c")


def test_random_walks_max_degree_cap(spark):
    from parser_rdf_spark.graphops import random_walks

    edges = spark.createDataFrame(
        [("h", f"s{i}") for i in range(10)], "src string, dst string")
    out = random_walks(edges, 1, max_degree=3).collect()
    nxts = {r.walk.split("->")[1] for r in out if r.start == "h"}
    # the capped adjacency keeps exactly 3 md5-ranked spokes
    allowed = {r.walk.split("->")[1] for r in random_walks(edges, 1, max_degree=3)
               .filter("start = 'h'").collect()}
    assert nxts <= allowed and len(allowed) <= 3


def test_void_description_counts_and_serializes(spark):
    from parser_rdf_spark.graphops import void_description
    from parser_rdf_spark.schemas import TRIPLES
    from parser_rdf_spark.serialize import to_turtle_docs
    from parser_rdf_spark.turtle import parse_document as turtle_parse

    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("https://d/1", None, "a", RT, "iri", "C1", None, None, 1),
        ("https://d/1", None, "b", RT, "iri", "C1", None, None, 2),
        ("https://d/1", None, "c", RT, "iri", "C2", None, None, 3),
        ("https://d/1", None, "a", "p", "literal", "x", None, None, 4),
        ("https://d/1", None, "b", "p", "literal", "x", None, None, 5),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    v = void_description(t, "https://ds.example.org/kg")
    got = {(r.subj, r.pred): r.obj_value for r in v.collect()
           if r.subj == "https://ds.example.org/kg"}
    V = "http://rdfs.org/ns/void#"
    assert got[("https://ds.example.org/kg", V + "triples")] == "5"
    assert got[("https://ds.example.org/kg", V + "properties")] == "2"
    assert got[("https://ds.example.org/kg", V + "classes")] == "2"
    assert got[("https://ds.example.org/kg", V + "entities")] == "3"
    # class partition for C1 counts 2 entities
    part = {(r.pred, r.obj_value) for r in v.collect()}
    assert (V + "entities", "2") in part
    # the description itself serializes to valid Turtle
    [doc] = [r.turtle for r in to_turtle_docs(v).collect()]
    triples, _ = turtle_parse(doc)
    assert len(triples) == v.count()


def test_personalized_pagerank_restart_mass(spark):
    from parser_rdf_spark.graphops import personalized_pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string")
    got = {r.vertex: r.rank for r in personalized_pagerank(e, ["a"], n_iter=3).collect()}
    # hand-unrolled 3 iterations (tele(a)=1):
    assert abs(got["a"] - 0.4570625) < 1e-12
    assert abs(got["b"] - 0.1275) < 1e-12
    assert abs(got["c"] - 0.108375) < 1e-12
    assert abs(got["d"] - 0.30706249999999996) < 1e-12
    # global pagerank would spread mass everywhere; PPR keeps it local
    far = spark.createDataFrame([("x", "y")], "src string, dst string")
    both = e.unionByName(far)
    got2 = {r.vertex: r.rank for r in personalized_pagerank(both, ["a"], n_iter=3).collect()}
    assert got2["x"] == 0.0 and got2["y"] == 0.0


def test_personalized_pagerank_multi_seed_and_validation(spark):
    import pytest as _pytest

    from parser_rdf_spark.graphops import personalized_pagerank

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.vertex: r.rank for r in personalized_pagerank(e, ["a", "b", "a"], n_iter=0).collect()}
    assert got == {"a": 0.5, "b": 0.5}  # dup seeds collapse; rank0 = tele
    with _pytest.raises(ValueError):
        personalized_pagerank(e, [])


def test_hits_integer_path_counts(spark):
    from parser_rdf_spark.graphops import hits

    # two hubs point at a shared authority; one also at a private one
    e = spark.createDataFrame(
        [("h1", "a1"), ("h2", "a1"), ("h1", "a2")], "src string, dst string")
    got = {r.vertex: (r.hub, r.auth) for r in hits(e, n_iter=1).collect()}
    # a1 gets both unit hubs; h1's hub = a1 + a2 = 2 + 1
    assert got["a1"] == (0, 2) and got["a2"] == (0, 1)
    assert got["h1"] == (3, 0) and got["h2"] == (2, 0)
    got2 = {r.vertex: (r.hub, r.auth) for r in hits(e, n_iter=2).collect()}
    # iteration 2: a1 = h1+h2 = 5, a2 = h1 = 3; h1 = 5+3 = 8, h2 = 5
    assert got2["a1"] == (0, 5) and got2["a2"] == (0, 3)
    assert got2["h1"] == (8, 0) and got2["h2"] == (5, 0)


def test_round3_graph_ops_plan_shapes(spark):
    """Plan-shape pins for the round-3 graph ops: blocked/frontier joins
    must compile to hash/sort-merge equi-joins — never a cartesian or
    broadcast-nested-loop (the shapes that die at web scale)."""
    from parser_rdf_spark.graphops import (
        hits, kcore, neighborhood_jaccard, personalized_pagerank, random_walks,
    )

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 50}") for i in range(200)],
        "src string, dst string",
    )
    plans = [
        neighborhood_jaccard(e)._jdf.queryExecution().executedPlan().toString(),
        random_walks(e, 2)._jdf.queryExecution().executedPlan().toString(),
        kcore(e, 2)._jdf.queryExecution().executedPlan().toString(),
        personalized_pagerank(e, ["n1"], n_iter=1)._jdf.queryExecution()
        .executedPlan().toString(),
        hits(e, n_iter=1)._jdf.queryExecution().executedPlan().toString(),
    ]
    for p in plans:
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoop" not in p


def test_void_description_rides_predicate_statistics(spark):
    """void_description(stats=...) must be row-identical to the
    scan-everything path — the stats table only replaces WHERE the
    numbers come from (one full scan + the per-pred shuffle saved)."""
    from parser_rdf_spark.graphops import predicate_statistics, void_description
    from parser_rdf_spark.schemas import TRIPLES

    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("https://d/1", None, "a", RT, "iri", "C1", None, None, 1),
        ("https://d/1", None, "b", RT, "iri", "C1", None, None, 2),
        ("https://d/1", None, "c", RT, "iri", "C2", None, None, 3),
        ("https://d/1", None, "a", "p", "literal", "x", None, None, 4),
        ("https://d/1", None, "b", "p", "literal", "x", None, None, 5),
        ("https://d/2", None, "b", "q", "iri", "c", None, None, 1),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    stats = predicate_statistics(
        t.select("subj", "pred", t.obj_value.alias("obj"))
    )
    plain = void_description(t, "https://ds.example.org/kg")
    rided = void_description(t, "https://ds.example.org/kg", stats=stats)
    key = lambda r: (r.subj, r.pred, r.obj_value)
    assert sorted(map(key, rided.collect())) == sorted(map(key, plain.collect()))
    assert rided.schema == plain.schema


def test_to_property_graph_projection(spark):
    from parser_rdf_spark.graphops import to_property_graph
    from parser_rdf_spark.schemas import TRIPLES

    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("d1", None, "a", RT, "iri", "Person", None, None, 1),
        ("d2", None, "a", RT, "iri", "Person", None, None, 1),  # re-asserted
        ("d1", None, "a", "name", "literal", "Ann", None, None, 2),
        ("d1", None, "a", "knows", "iri", "b", None, None, 3),
        ("d1", None, "a", "owns", "bnode", "_:x", None, None, 4),
        ("d1", None, "b", RT, "iri", "Robot", None, None, 5),
        # a literal type assertion is NOT a vertex label
        ("d1", None, "b", RT, "literal", "weird", None, None, 6),
    ]
    t = spark.createDataFrame(rows, TRIPLES)
    v, p, e = to_property_graph(t, type_pred=RT)
    assert sorted((r.id, r.label) for r in v.collect()) == [
        ("a", "Person"), ("b", "Robot")]
    assert [(r.id, r.key, r.value) for r in p.collect()] == [("a", "name", "Ann")]
    assert sorted((r.src, r.label, r.dst) for r in e.collect()) == [
        ("a", "knows", "b"), ("a", "owns", "_:x")]


def test_to_property_graph_requires_full_schema(spark):
    from parser_rdf_spark.graphops import to_property_graph

    bare = spark.createDataFrame([("a", "p", "b")],
                                 "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="full triples schema"):
        to_property_graph(bare)
