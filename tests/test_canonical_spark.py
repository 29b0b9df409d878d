"""Graph canonicalization laws (canonical.py): isomorphism invariance,
ground sensitivity, idempotence, and the parser round-trip the module
exists for — the SAME Turtle graph serialized with different bnode
labels must dedup at the graph level."""

import pytest

from parser_rdf_spark.canonical import (
    bnode_colors,
    canonical_graph_hash,
    canonicalize_bnodes,
    isomorphic_duplicates,
)
from parser_rdf_spark.schemas import TRIPLES

from conftest import pages_df


def _chain(doc, a, b, bob="Bob"):
    # <x> knows _:a ; _:a name "Ann" ; _:a friend _:b ; _:b name <bob>
    return [
        (doc, None, "http://e/x", "http://e/knows", "bnode", a, None, None, 1),
        (doc, None, a, "http://e/name", "literal", "Ann", None, None, 2),
        (doc, None, a, "http://e/friend", "bnode", b, None, None, 3),
        (doc, None, b, "http://e/name", "literal", bob, None, None, 4),
    ]


@pytest.fixture(scope="module")
def fixture_triples(spark):
    rows = _chain("d1", "_:a", "_:b") + _chain("d2", "_:genid9", "_:b0")
    rows += _chain("d3", "_:a", "_:b", bob="Carol")
    # automorphic pair
    for doc, x, y in (("d4", "_:m", "_:n"), ("d5", "_:q2", "_:q1")):
        rows += [
            (doc, None, "http://e/x", "http://e/p", "bnode", x, None, None, 1),
            (doc, None, "http://e/x", "http://e/p", "bnode", y, None, None, 2),
            (doc, None, x, "http://e/v", "literal", "1", None, None, 3),
            (doc, None, y, "http://e/v", "literal", "1", None, None, 4),
        ]
    return spark.createDataFrame(rows, TRIPLES)


def test_isomorphic_graphs_hash_identically(fixture_triples):
    h = {r.doc_url: r.graph_hash
         for r in canonical_graph_hash(fixture_triples, rounds=2).collect()}
    assert h["d1"] == h["d2"]
    assert h["d4"] == h["d5"]
    assert h["d1"] != h["d3"]  # ground literal differs
    assert h["d1"] != h["d4"]


def test_isomorphic_duplicates_groups(fixture_triples):
    groups = {tuple(r.doc_urls)
              for r in isomorphic_duplicates(fixture_triples, rounds=2).collect()}
    assert groups == {("d1", "d2"), ("d4", "d5")}


def test_canonical_labels_make_isomorphic_graphs_equal(fixture_triples):
    c = canonicalize_bnodes(fixture_triples, rounds=2)
    key = lambda r: (r.subj, r.pred, r.obj_kind, r.obj_value)  # noqa: E731
    by_doc = {
        d: sorted(map(key, c.where(c.doc_url == d).collect()))
        for d in ("d1", "d2", "d4", "d5")
    }
    assert by_doc["d1"] == by_doc["d2"]
    assert by_doc["d4"] == by_doc["d5"]
    # distinct labels even for the automorphic (color-tied) d4 pair
    labels = {r.subj for r in c.where("doc_url = 'd4'").collect()}
    assert {"_:c0", "_:c1"} <= labels


def test_canonicalize_is_idempotent_and_schema_stable(fixture_triples):
    once = canonicalize_bnodes(fixture_triples, rounds=2)
    twice = canonicalize_bnodes(once, rounds=2)
    assert once.schema == fixture_triples.schema
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    assert sorted(map(key, twice.collect())) == sorted(map(key, once.collect()))


def test_ground_only_graph_hashes_without_bnodes(spark):
    rows = [("g1", None, "http://e/x", "http://e/p", "iri",
             "http://e/y", None, None, 1)]
    t = spark.createDataFrame(rows, TRIPLES)
    out = canonical_graph_hash(t, rounds=2).collect()
    assert len(out) == 1 and out[0].n_triples == 1


def test_named_graph_changes_hash(spark):
    base = [("gd", None, "http://e/x", "http://e/p", "bnode", "_:a", None, None, 1),
            ("gd", None, "_:a", "http://e/q", "literal", "v", None, None, 2)]
    named = [(d, "http://g/one", s, p, k, v, lg, dt, n)
             for (d, _, s, p, k, v, lg, dt, n) in base]
    named = [("gn",) + r[1:] for r in named]
    t = spark.createDataFrame(base + named, TRIPLES)
    h = {r.doc_url: r.graph_hash for r in canonical_graph_hash(t, 2).collect()}
    assert h["gd"] != h["gn"]


def test_colors_are_label_independent(fixture_triples):
    c = bnode_colors(fixture_triples, rounds=2)
    d1 = sorted(r.color for r in c.where("doc_url = 'd1'").collect())
    d2 = sorted(r.color for r in c.where("doc_url = 'd2'").collect())
    assert d1 == d2 and len(d1) == 2 and d1[0] != d1[1]


def test_parse_roundtrip_dedup_across_bnode_renames(spark):
    """The production scenario: two crawls of the same page whose
    serializer minted different _:genid labels. Full pipeline — parse
    both Turtle docs (P5 doc-scopes the labels differently), then
    canonical dedup finds them; a third, ground-different doc stays
    out."""
    from parser_rdf_spark.parse import parse_pages, triples_of

    ttl = """@prefix ex: <http://e/> .
ex:x ex:knows _:{a} .
_:{a} ex:name "Ann" ; ex:friend _:{b} .
_:{b} ex:name "{bob}" ."""
    pages = pages_df(spark, {
        "https://crawl.example.org/p1": ttl.format(a="a", b="b", bob="Bob"),
        "https://crawl.example.org/p2": ttl.format(a="genid1", b="genid2", bob="Bob"),
        "https://crawl.example.org/p3": ttl.format(a="a", b="b", bob="Carol"),
    })
    t = triples_of(parse_pages(pages))
    dups = isomorphic_duplicates(t, rounds=2).collect()
    assert len(dups) == 1
    assert dups[0].doc_urls == [
        "https://crawl.example.org/p1", "https://crawl.example.org/p2"]


def test_canonical_plan_has_no_cartesian(fixture_triples):
    plans = [
        canonical_graph_hash(fixture_triples, 2)._jdf.queryExecution()
        .executedPlan().toString(),
        canonicalize_bnodes(fixture_triples, 2)._jdf.queryExecution()
        .executedPlan().toString(),
    ]
    for p in plans:
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoop" not in p


def test_canonical_nquads_identical_for_isomorphic_docs(fixture_triples, spark):
    from parser_rdf_spark.canonical import to_canonical_nquads

    lines = to_canonical_nquads(fixture_triples, rounds=2)
    by_doc = {
        d: sorted(r.line for r in lines.where(lines.doc_url == d).collect())
        for d in ("d1", "d2", "d3")
    }
    assert by_doc["d1"] == by_doc["d2"]
    assert by_doc["d1"] != by_doc["d3"]
    # the canonical output reparses to the same triple count (valid N-Quads)
    from conftest import pages_df
    from parser_rdf_spark.parse import parse_pages, triples_of

    doc = "\n".join(by_doc["d1"])
    t2 = triples_of(parse_pages(pages_df(spark, {"https://canon/d1": doc})))
    assert t2.count() == 4


# ---------------------------------------------------------------------------
# round 5: soundness under WL ties (ambiguity flag + exact-quads verify)
# ---------------------------------------------------------------------------

def _cycle(doc, labels):
    """Unanchored bnode cycle(s) over pred n: label[i] -> label[i+1],
    closing each group of 3/6 — WL-1 gives every node the same color."""
    rows = []
    for i, (a, b) in enumerate(labels):
        rows.append((doc, None, a, "http://e/n", "bnode", b, None, None, i))
    return rows


def _hexagon(doc, pre):
    lbl = [f"_:{pre}{i}" for i in range(6)]
    return _cycle(doc, [(lbl[i], lbl[(i + 1) % 6]) for i in range(6)])


def _two_triangles(doc, pre):
    lbl = [f"_:{pre}{i}" for i in range(6)]
    pairs = [(lbl[0], lbl[1]), (lbl[1], lbl[2]), (lbl[2], lbl[0]),
             (lbl[3], lbl[4]), (lbl[4], lbl[5]), (lbl[5], lbl[3])]
    return _cycle(doc, pairs)


def test_ambiguous_flag_on_wl_ties(spark, fixture_triples):
    t = spark.createDataFrame(
        _hexagon("hx", "h") + _two_triangles("tt", "t"), TRIPLES)
    h = {r.doc_url: r for r in canonical_graph_hash(t, rounds=2).collect()}
    # WL-1 genuinely cannot split these: hashes COLLIDE, flag is up
    assert h["hx"].graph_hash == h["tt"].graph_hash
    assert h["hx"].ambiguous and h["tt"].ambiguous
    # fully-refined docs are not flagged
    g = {r.doc_url: r.ambiguous
         for r in canonical_graph_hash(fixture_triples, rounds=2).collect()}
    assert g["d1"] is False and g["d2"] is False
    # the automorphic pair IS flagged (colors tie) — and still dedups
    # below because every labeling serializes identically
    assert g["d4"] is True and g["d5"] is True


def test_nonisomorphic_wl_collision_not_deduped(spark):
    # hexagon vs two triangles: same WL hash, NOT isomorphic — the
    # round-5 exact-canonical-quads verification must keep them apart,
    # while a genuine hexagon copy under renamed labels still groups
    t = spark.createDataFrame(
        _hexagon("hx", "h") + _two_triangles("tt", "t")
        + _hexagon("hx2", "z"), TRIPLES)
    groups = {tuple(r.doc_urls)
              for r in isomorphic_duplicates(t, rounds=2).collect()}
    assert groups == {("hx", "hx2")}


def test_automorphic_true_duplicates_still_group(fixture_triples):
    # regression guard: the conservative path must not lose the d4/d5
    # automorphic TRUE duplicates (full-orbit symmetry: any labeling
    # serializes identically)
    groups = {tuple(r.doc_urls)
              for r in isomorphic_duplicates(fixture_triples, rounds=2).collect()}
    assert ("d4", "d5") in groups


def _reversed_hexagon(doc, pre):
    # the SAME directed 6-cycle entered through an orbit-crossing
    # relabel: label order walks the cycle BACKWARDS, so the
    # (color, original label) tie-break serializes it differently from
    # _hexagon even though the graphs are isomorphic (map i -> -i)
    lbl = [f"_:{pre}{i}" for i in range(6)]
    return _cycle(doc, [(lbl[(i + 1) % 6], lbl[i]) for i in range(6)])


def test_orbit_crossing_relabel_still_groups(spark):
    # pre-round-5-exact behavior MISSED this pair (sound but
    # incomplete); individualization-refinement must group it while
    # keeping the two-triangles collision apart
    t = spark.createDataFrame(
        _hexagon("hx", "h") + _reversed_hexagon("hr", "r")
        + _two_triangles("tt", "t"), TRIPLES)
    groups = {tuple(r.doc_urls)
              for r in isomorphic_duplicates(t, rounds=2).collect()}
    assert groups == {("hr", "hx")}


def test_exact_canonical_hashes_law(spark):
    from parser_rdf_spark.canonical import exact_canonical_hashes

    t = spark.createDataFrame(
        _hexagon("hx", "h") + _reversed_hexagon("hr", "r")
        + _two_triangles("tt", "t") + _two_triangles("tt2", "w"), TRIPLES)
    rows = {r.doc_url: r for r in exact_canonical_hashes(t).collect()}
    assert all(r.exact for r in rows.values())
    assert rows["hx"].text_hash == rows["hr"].text_hash
    assert rows["tt"].text_hash == rows["tt2"].text_hash
    assert rows["hx"].text_hash != rows["tt"].text_hash


def test_exact_branch_cap_fallback_is_sound(spark):
    from parser_rdf_spark.canonical import exact_canonical_hashes

    t = spark.createDataFrame(
        _hexagon("hx", "h") + _two_triangles("tt", "t"), TRIPLES)
    rows = {r.doc_url: r
            for r in exact_canonical_hashes(t, branch_cap=1).collect()}
    # cap forces the fallback labeling: flagged, and still never a
    # false merge (full serializations of non-isomorphic graphs differ)
    assert not rows["hx"].exact and not rows["tt"].exact
    assert rows["hx"].text_hash != rows["tt"].text_hash


def test_exact_canonical_nquads_identical_under_orbit_relabel(spark):
    from parser_rdf_spark.canonical import to_canonical_nquads

    t = spark.createDataFrame(
        _hexagon("hx", "h") + _reversed_hexagon("hr", "r")
        + _two_triangles("tt", "t"), TRIPLES)
    lines = to_canonical_nquads(t, rounds=2, exact=True)
    by_doc = {
        d: sorted(r.line for r in lines.where(lines.doc_url == d).collect())
        for d in ("hx", "hr", "tt")
    }
    # RDFC-1.0 parity mode: the orbit-crossing re-crawl emits the
    # IDENTICAL canonical line set; the non-isomorphic decoy does not
    assert by_doc["hx"] == by_doc["hr"]
    assert by_doc["hx"] != by_doc["tt"]
    # the default (column-only tie-break) path honestly misses this
    # pair — pinned so the exact flag stays meaningful
    plain = to_canonical_nquads(t, rounds=2, exact=False)
    pb = {
        d: sorted(r.line for r in plain.where(plain.doc_url == d).collect())
        for d in ("hx", "hr")
    }
    assert pb["hx"] != pb["hr"]


def test_exact_relabel_keeps_unambiguous_path_and_schema(fixture_triples):
    from parser_rdf_spark.canonical import canonicalize_bnodes

    plain = canonicalize_bnodes(fixture_triples, rounds=2)
    ex = canonicalize_bnodes(fixture_triples, rounds=2, exact=True)
    assert ex.schema == fixture_triples.schema
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    # d1/d2/d3 are unambiguous: identical rows either way; the d4/d5
    # automorphic pair may permute labels but stays isomorphic-equal
    for d in ("d1", "d2", "d3"):
        assert sorted(map(key, ex.where(ex.doc_url == d).collect())) == \
            sorted(map(key, plain.where(plain.doc_url == d).collect()))
    k2 = lambda r: (r.subj, r.pred, r.obj_kind, r.obj_value)  # noqa: E731
    assert sorted(map(k2, ex.where("doc_url = 'd4'").collect())) == \
        sorted(map(k2, ex.where("doc_url = 'd5'").collect()))
