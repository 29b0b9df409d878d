"""BGP compiler semantics + plan-shape regressions (bgp.py)."""

import pytest
from pyspark.sql import functions as F

from parser_rdf_spark.bgp import bgp_query, triples_spo

TRIPLES = [
    # a tiny social KG
    ("a", "type", "Person"),
    ("b", "type", "Person"),
    ("c", "type", "Person"),
    ("r", "type", "Robot"),
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "knows", "c"),
    ("r", "knows", "r"),  # self-loop for repeated-variable test
    ("a", "name", "Alice"),
    ("b", "name", "Bob"),
    # c has no name — OPTIONAL must keep c with NULL
    ("a", "age", "30"),
    ("b", "age", "25"),
]


@pytest.fixture(scope="module")
def kg(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_single_pattern_constant_pred(kg):
    out = bgp_query(kg, [("?s", "type", "Person")])
    assert rows(out) == [("a",), ("b",), ("c",)]


def test_chain_join_on_shared_variable(kg):
    out = bgp_query(kg, [("?x", "knows", "?y"), ("?y", "knows", "?z")],
                    select=["?x", "?z"])
    # a→b→c, plus the r self-loop chain r→r→r
    assert rows(out) == [("a", "c"), ("r", "r")]


def test_repeated_variable_in_one_pattern_is_equality(kg):
    out = bgp_query(kg, [("?x", "knows", "?x")])
    assert rows(out) == [("r",)]


def test_optional_binds_null_for_missing(kg):
    out = bgp_query(
        kg,
        [("?p", "type", "Person")],
        optional=[("?p", "name", "?n")],
        select=["?p", "?n"],
    )
    assert rows(out) == [("a", "Alice"), ("b", "Bob"), ("c", None)]


def test_filter_applies_to_bound_variables(kg):
    out = bgp_query(
        kg,
        [("?p", "type", "Person"), ("?p", "age", "?a")],
        filters=["a > '26'"],
        select=["?p"],
    )
    assert rows(out) == [("a",)]


def test_existence_guard_constant_pattern(kg):
    hit = bgp_query(kg, [("?p", "type", "Person"), ("a", "knows", "b")])
    miss = bgp_query(kg, [("?p", "type", "Person"), ("a", "knows", "zzz")])
    assert hit.count() == 3 and miss.count() == 0


def test_disconnected_patterns_cross_product(kg):
    out = bgp_query(kg, [("?p", "type", "Person"), ("?r", "type", "Robot")])
    assert out.count() == 3  # 3 persons × 1 robot


def test_optional_without_shared_variable_raises(kg):
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_query(kg, [("?p", "type", "Person")],
                  optional=[("?q", "type", "Robot")])


def test_select_unbound_variable_raises(kg):
    with pytest.raises(ValueError, match="unbound"):
        bgp_query(kg, [("?p", "type", "Person")], select=["?zzz"])


def test_distinct_order_limit(kg):
    out = bgp_query(kg, [("?x", "knows", "?y")], select=["?x"],
                    distinct=True, order_by=["?x"], limit=2)
    assert [r[0] for r in out.collect()] == ["a", "b"]


def test_triples_spo_adapter(spark):
    from parser_rdf_spark.schemas import TRIPLES as TRIPLES_SCHEMA

    full = spark.createDataFrame(
        [("http://d", "_:default", "http://s", "http://p", "iri", "http://o", None, None, 1)],
        schema=TRIPLES_SCHEMA,
    )
    out = triples_spo(full)
    assert out.columns == ["subj", "pred", "obj"]
    assert rows(out) == [("http://s", "http://p", "http://o")]


# -- plan shape -------------------------------------------------------------

def test_plan_constant_pred_reaches_parquet_pushdown(spark, tmp_path, kg):
    path = str(tmp_path / "kg.parquet")
    kg.write.parquet(path)
    disk = spark.read.parquet(path)
    plan = bgp_query(disk, [("?s", "type", "Person")])._jdf.queryExecution().executedPlan().toString()
    # the constant predicate+object filter must be pushed to the scan
    assert "PushedFilters: [" in plan
    assert "pred" in plan.split("PushedFilters: [", 1)[1][:200]


def test_plan_shared_variable_join_not_cartesian(kg):
    plan = bgp_query(
        kg, [("?x", "knows", "?y"), ("?y", "knows", "?z")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_join_order_most_constant_first(kg):
    # both orders give identical results (compiler may reorder freely)
    a = bgp_query(kg, [("?c", "knows", "?y"), ("?c", "type", "Person")],
                  select=["?c", "?y"])
    b = bgp_query(kg, [("?c", "type", "Person"), ("?c", "knows", "?y")],
                  select=["?c", "?y"])
    assert rows(a) == rows(b)


# -- property paths + CONSTRUCT ---------------------------------------------

def test_predicate_alternation_compiles_to_isin(kg):
    from parser_rdf_spark.bgp import bgp_query

    out = bgp_query(kg, [("?s", ("name", "age"), "?v")], select=["?s", "?v"])
    assert rows(out) == [("a", "30"), ("a", "Alice"), ("b", "25"), ("b", "Bob")]


def test_inverse_predicate_swaps_roles(kg):
    from parser_rdf_spark.bgp import bgp_query

    fwd = bgp_query(kg, [("?x", "knows", "?y")], select=["?x", "?y"])
    inv = bgp_query(kg, [("?y", "^knows", "?x")], select=["?x", "?y"])
    assert rows(fwd) == rows(inv)


def test_sequence_path_desugars_to_chain(kg):
    from parser_rdf_spark.bgp import bgp_query, seq_path

    out = bgp_query(kg, seq_path("?x", ["knows", "knows"], "?z"),
                    select=["?x", "?z"])
    assert rows(out) == [("a", "c"), ("r", "r")]


def test_seq_path_single_hop_is_plain_pattern():
    from parser_rdf_spark.bgp import seq_path

    assert seq_path("?a", ["p"], "?b") == [("?a", "p", "?b")]


def test_alternation_with_variable_member_raises(kg):
    from parser_rdf_spark.bgp import bgp_query
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alternation members"):
        bgp_query(kg, [("?s", ("name", "?p"), "?v")])


def test_construct_instantiates_template(kg):
    from parser_rdf_spark.bgp import bgp_construct

    out = bgp_construct(
        kg,
        patterns=[("?x", "knows", "?y")],
        template=[("?y", "knownBy", "?x"), ("?x", "type2", "Knower")],
    )
    got = rows(out)
    assert ("b", "knownBy", "a") in got
    assert ("a", "type2", "Knower") in got
    # distinct: 'a' knows two people but appears once as Knower
    assert got.count(("a", "type2", "Knower")) == 1


def test_construct_drops_null_bound_template_rows(kg):
    from parser_rdf_spark.bgp import bgp_construct

    out = bgp_construct(
        kg,
        patterns=[("?p", "type", "Person")],
        optional=[("?p", "name", "?n")],
        template=[("?p", "hasName", "?n")],
    )
    # c has no name -> its template row is dropped
    assert rows(out) == [("a", "hasName", "Alice"), ("b", "hasName", "Bob")]


def test_multiset_input_deduped_to_set_semantics(spark, kg):
    # corpus-level relations union per-document graphs: the same triple
    # asserted 500x must not square the join (and must not multiply
    # solutions)
    noisy = kg.unionByName(
        spark.createDataFrame(
            [("a", "type", "Person")] * 500 + [("a", "name", "Alice")] * 500,
            "subj string, pred string, obj string",
        )
    )
    out = bgp_query(noisy, [("?p", "type", "Person"), ("?p", "name", "?n")],
                    select=["?p", "?n"])
    assert rows(out) == [("a", "Alice"), ("b", "Bob")]


# ---------------------------------------------------------------------------
# SPARQL 1.1 clauses: UNION, negation, aggregates, VALUES, BIND, p+/p*
# ---------------------------------------------------------------------------

HIER = [
    # a partOf chain with branching: leaf1/leaf2 → mid → top, lone → top
    ("leaf1", "partOf", "mid"),
    ("leaf2", "partOf", "mid"),
    ("mid", "partOf", "top"),
    ("lone", "partOf", "top"),
    ("leaf1", "type", "Leaf"),
    ("leaf2", "type", "Leaf"),
]


@pytest.fixture(scope="module")
def hier(spark):
    return spark.createDataFrame(HIER, "subj string, pred string, obj string")


def test_kleene_plus_transitive(hier):
    out = bgp_query(hier, [("?x", "partOf+", "top")], select=["?x"])
    assert rows(out) == [("leaf1",), ("leaf2",), ("lone",), ("mid",)]


def test_kleene_star_includes_zero_length(hier):
    out = bgp_query(hier, [("?x", "partOf*", "top")], select=["?x"])
    # p* additionally binds top itself (zero-length path)
    assert rows(out) == [("leaf1",), ("leaf2",), ("lone",), ("mid",), ("top",)]


def test_kleene_joins_with_other_patterns(hier):
    out = bgp_query(
        hier,
        [("?x", "type", "Leaf"), ("?x", "partOf+", "?anc")],
        select=["?x", "?anc"],
    )
    assert rows(out) == [
        ("leaf1", "mid"), ("leaf1", "top"),
        ("leaf2", "mid"), ("leaf2", "top"),
    ]


def test_literal_plus_predicate_via_alternation(spark):
    kg2 = spark.createDataFrame(
        [("x", "weird+", "y")], "subj string, pred string, obj string"
    )
    out = bgp_query(kg2, [("?s", ["weird+"], "?o")], select=["?s", "?o"])
    assert rows(out) == [("x", "y")]


def test_not_exists_removes_matching_solutions(kg):
    # persons with no name
    out = bgp_query(
        kg,
        [("?p", "type", "Person")],
        not_exists=[[("?p", "name", "?n")]],
    )
    assert rows(out) == [("c",)]


def test_not_exists_disjoint_group_constant_gate(kg):
    # spec §8.3.3: a disjoint NOT EXISTS group removes EVERYTHING when
    # it has ≥1 solution and nothing when it has none — the dual of the
    # EXISTS constant gate (and the spec's contrast with MINUS)
    out = bgp_query(kg, [("?p", "type", "Person")],
                    not_exists=[[("?q", "type", "Robot")]])
    assert out.count() == 0  # a robot exists → every row removed
    out2 = bgp_query(kg, [("?p", "type", "Person")],
                     not_exists=[[("?q", "type", "Unicorn")]])
    assert out2.count() == 3  # no unicorns → nothing removed


def test_minus_disjoint_group_removes_nothing(kg):
    out = bgp_query(kg, [("?p", "type", "Person")],
                    minus=[[("?q", "type", "Robot")]])
    assert out.count() == 3


def test_minus_shared_group_removes(kg):
    out = bgp_query(kg, [("?p", "type", "Person")],
                    minus=[[("?p", "knows", "c")]])
    assert rows(out) == [("c",)]  # a and b know c


def test_values_inline_join(kg):
    out = bgp_query(
        kg,
        [("?p", "name", "?n")],
        values=(["?n"], [("Alice",), ("Zed",)]),
        select=["?p", "?n"],
    )
    assert rows(out) == [("a", "Alice")]


def test_values_introduces_new_column(kg):
    out = bgp_query(
        kg,
        [("?p", "name", "?n")],
        values=(["?n", "?tag"], [("Alice", "t1"), ("Bob", "t2")]),
        select=["?p", "?tag"],
    )
    assert rows(out) == [("a", "t1"), ("b", "t2")]


def test_bind_computes_and_filters(kg):
    out = bgp_query(
        kg,
        [("?p", "age", "?a")],
        bind={"?a2": "cast(a as int) * 2", "?big": "a2 > 55"},
        filters=["big"],
        select=["?p", "?a2"],
    )
    assert rows(out) == [("a", 60)]


def test_bind_rebinding_raises(kg):
    with pytest.raises(ValueError, match="already bound"):
        bgp_query(kg, [("?p", "age", "?a")], bind={"?a": "1"})


def test_aggregates_group_by_having(kg):
    out = bgp_query(
        kg,
        [("?x", "knows", "?y")],
        group_by=["?x"],
        aggregates={"n_known": "count(DISTINCT y)"},
        having=["n_known >= 2"],
    )
    assert rows(out) == [("a", 2)]


def test_global_aggregate(kg):
    out = bgp_query(kg, [("?p", "type", "Person")],
                    aggregates={"n": "count(*)"})
    assert rows(out) == [(3,)]


def test_group_by_without_aggregates_raises(kg):
    with pytest.raises(ValueError, match="require aggregates"):
        bgp_query(kg, [("?p", "type", "?t")], group_by=["?t"])


def test_union_branches_null_fill(kg):
    from parser_rdf_spark.bgp import bgp_union

    out = bgp_union(
        kg,
        [
            {"patterns": [("?s", "type", "Person")],
             "optional": [("?s", "name", "?n")]},
            {"patterns": [("?s", "type", "Robot")]},
        ],
        select=["?s", "?n"],
    )
    # robot branch never binds ?n → NULL
    assert rows(out) == [("a", "Alice"), ("b", "Bob"), ("c", None), ("r", None)]


def test_union_is_multiset_unless_distinct(kg):
    from parser_rdf_spark.bgp import bgp_union

    groups = [
        {"patterns": [("?s", "type", "Person")]},
        {"patterns": [("?s", "type", "Person")]},
    ]
    assert bgp_union(kg, groups).count() == 6
    assert bgp_union(kg, groups, distinct=True).count() == 3


def test_union_adds_no_shuffle(kg):
    from parser_rdf_spark.bgp import bgp_union

    one = bgp_query(kg, [("?s", "type", "Person")])
    two = bgp_union(kg, [{"patterns": [("?s", "type", "Person")]},
                         {"patterns": [("?s", "type", "Robot")]}])
    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")
    assert n_exchanges(two) <= 2 * n_exchanges(one)


def test_negated_property_set_single(kg):
    # everything about 'a' said with a predicate other than knows/type
    out = bgp_query(kg, [("a", "!(knows|type)", "?o")], select=["?o"])
    assert rows(out) == [("30",), ("Alice",)]


def test_negated_property_set_unparenthesized(kg):
    out = bgp_query(kg, [("c", "!knows", "?o")], select=["?o"])
    assert rows(out) == [("Person",)]


def test_two_negated_sets_do_not_share_phantom_variable(kg):
    # two negset patterns must join only on ?s (not an invented pred var)
    out = bgp_query(
        kg,
        [("?s", "!knows", "?n"), ("?s", "!(name|age)", "?t")],
        filters=["n = 'Alice'"],
        select=["?s", "?t"],
    )
    assert rows(out) == [("a", "Person"), ("a", "b"), ("a", "c")]


def test_negated_set_inverse_composes(kg):
    # ^!knows: invert roles, then exclude knows
    out = bgp_query(kg, [("Alice", "^!knows", "?s")], select=["?s"])
    assert rows(out) == [("a",)]


def test_optional_group_all_or_nothing(kg):
    # OPTIONAL { ?p name ?n . ?p age ?g }: binds both or neither.
    # a and b have both; c has neither -> NULL/NULL.
    out = bgp_query(
        kg,
        [("?p", "type", "Person")],
        optional=[[("?p", "name", "?n"), ("?p", "age", "?g")]],
        select=["?p", "?n", "?g"],
    )
    assert rows(out) == [("a", "Alice", "30"), ("b", "Bob", "25"),
                         ("c", None, None)]


def test_optional_group_partial_match_stays_null(spark):
    # d has a name but no age: the GROUP doesn't match, so ?n must be
    # NULL too (the difference from two independent OPTIONALs)
    kg2 = spark.createDataFrame(
        [("d", "type", "Person"), ("d", "name", "Dee")],
        "subj string, pred string, obj string",
    )
    grouped = bgp_query(
        kg2, [("?p", "type", "Person")],
        optional=[[("?p", "name", "?n"), ("?p", "age", "?g")]],
        select=["?p", "?n", "?g"],
    )
    assert rows(grouped) == [("d", None, None)]
    separate = bgp_query(
        kg2, [("?p", "type", "Person")],
        optional=[("?p", "name", "?n"), ("?p", "age", "?g")],
        select=["?p", "?n", "?g"],
    )
    assert rows(separate) == [("d", "Dee", None)]


def test_ask_true_and_false(kg):
    from parser_rdf_spark.bgp import bgp_ask

    assert rows(bgp_ask(kg, [("?s", "type", "Robot")])) == [(True,)]
    assert rows(bgp_ask(kg, [("?s", "type", "Dragon")])) == [(False,)]
    # with filters kwarg passing through
    assert rows(bgp_ask(kg, [("?p", "name", "?n")],
                        filters=["n = 'Zed'"])) == [(False,)]


# ---------------------------------------------------------------------------
# stats-driven join ordering (round-4: predicate_statistics → cost-based
# pattern order; static most-constant-first stays the no-stats default)
# ---------------------------------------------------------------------------

def _skewed_kg(spark):
    # 'common' is a mega-predicate (200 rows, 20 subjects); 'rare' binds 2
    rows_ = [(f"s{i % 20}", "common", f"o{i}") for i in range(200)]
    rows_ += [("s1", "rare", "x"), ("s2", "rare", "y")]
    return spark.createDataFrame(rows_, "subj string, pred string, obj string")


def test_order_patterns_static_vs_stats(spark):
    from parser_rdf_spark.bgp import _order_patterns
    from parser_rdf_spark.graphops import predicate_statistics

    kg = _skewed_kg(spark)
    stats = {r["pred"]: (r["n_triples"], r["ndv_subj"], r["ndv_obj"])
             for r in predicate_statistics(kg).collect()}
    # adversarial user order: the mega-predicate first; both patterns have
    # one constant, so the static heuristic keeps user order
    pats = [("?s", "common", "?o"), ("?s", "rare", "?x")]
    static = [p for _, p in _order_patterns(pats, None)]
    assert static[0][1] == "common"
    ordered = [p for _, p in _order_patterns(pats, stats)]
    assert ordered[0][1] == "rare"   # 2 rows ≪ 200 rows


def test_stats_order_prefers_connected_over_cheapest(spark):
    from parser_rdf_spark.bgp import _order_patterns

    # cheapest remaining pattern shares no variable with what's bound;
    # the greedy must pick the connected one to avoid a cross join
    stats = {"p1": (2, 2, 2), "p2": (100, 10, 10), "p3": (1, 1, 1)}
    pats = [("?a", "p2", "?b"), ("?a", "p1", "?c"), ("?x", "p3", "?y")]
    ordered = [p for _, p in _order_patterns(pats, stats)]
    assert ordered[0][1] == "p3"          # global cheapest starts
    # after p3 nothing is connected (disconnected groups) → cheapest again
    assert ordered[1][1] == "p1"
    # p2 shares ?a with p1 → joined last, connected
    assert ordered[2][1] == "p2"


def test_estimate_pattern_constants_shrink(spark):
    from parser_rdf_spark.bgp import _estimate_pattern

    smap = {"p": (1000, 100, 10)}
    assert _estimate_pattern(("?s", "p", "?o"), smap, 1000.0) == 1000
    assert _estimate_pattern(("S", "p", "?o"), smap, 1000.0) == 10     # /ndv_s
    assert _estimate_pattern(("?s", "p", "O"), smap, 1000.0) == 100    # /ndv_o
    assert _estimate_pattern(("S", "p", "O"), smap, 1000.0) == 1       # both
    # unknown predicate: zero solutions → most selective of all
    assert _estimate_pattern(("?s", "nope", "?o"), smap, 1000.0) == 0
    # variable predicate: sums per-pred estimates
    smap2 = {"p": (1000, 100, 10), "q": (50, 50, 50)}
    assert _estimate_pattern(("?s", "?p", "?o"), smap2, 1050.0) == 1050
    # kleene/closure: pessimistic total
    assert _estimate_pattern(("?s", "p+", "?o"), smap, 1000.0) == 1000.0


def test_bgp_query_stats_same_results_and_selective_base(spark):
    from parser_rdf_spark.graphops import predicate_statistics

    kg = _skewed_kg(spark)
    pats = [("?s", "common", "?o"), ("?s", "rare", "?x")]
    plain = bgp_query(kg, pats)
    stats_df = predicate_statistics(kg)
    costed = bgp_query(kg, pats, stats=stats_df)
    assert rows(plain) == rows(costed)
    # the stats plan's left-deep base is the rare scan: the FIRST scan
    # filter in the optimized plan string mentions 'rare'
    plan = costed._jdf.queryExecution().optimizedPlan().toString()
    assert -1 < plan.find("rare") < plan.find("common")
    # ... while the adversarial static order keeps the mega-scan as base
    plan0 = plain._jdf.queryExecution().optimizedPlan().toString()
    assert -1 < plan0.find("common") < plan0.find("rare")
