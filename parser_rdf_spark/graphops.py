"""Graph analytics over the materialized edge relation.

The pipeline's stage 4 materializes (src, dst) edge tables
(``materialize.build_edges``); a knowledge-graph user immediately asks
graph-shaped questions of them — degree profiles, clustering (triangle)
structure, and centrality. The reference is a per-document parser and has
no analytics surface (its output stops at triples:
/root/reference/src/RdfParser.php:61-74), so this module is north-star
"operations a large-scale pipeline needs" scope, same tier as the dedup
and ANN stacks.

All operators take a generic edge DataFrame with two integer-typed vertex
columns — they work equally on the KG edge tables and on any derived
graph. Scale notes per operator; nothing here collects more than a single
scalar (vertex count) to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex (out_degree, in_degree, degree) over the directed edge
    multiset. ONE shuffle: both endpoints are unioned into a single
    (vertex, is_out, is_in) stream and aggregated once — not the naive
    two-groupBys-plus-outer-join plan, which shuffles three times.
    Map-side partial aggregation makes the shuffle carry at most one row
    per (vertex) per input partition."""
    ends = edges.select(
        F.col(src).alias("vertex"), F.lit(1).alias("_o"), F.lit(0).alias("_i")
    ).unionAll(
        edges.select(F.col(dst).alias("vertex"), F.lit(0).alias("_o"), F.lit(1).alias("_i"))
    )
    return ends.groupBy("vertex").agg(
        F.sum("_o").alias("out_degree"),
        F.sum("_i").alias("in_degree"),
        F.count(F.lit(1)).alias("degree"),
    )


def undirected_simple_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected simple edge set: endpoints ordered a < b,
    self-loops dropped, duplicates (either direction) collapsed. One
    shuffle (the distinct)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of the underlying undirected simple graph —
    one row, column ``n_triangles``.

    Scale shape: the naive wedge join (edges ⋈ edges on the shared
    endpoint) materializes Σ deg(v)² wedges — a mega-host hub with degree
    10⁶ alone yields 10¹² wedges. This uses the standard degree
    orientation ("compact-forward"): orient every undirected edge from
    the (degree, id)-smaller endpoint to the larger, build wedges only
    from each vertex's ORIENTED out-neighbors (out-degree is bounded by
    O(√m) on any graph), and close them against the oriented edge set.
    Every triangle is counted exactly once, at its unique lowest-ranked
    vertex; wedge volume drops from Σ deg² to O(m^1.5) worst-case.
    Three shuffles total (degree agg, wedge self-join, closing join).
    """
    e = undirected_simple_edges(edges, src, dst)
    deg = degrees(e, "a", "b").select("vertex", "degree")

    # Orient by (degree, id): u -> v iff (deg_u, u) < (deg_v, v). Ties in
    # degree are broken by vertex id, so the orientation is a total order
    # (a DAG) — no triangle is missed or double-counted.
    da = deg.select(F.col("vertex").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("vertex").alias("b"), F.col("degree").alias("_db"))
    withdeg = e.join(da, "a").join(db, "b")
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )

    # Wedges (v, w) from a common low-rank vertex u; v < w dedups the
    # unordered out-neighbor pair. The closing edge {v, w} is looked up
    # in the ORIENTED set, which holds each undirected edge exactly once
    # — but its orientation is by (degree, id), not by id, so match
    # either direction of the id-ordered wedge pair.
    w1 = oriented.select(F.col("u"), F.col("v"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    wedges = w1.join(w2, "u").filter(F.col("v") < F.col("w")).select("v", "w")
    closing = oriented.select(
        F.least("u", "v").alias("v"), F.greatest("u", "v").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"], "inner")
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over the DISTINCT directed edge set
    (self-loops dropped). Returns (vertex, rank) for every vertex that
    appears as an endpoint.

    Semantics (pinned, oracle-matched): rank⁰ = 1/N for all N vertices;
    rankᵏ⁺¹(v) = (1−d)/N + d·Σ_{u→v} rankᵏ(u)/outdeg(u). Dangling
    vertices (no out-edges) leak their mass — no redistribution — which
    keeps each iteration a single join+agg and makes the computation
    exactly expressible as an unrolled SQL CTE chain for the oracle.

    Scale shape: the (edge ⋈ outdeg) relation is loop-invariant — built
    once, persisted, reused every iteration. Each iteration is one
    shuffle join on src plus one groupBy(dst); ``localCheckpoint`` (same
    pattern as linking.connected_components) truncates the lineage so the
    plan stays O(1) deep regardless of n_iter. N is the only scalar
    collected to the driver.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        out = verts.withColumn("rank", F.lit(0.0)).localCheckpoint(eager=True)
        verts.unpersist()
        return out
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("_outdeg"))
    # loop-invariant: each edge annotated with its source's out-degree
    e_w = e.join(outd, "src").persist()

    # iteration-0 ranks share lineage with verts/e_w; checkpoint so every
    # join below is between independent plans (no ambiguous-attribute
    # self-join hazards) and the loop body is uniform.
    ranks = verts.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contribs = (
            e_w.join(ranks, F.col("src") == F.col("vertex"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_outdeg")).alias("_c"))
            .select(F.col("dst").alias("_dv"), F.col("_c"))
        )
        ranks = (
            verts.join(contribs, F.col("vertex") == F.col("_dv"), "left")
            .select(
                "vertex",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    e_w.unpersist()
    verts.unpersist()
    return ranks


def label_propagation(
    edges: DataFrame,
    n_iter: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation over the undirected simple graph:
    every vertex starts labeled with its own id; each iteration every
    vertex adopts the most frequent label among its neighbors, ties
    broken by smallest label — fully deterministic for any fixed
    ``n_iter`` (synchronous LPA can oscillate, so convergence is NOT the
    contract; the fixed-round result is). Returns (vertex, label).

    Community structure surfaces after 1-2 rounds; the pipeline uses it
    as a cheap blocking key upstream of the exact connected-components
    pass (linking.connected_components).

    Scale shape: one bidirectional neighbor relation built once and
    persisted; each round is a shuffle join on the neighbor id, a
    (vertex, label) count, and a window argmax per vertex — all key-hashed
    on vertex ids. ``localCheckpoint`` per round truncates lineage, same
    as pagerank/connected_components.
    """
    from pyspark.sql.window import Window

    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = undirected_simple_edges(edges, src, dst)
    nbrs = (
        e.select(F.col("a").alias("v"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("v"), F.col("a").alias("nbr")))
        .persist()
    )
    labels = nbrs.select(F.col("v").alias("vertex")).distinct().withColumn(
        "label", F.col("vertex")
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("v").orderBy(F.desc("_c"), F.asc("label"))
    for _ in range(n_iter):
        labels = (
            nbrs.join(labels, F.col("nbr") == F.col("vertex"))
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("v").alias("vertex"), "label")
            .localCheckpoint(eager=True)
        )
    nbrs.unpersist()
    return labels


def khop_reachability(
    edges: DataFrame,
    sources: list,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Directed k-hop reachability from a seed set: (vertex, hops) where
    ``hops`` is the MINIMUM number of edges from any seed (0 for the
    seeds themselves), bounded by ``k``.

    Frontier BFS, the iterative pattern the rest of the graph suite
    doesn't exercise (pointer doubling = connected_components, fixed
    rounds = pagerank/LPA): each round expands only the NEW frontier —
    one join keyed on src, a distinct, and an anti-join against the
    reached set — so a vertex is visited exactly once, at its minimum
    hop. localCheckpoint per round truncates lineage; the deduped edge
    relation is built once and persisted. Frontier size is bounded by
    the vertex set, never the path count (a recursive-CTE formulation
    enumerates paths and blows up on dense graphs; BFS doesn't).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .persist()
    )
    reached = spark.createDataFrame(
        [(int(v),) for v in sources], "vertex bigint"
    ).distinct().withColumn("hops", F.lit(0)).localCheckpoint(eager=True)
    frontier = reached.select("vertex")
    for i in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["vertex"] == e["_s"])
            .select(F.col("_d").alias("vertex"))
            .distinct()
            .join(reached.select("vertex"), "vertex", "left_anti")
            .withColumn("hops", F.lit(i))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("vertex")
    e.unpersist()
    return reached


def predicate_statistics(triples: DataFrame) -> DataFrame:
    """Planner-style statistics over the triples relation: per predicate,
    the triple count, distinct subject/object counts, and the average
    out-fanout in integer micro-units (n_triples/ndv_subj — the number a
    BGP join-order heuristic actually wants). ONE shuffle (groupBy pred
    with count + two count_distinct partial aggregates); at 10^12 rows
    swap count_distinct for approx_count_distinct and keep the plan.

    This is the stats-collection pass a production deployment schedules
    after each merge — bgp_query's most-constant-first ordering is the
    static heuristic; these are the numbers that would replace it."""
    return (
        triples.groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_triples"),
            F.countDistinct("subj").cast("bigint").alias("ndv_subj"),
            F.countDistinct("obj").cast("bigint").alias("ndv_obj"),
        )
        .withColumn(
            "fanout_micro",
            # integer `div`: identical semantics to DuckDB's `//` (float
            # division + cast disagrees between engines at .5 boundaries)
            F.expr("(n_triples * 1000000) div ndv_subj").cast("bigint"),
        )
    )


def neighborhood_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_fanout: int = 1000,
    min_shared: int = 1,
) -> DataFrame:
    """Structural entity resolution: Jaccard similarity of UNDIRECTED
    neighborhoods — vertex pairs sharing many neighbors are duplicate /
    near-duplicate entity candidates (the graph-side complement of the
    value-based owl:sameAs rules in inference.py).

    Returns (node1, node2, shared, union_size, jaccard_pct) with
    node1 < node2; ``jaccard_pct`` = ``(10000 * shared) div union_size``
    (integer basis-point arithmetic — identical across engines, no
    float-formatting drift).

    Scale shape: candidate pairs are generated by CO-NEIGHBOR blocking
    (self-join inside each neighbor's adjacency list), never all-pairs.
    Neighbors with more than ``max_fanout`` adjacent vertices are
    dropped from the blocking step — a hub (it would contribute
    O(fanout²) pairs) says little about the similarity of two of its
    spokes; this is the same junk-block hygiene as the hasKey value cap
    and the MinHash mega-bucket rule. Degrees still count dropped hubs,
    so the Jaccard DENOMINATOR is exact; only pairs whose every shared
    neighbor is a hub are missed (documented recall bound)."""
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    rev = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    nbrs = fwd.unionByName(rev).filter(F.col("node") != F.col("nbr")).distinct()

    deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    fanout = nbrs.groupBy("nbr").agg(F.count(F.lit(1)).alias("_fan"))
    blocked = nbrs.join(
        fanout.filter(F.col("_fan") <= max_fanout).select("nbr"), "nbr"
    )

    a, b = blocked.alias("a"), blocked.alias("b")
    shared = (
        a.join(b, "nbr")
        .filter(F.col("a.node") < F.col("b.node"))
        .groupBy(F.col("a.node").alias("node1"), F.col("b.node").alias("node2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    d1 = deg.select(F.col("node").alias("node1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("node").alias("node2"), F.col("deg").alias("deg2"))
    return (
        shared.join(d1, "node1")
        .join(d2, "node2")
        .select(
            "node1", "node2", "shared",
            (F.col("deg1") + F.col("deg2") - F.col("shared"))
            .cast("bigint").alias("union_size"),
            F.expr("(10000 * shared) div (deg1 + deg2 - shared)")
            .cast("bigint").alias("jaccard_pct"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 100,
) -> DataFrame:
    """Vertices of the k-core: iteratively peel vertices with undirected
    degree < k until a fixed point. Returns (node, core_degree) — the
    vertex's degree WITHIN the final core. The classic web-KG denoiser:
    spam link farms and boilerplate stubs fall out of low cores while
    densely attested entities survive.

    Scale shape: each round is one degree aggregation plus two left-semi
    joins (both endpoints must survive) — vertex-set-bounded like BFS;
    the number of rounds is the peeling depth, not the vertex count in
    practice, and every round ends with an eager localCheckpoint so
    lineage never grows."""
    und = undirected_simple_edges(edges, src, dst)
    # symmetric adjacency: one row per (node, nbr) direction
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    ).localCheckpoint(eager=True)
    n = adj.count()
    for _ in range(max_iters):
        keep = (
            adj.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("node")
        )
        nxt = (
            adj.join(keep, "node", "left_semi")
            .join(keep.select(F.col("node").alias("nbr")), "nbr", "left_semi")
            .localCheckpoint(eager=True)
        )
        n2 = nxt.count()
        adj = nxt
        if n2 == n:
            break
        n = n2
    return adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


def random_walks(
    edges: DataFrame,
    walk_length: int,
    num_walks: int = 1,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic hash-seeded random walks — the DeepWalk/node2vec
    corpus-generation step. One walk row per (start vertex × walk_no):
    (walk_id, start, walk, n_steps) with ``walk`` the '->'-joined node
    sequence. Walks follow edge DIRECTION (pass a symmetrized edge set
    for undirected semantics) and stop early at sinks.

    Determinism instead of RNG: step i of walk w moves to
    ``nbrs[md5int(w ':' i ':' cur) % |nbrs|]`` where md5int is the
    engine-portable ``conv(substring(md5(x),1,8),16,10)`` — identical
    results on any partitioning, any retry, and in the DuckDB oracle
    (``('0x'||substr(md5(x),1,8))::UBIGINT``). Neighbor lists are sorted
    and hubs are capped at ``max_degree`` by md5 rank (a deterministic
    uniform sample — an uncapped 10^6-degree hub would make one
    adjacency row carry megabytes).

    Scale shape: one window + one collect_list for the adjacency, then
    ``walk_length`` equi-joins of the walker frontier (|V|·num_walks
    rows) against the adjacency relation, localCheckpoint per step so
    the loop's lineage stays flat."""
    from pyspark.sql import Window

    nbrs = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")).distinct()
    rk = Window.partitionBy("node").orderBy(F.md5("nbr"))
    adj = (
        nbrs.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") <= max_degree)
        .groupBy("node")
        .agg(F.sort_array(F.collect_list("nbr")).alias("nbrs"))
    )

    starts = adj.select(F.col("node").alias("start"))
    walks = None
    for w in range(num_walks):
        part = starts.select(
            F.concat(F.col("start"), F.lit(f"#{w}")).alias("walk_id"), "start"
        )
        walks = part if walks is None else walks.unionByName(part)
    frontier = walks.select(
        "walk_id", "start",
        F.col("start").alias("cur"),
        F.array(F.col("start")).alias("path"),
    ).localCheckpoint(eager=True)

    for i in range(1, walk_length + 1):
        j = frontier.join(adj, frontier.cur == adj.node, "left")
        nxt = F.when(
            F.col("nbrs").isNotNull(),
            F.element_at(
                F.col("nbrs"),
                (F.expr(
                    f"cast(conv(substring(md5(concat(walk_id, ':', '{i}', ':', cur)),1,8),16,10) as bigint)"
                ) % F.size("nbrs") + 1).cast("int"),
            ),
        )
        frontier = j.select(
            "walk_id", "start",
            F.coalesce(nxt, F.col("cur")).alias("cur"),
            F.when(nxt.isNotNull(), F.concat(F.col("path"), F.array(nxt)))
             .otherwise(F.col("path")).alias("path"),
        ).localCheckpoint(eager=True)

    return frontier.select(
        "walk_id", "start",
        F.array_join("path", "->").alias("walk"),
        (F.size("path") - 1).cast("bigint").alias("n_steps"),
    )


VOID_NS = "http://rdfs.org/ns/void#"
RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"


def void_description(triples: DataFrame, dataset_iri: str,
                     type_iri: str = RDF_TYPE_IRI,
                     stats: DataFrame | None = None) -> DataFrame:
    """VoID dataset description — the KG described AS RDF (the W3C
    vocabulary downstream catalogs consume): dataset-level void:triples /
    void:properties / void:classes / void:distinctSubjects /
    void:distinctObjects / void:entities (distinct typed subjects), one
    void:propertyPartition per predicate (void:property + void:triples)
    and one void:classPartition per class (void:class + void:entities).
    ``type_iri`` overrides the rdf:type predicate for KGs using a
    shorthand vocabulary.
    Returns full-schema triples rows (doc_url = the dataset IRI) ready
    for any of the serializers, so `to_turtle_docs(void_description(t,
    d))` is a publishable dataset descriptor.

    Partition node IRIs are ``<dataset>/prop/<md5(pred)>`` and
    ``<dataset>/class/<md5(cls)>`` — deterministic, collision-free, and
    independent of row order. Scale shape: one groupBy(pred), one
    filtered groupBy(class), and one global aggregate — the same
    shuffles as predicate_statistics.

    ``stats``: a :func:`predicate_statistics` output for the SAME
    relation. When given, the per-predicate groupBy and the
    void:triples / void:properties totals come from the (tiny) stats
    table instead of re-scanning triples — the production deployment
    already schedules a stats pass after each merge, so the descriptor
    rides it for free (one full scan + one wide shuffle saved). Output
    is row-identical either way (pinned in pytest)."""
    def row(subj, pred, kind, value, dt=None):
        return F.struct(
            F.lit(dataset_iri).alias("doc_url"),
            F.lit(None).cast("string").alias("graph"),
            subj.alias("subj") if isinstance(subj, Column) else F.lit(subj).alias("subj"),
            F.lit(pred).alias("pred"),
            F.lit(kind).alias("obj_kind"),
            value.alias("obj_value") if isinstance(value, Column) else F.lit(value).alias("obj_value"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(dt).cast("string").alias("obj_datatype"),
            F.lit(0).cast("int").alias("line_no"),
        )

    def cnt(col):
        return col.cast("string")

    ds = dataset_iri
    if "obj_value" not in triples.columns:
        # bare (subj, pred, obj) relations are accepted like inference.py
        triples = triples.withColumn("obj_value", F.col("obj"))
    if stats is None:
        per_pred = triples.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))
        totals_src = triples.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("pred").alias("np"),
            F.countDistinct("subj").alias("ns"),
            F.countDistinct("obj_value").alias("no"),
            F.countDistinct(
                F.when(F.col("pred") == type_iri, F.col("subj"))
            ).alias("ne"),
            F.countDistinct(
                F.when(F.col("pred") == type_iri, F.col("obj_value"))
            ).alias("nc"),
        )
    else:
        per_pred = stats.select("pred", F.col("n_triples").alias("n"))
        # n / np fold over the tiny stats table; the distinct counts are
        # not derivable from per-predicate NDVs and still scan triples —
        # but only ONCE now (1-row × 1-row cross join stitches them)
        totals_src = triples.agg(
            F.countDistinct("subj").alias("ns"),
            F.countDistinct("obj_value").alias("no"),
            F.countDistinct(
                F.when(F.col("pred") == type_iri, F.col("subj"))
            ).alias("ne"),
            F.countDistinct(
                F.when(F.col("pred") == type_iri, F.col("obj_value"))
            ).alias("nc"),
        ).crossJoin(per_pred.agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("np"),
        ))
    totals = totals_src.select(
        F.explode(F.array(
            row(ds, RDF_TYPE_IRI, "iri", VOID_NS + "Dataset"),
            row(ds, VOID_NS + "triples", "literal", cnt(F.col("n")), XSD_INTEGER),
            row(ds, VOID_NS + "properties", "literal", cnt(F.col("np")), XSD_INTEGER),
            row(ds, VOID_NS + "distinctSubjects", "literal", cnt(F.col("ns")), XSD_INTEGER),
            row(ds, VOID_NS + "distinctObjects", "literal", cnt(F.col("no")), XSD_INTEGER),
            row(ds, VOID_NS + "entities", "literal", cnt(F.col("ne")), XSD_INTEGER),
            row(ds, VOID_NS + "classes", "literal", cnt(F.col("nc")), XSD_INTEGER),
        )).alias("t")
    ).select("t.*")

    pp_node = F.concat(F.lit(ds + "/prop/"), F.md5("pred"))
    props = per_pred.select(
        F.explode(F.array(
            row(F.lit(ds), VOID_NS + "propertyPartition", "iri", pp_node),
            row(pp_node, VOID_NS + "property", "iri", F.col("pred")),
            row(pp_node, VOID_NS + "triples", "literal", cnt(F.col("n")), XSD_INTEGER),
        )).alias("t")
    ).select("t.*")

    cp_node = F.concat(F.lit(ds + "/class/"), F.md5("obj_value"))
    classes = (
        triples.filter(F.col("pred") == type_iri)
        .groupBy("obj_value")
        .agg(F.countDistinct("subj").alias("n"))
        .select(
            F.explode(F.array(
                row(F.lit(ds), VOID_NS + "classPartition", "iri", cp_node),
                row(cp_node, VOID_NS + "class", "iri", F.col("obj_value")),
                row(cp_node, VOID_NS + "entities", "literal", cnt(F.col("n")), XSD_INTEGER),
            )).alias("t")
        ).select("t.*")
    )
    return totals.unionByName(props).unionByName(classes)


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank: random-walk-with-restart relevance to a
    SEED set — "which entities matter most from these starting points",
    the KG-recommendation / local-relevance primitive global PageRank
    can't answer. Returns (vertex, rank) for every endpoint vertex.

    Semantics (pinned, oracle-matched like :func:`pagerank`):
    tele(v) = 1/|S| for seeds else 0; rank⁰ = tele;
    rankᵏ⁺¹(v) = (1−d)·tele(v) + d·Σ_{u→v} rankᵏ(u)/outdeg(u).
    Dangling mass leaks, keeping each iteration one join+agg and the
    whole computation expressible as an unrolled SQL CTE chain.

    Scale shape identical to :func:`pagerank`: loop-invariant
    edge⋈outdeg persisted once, one shuffle join + one groupBy per
    iteration, localCheckpoint per round, |S| the only driver-side
    value."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    uniq = sorted(set(seeds))
    if not uniq:
        raise ValueError("personalized_pagerank needs >= 1 seed")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )
    tele = 1.0 / len(uniq)
    spark = edges.sparkSession
    seeds_df = spark.createDataFrame(
        [(v, tele) for v in uniq], ["_sv", "_tele"]
    )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("_outdeg"))
    e_w = e.join(outd, "src").persist()

    ranks = (
        verts.join(F.broadcast(seeds_df), verts["vertex"] == F.col("_sv"), "left")
        .select("vertex", F.coalesce(F.col("_tele"), F.lit(0.0)).alias("rank"))
        .localCheckpoint(eager=True)
    )
    one_minus_d = 1.0 - damping
    for _ in range(n_iter):
        contribs = (
            e_w.join(ranks, F.col("src") == F.col("vertex"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_outdeg")).alias("_c"))
            .select(F.col("dst").alias("_dv"), F.col("_c"))
        )
        ranks = (
            verts.join(F.broadcast(seeds_df), verts["vertex"] == F.col("_sv"), "left")
            .join(contribs, F.col("vertex") == F.col("_dv"), "left")
            .select(
                "vertex",
                (F.lit(one_minus_d) * F.coalesce(F.col("_tele"), F.lit(0.0))
                 + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e_w.unpersist()
    verts.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    n_iter: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities, UNNORMALIZED INTEGER form: h⁰ = 1 for
    every vertex; aᵏ⁺¹(v) = Σ_{u→v} hᵏ(u); hᵏ⁺¹(u) = Σ_{u→v} aᵏ⁺¹(v).
    Without the usual L2 normalization the scores are exact path counts
    (bigints — no floating-point at all), so rankings are identical to
    normalized HITS at every iteration and the computation is
    bit-exactly reproducible on any engine; callers normalize for
    display if they want unit vectors. Good hubs (point at many good
    authorities) and good authorities (pointed at by many good hubs)
    emerge in 2-3 iterations on web-shaped graphs.

    Scale shape: per iteration one join+agg for the authority pass and
    one for the hub pass over the distinct edge relation (persisted,
    loop-invariant), localCheckpoint per round."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    hubs = verts.withColumn("hub", F.lit(1).cast("bigint")).localCheckpoint(eager=True)
    auths = None
    for _ in range(n_iter):
        a_sum = (
            e.join(hubs, F.col("src") == F.col("vertex"))
            .groupBy("dst").agg(F.sum("hub").alias("_a"))
            .select(F.col("dst").alias("_av"), "_a")
        )
        auths = (
            verts.join(a_sum, F.col("vertex") == F.col("_av"), "left")
            .select("vertex",
                    F.coalesce(F.col("_a"), F.lit(0)).cast("bigint").alias("auth"))
            .localCheckpoint(eager=True)
        )
        h_sum = (
            e.join(auths, F.col("dst") == F.col("vertex"))
            .groupBy("src").agg(F.sum("auth").alias("_h"))
            .select(F.col("src").alias("_hv"), "_h")
        )
        hubs = (
            verts.join(h_sum, F.col("vertex") == F.col("_hv"), "left")
            .select("vertex",
                    F.coalesce(F.col("_h"), F.lit(0)).cast("bigint").alias("hub"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return hubs.join(auths, "vertex").select("vertex", "hub", "auth")


def to_property_graph(
    triples: DataFrame, type_pred: str = RDF_TYPE_IRI
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """RDF → labeled-property-graph projection (the mapping
    property-graph engines and GNN feature pipelines consume; the
    neosemantics-style contract):

    - ``vertices (id, label)`` — one row per distinct type assertion;
    - ``vertex_props (id, key, value)`` — literal-object triples become
      vertex properties (lexical form; one row per distinct value);
    - ``edges (src, label, dst)`` — IRI/bnode-object, non-type triples
      become typed edges.

    Needs the full triples schema (term kinds decide property vs edge).
    Scale shape: three filtered map-only projections + per-output
    distinct — no joins; the distincts collapse cross-document
    re-assertions (RDF graphs are sets)."""
    if "obj_kind" not in triples.columns:
        raise ValueError(
            "to_property_graph needs the full triples schema (obj_kind)"
        )
    vertices = (
        triples.where(
            (F.col("pred") == type_pred) & (F.col("obj_kind") == "iri")
        )
        .select(F.col("subj").alias("id"), F.col("obj_value").alias("label"))
        .distinct()
    )
    vertex_props = (
        triples.where(
            (F.col("obj_kind") == "literal") & (F.col("pred") != type_pred)
        )
        .select(
            F.col("subj").alias("id"),
            F.col("pred").alias("key"),
            F.col("obj_value").alias("value"),
        )
        .distinct()
    )
    edges = (
        triples.where(
            F.col("obj_kind").isin("iri", "bnode")
            & (F.col("pred") != type_pred)
        )
        .select(
            F.col("subj").alias("src"),
            F.col("pred").alias("label"),
            F.col("obj_value").alias("dst"),
        )
        .distinct()
    )
    return vertices, vertex_props, edges
