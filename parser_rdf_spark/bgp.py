"""Basic-graph-pattern (SPARQL-style) query compiler over the triples
relation.

The reference is a parser that EMITS triples (reference:
src/RdfParser.php:111-125); the natural query workload over the
constructed KG is a conjunction of triple patterns — SPARQL's BGP core.
This module compiles a pattern list into a DataFrame plan of self-joins
over ONE triples table, which is exactly the shape Catalyst optimizes
well:

* a constant in a pattern position becomes a ``filter`` that reaches the
  parquet scan as a pushed-down predicate (and, on the materialized edge
  table of :mod:`.materialize`, a constant predicate prunes
  ``pred_bucket`` partitions outright);
* each shared variable becomes an equi-join key — the self-joins shuffle
  on the variable's column, and AQE broadcast-converts the selective
  sides at runtime (constant-rich patterns scan few rows);
* OPTIONAL blocks are left outer joins, FILTERs are Column expressions
  applied after binding (Catalyst pushes them to the earliest join that
  binds their variables).

At 100 TB the plan is N-1 shuffles for N patterns in the worst case, and
fewer in practice: AQE turns every selective pattern into a broadcast
probe, and patterns sharing their join variable reuse the exchange.
No Python runs per row — the compiler only builds Column expressions.

Pattern syntax: a pattern is a ``(subject, predicate, object)`` string
triple; a term starting with ``?`` is a variable, anything else is a
constant matched verbatim against the triples columns. A variable
repeated inside one pattern constrains equality (``(?x, knows, ?x)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("subj", "pred", "obj")


def triples_spo(triples: DataFrame) -> DataFrame:
    """Project the engine's full triples schema (schemas.TRIPLES) to the
    generic (subj, pred, obj) relation the compiler queries: object IRIs,
    bnode labels and literal lexical forms all land in ``obj``."""
    return triples.select("subj", "pred", F.col("obj_value").alias("obj"))


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _var_name(term: str) -> str:
    name = term[1:]
    if not name:
        raise ValueError("empty variable name '?'")
    return name


def _pattern_scan(triples: DataFrame, pattern: tuple[str, str, str]) -> tuple[DataFrame, set[str]]:
    """One pattern → a filtered projection of the triples relation with
    variable-named columns. Returns (scan, bound_variable_names)."""
    if len(pattern) != 3:
        raise ValueError(f"pattern must be (subj, pred, obj): {pattern!r}")
    scan = triples
    cols: dict[str, F.Column] = {}
    for pos, term in zip(_POSITIONS, pattern):
        if _is_var(term):
            name = _var_name(term)
            if name in cols:
                # repeated variable inside one pattern: equality constraint
                scan = scan.filter(F.col(pos) == cols[name])
            else:
                cols[name] = F.col(pos)
        else:
            scan = scan.filter(F.col(pos) == F.lit(term))
    if not cols:
        # fully-constant pattern: an existence test; bind a constant-free
        # marker column so the join below degenerates to a cross with a
        # 0-or-1-row side (AQE broadcasts it)
        return scan.select(F.lit(1).alias("__exists")).limit(1), set()
    return scan.select(*[c.alias(n) for n, c in cols.items()]), set(cols)


def _join_patterns(
    acc: DataFrame | None,
    bound: set[str],
    scan: DataFrame,
    scan_vars: set[str],
    how: str,
) -> tuple[DataFrame, set[str]]:
    if acc is None:
        return scan, set(scan_vars)
    shared = sorted(bound & scan_vars)
    if shared:
        joined = acc.join(scan, on=shared, how=how)
    elif not scan_vars:
        # existence-test pattern: a 0-or-1-row guard; the broadcast cross
        # is free and filters everything when the triple is absent
        joined = acc.crossJoin(F.broadcast(scan)).drop("__exists")
        return joined, bound
    else:
        # disconnected pattern groups: genuine cross product (SPARQL
        # semantics); rare and intentional, so make it explicit
        joined = acc.crossJoin(scan)
    return joined, bound | scan_vars


def bgp_query(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]] | None = None,
    filters: list[str] | None = None,
    select: list[str] | None = None,
    distinct: bool = False,
    order_by: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Compile a basic graph pattern to a DataFrame over ``triples``.

    ``triples`` must expose (subj, pred, obj) string columns — use
    :func:`triples_spo` to adapt the engine's full parse schema.

    ``patterns`` are required (inner-joined); ``optional`` patterns are
    left-joined after all required ones (unbound → NULL, SPARQL
    OPTIONAL); ``filters`` are SQL boolean expressions over variable
    names (SPARQL FILTER); ``select`` projects a subset of variables
    (``?``-prefixed or bare names accepted).

    Join order: required patterns are joined most-constant-first (a
    cheap selectivity proxy — every constant is a pushed-down equality
    on the scan), with ties kept in user order; AQE re-plans the
    physical side at runtime, so this only needs to be roughly right.
    """
    if not patterns:
        raise ValueError("at least one required pattern")

    def n_constants(p: tuple[str, str, str]) -> int:
        return sum(0 if _is_var(t) else 1 for t in p)

    ordered = sorted(
        enumerate(patterns), key=lambda ip: (-n_constants(ip[1]), ip[0])
    )

    acc: DataFrame | None = None
    bound: set[str] = set()
    for _, pat in ordered:
        scan, scan_vars = _pattern_scan(triples, pat)
        acc, bound = _join_patterns(acc, bound, scan, scan_vars, "inner")

    for pat in optional or []:
        scan, scan_vars = _pattern_scan(triples, pat)
        new_vars = scan_vars - bound
        if not (scan_vars & bound):
            raise ValueError(
                f"OPTIONAL pattern {pat!r} shares no variable with the "
                "required patterns; its left join would be a cross product"
            )
        acc, bound = _join_patterns(acc, bound, scan, scan_vars, "left")
        bound |= new_vars

    assert acc is not None
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))

    if select:
        names = [_var_name(s) if _is_var(s) else s for s in select]
        missing = [n for n in names if n not in bound]
        if missing:
            raise ValueError(f"select references unbound variables: {missing}")
        acc = acc.select(*names)
    elif bound:
        acc = acc.select(*sorted(bound))

    if distinct:
        acc = acc.distinct()
    if order_by:
        acc = acc.orderBy(*[_var_name(o) if _is_var(o) else o for o in order_by])
    if limit is not None:
        acc = acc.limit(limit)
    return acc
