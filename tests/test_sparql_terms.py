"""Term-encoded SPARQL mode (sparql_query(term_mode=True) over
bgp.terms_spo): the relation carries one canonical N-Triples string per
term, constants render the same way, and the SPARQL term builtins
compile to pure string SQL. Covers the builtin matrix, term-identity
matching, numeric value comparison over typed literals, the literal
escape round-trip, and the documented out-of-scope raises."""

import pytest

from parser_rdf_spark import schemas
from parser_rdf_spark.bgp import terms_spo
from parser_rdf_spark.sparql import SparqlError, sparql_query

XSD = "http://www.w3.org/2001/XMLSchema#"
EX = "http://ex.org/"

ROWS = [
    # (doc_url, graph, subj, pred, obj_kind, obj_value, obj_lang, obj_dt, line)
    ("d", None, EX + "a", EX + "name", "literal", "Alice", "en", None, 1),
    ("d", None, EX + "a", EX + "name", "literal", "Alicia", "fr", None, 2),
    ("d", None, EX + "b", EX + "name", "literal", "Bob", None, None, 3),
    ("d", None, EX + "c", EX + "name", "literal", "Cam", "en-GB", None, 4),
    ("d", None, EX + "a", EX + "age", "literal", "42", None, XSD + "integer", 5),
    ("d", None, EX + "b", EX + "age", "literal", "17.5", None, XSD + "decimal", 6),
    ("d", None, EX + "c", EX + "age", "literal", "old", None, XSD + "string", 7),
    ("d", None, EX + "a", EX + "knows", "iri", EX + "b", None, None, 8),
    ("d", None, EX + "b", EX + "note", "bnode", "_:n1", None, None, 9),
    ("d", None, EX + "a", EX + "quote", "literal", 'say "hi"\\now\tend', None, None, 10),
    # a literal whose lexical form COLLIDES with an IRI object in the
    # kind-collapsed relation — term mode must keep them apart
    ("d", None, EX + "x", EX + "ref", "literal", EX + "b", None, None, 11),
]


@pytest.fixture(scope="module")
def enc(spark):
    df = spark.createDataFrame(ROWS, schema=schemas.TRIPLES)
    return terms_spo(df).cache()


def _q(enc, text):
    return sparql_query(enc, text, term_mode=True)


def _vals(enc, text, col=None):
    rows = _q(enc, text).collect()
    if col is None:
        col = rows[0].__fields__[0] if rows else None
    return sorted(r[col] for r in rows)


# ---------------------------------------------------------------------------
# encoding + term-identity matching
# ---------------------------------------------------------------------------

def test_terms_spo_rendering(enc):
    got = {r.obj for r in enc.collect()}
    assert '"Alice"@en' in got
    assert '"Bob"' in got
    assert f'"42"^^<{XSD}integer>' in got
    assert f"<{EX}b>" in got
    assert "_:n1" in got
    assert '"say \\"hi\\"\\\\now\\tend"' in got


def test_constant_literal_with_langtag_matches(enc):
    assert _vals(enc, f'SELECT ?s WHERE {{ ?s <{EX}name> "Alice"@en }}') \
        == [f"<{EX}a>"]
    # same lexical form, no tag → no match (term identity, not lexical)
    assert _vals(enc, f'SELECT ?s WHERE {{ ?s <{EX}name> "Alice" }}') == []


def test_typed_literal_and_bare_number_match(enc):
    got = _vals(enc, f'SELECT ?s WHERE {{ ?s <{EX}age> 42 }}')
    assert got == [f"<{EX}a>"]  # bare 42 = "42"^^xsd:integer (grammar abbrev)
    got = _vals(enc, f'SELECT ?s WHERE {{ ?s <{EX}age> "42"^^<{XSD}integer> }}')
    assert got == [f"<{EX}a>"]


def test_iri_vs_literal_collision_kept_apart(enc):
    # obj "http://ex.org/b" as literal vs <http://ex.org/b> as IRI
    got = _vals(enc, f'SELECT ?s WHERE {{ ?s ?p <{EX}b> }}')
    assert got == [f"<{EX}a>"]          # only the ex:knows IRI object
    got = _vals(enc, f'SELECT ?s WHERE {{ ?s ?p "{EX}b" }}')
    assert got == [f"<{EX}x>"]          # only the literal twin


# ---------------------------------------------------------------------------
# term builtins
# ---------------------------------------------------------------------------

def test_lang_and_langmatches(enc):
    q = (f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . '
         f'FILTER(LANG(?n) = "en") }}')
    assert _vals(enc, q) == [f"<{EX}a>"]
    q = (f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . '
         f'FILTER(langMatches(LANG(?n), "en")) }}')
    assert _vals(enc, q) == sorted([f"<{EX}a>", f"<{EX}c>"])  # en, en-GB
    q = (f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . '
         f'FILTER(langMatches(LANG(?n), "*")) }}')
    assert len(_vals(enc, q)) == 3      # every tagged literal, not "Bob"


def test_datatype(enc):
    q = (f'SELECT ?s WHERE {{ ?s <{EX}age> ?a . '
         f'FILTER(DATATYPE(?a) = <{XSD}decimal>) }}')
    assert _vals(enc, q) == [f"<{EX}b>"]
    # plain literal → xsd:string; lang literal → rdf:langString
    q = (f'SELECT (DATATYPE(?n) AS ?dt) WHERE {{ <{EX}b> <{EX}name> ?n }}')
    assert _vals(enc, q) == [f"<{XSD}string>"]
    q = (f'SELECT (DATATYPE(?n) AS ?dt) WHERE {{ <{EX}a> <{EX}name> ?n . '
         f'FILTER(LANG(?n) = "en") }}')
    assert _vals(enc, q) == \
        ["<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>"]


def test_is_kind_checks(enc):
    q = 'SELECT ?o WHERE { ?s ?p ?o . FILTER(isBlank(?o)) }'
    assert _vals(enc, q) == ["_:n1"]
    q = f'SELECT ?o WHERE {{ ?s <{EX}knows> ?o . FILTER(isIRI(?o)) }}'
    assert _vals(enc, q) == [f"<{EX}b>"]
    q = 'SELECT (COUNT(?o) AS ?n) WHERE { ?s ?p ?o . FILTER(isLiteral(?o)) }'
    assert _vals(enc, q, "n") == [9]


def test_isnumeric_checks_datatype_and_lexical(enc):
    q = f'SELECT ?s WHERE {{ ?s <{EX}age> ?a . FILTER(isNumeric(?a)) }}'
    # "old"^^xsd:string fails the datatype gate; 42 and 17.5 pass
    assert _vals(enc, q) == sorted([f"<{EX}a>", f"<{EX}b>"])


def test_numeric_comparison_over_typed_literals(enc):
    q = f'SELECT ?s WHERE {{ ?s <{EX}age> ?a . FILTER(?a > 20) }}'
    assert _vals(enc, q) == [f"<{EX}a>"]
    q = f'SELECT ?s WHERE {{ ?s <{EX}age> ?a . FILTER(?a * 2 < 40) }}'
    assert _vals(enc, q) == [f"<{EX}b>"]


def test_str_strips_encoding_and_unescapes(enc):
    q = f'SELECT (STR(?o) AS ?lex) WHERE {{ <{EX}a> <{EX}quote> ?o }}'
    assert _vals(enc, q) == ['say "hi"\\now\tend']
    q = f'SELECT (STR(?s) AS ?lex) WHERE {{ ?s <{EX}quote> ?o }}'
    assert _vals(enc, q) == [EX + "a"]


def test_string_functions_auto_lex(enc):
    q = (f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . '
         f'FILTER(STRSTARTS(?n, "Ali")) }}')
    assert _vals(enc, q) == [f"<{EX}a>", f"<{EX}a>"]  # Alice@en, Alicia@fr
    q = (f'SELECT (UCASE(?n) AS ?u) WHERE {{ <{EX}b> <{EX}name> ?n }}')
    assert _vals(enc, q) == ["BOB"]
    q = (f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . FILTER(REGEX(?n, "^B")) }}')
    assert _vals(enc, q) == [f"<{EX}b>"]


def test_sameterm_and_equality_encode_str_side(enc):
    q = (f'SELECT ?s WHERE {{ ?s <{EX}name> ?n1 . ?s <{EX}name> ?n2 . '
         f'FILTER(!sameTerm(?n1, ?n2)) }}')
    assert _vals(enc, q) == [f"<{EX}a>", f"<{EX}a>"]  # the two a-names, both orders
    # = against a plain string compares as a simple-literal term
    q = f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . FILTER(?n = "Bob") }}'
    assert _vals(enc, q) == [f"<{EX}b>"]
    q = f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . FILTER(STR(?n) = "Alice") }}'
    assert _vals(enc, q) == [f"<{EX}a>"]


def test_strlang_strdt_iri_constructors(enc):
    q = (f'SELECT (STRLANG(STR(?n), "de") AS ?t) '
         f'WHERE {{ <{EX}b> <{EX}name> ?n }}')
    assert _vals(enc, q) == ['"Bob"@de']
    q = (f'SELECT (STRDT(STR(?a), <{XSD}byte>) AS ?t) '
         f'WHERE {{ <{EX}a> <{EX}age> ?a }}')
    assert _vals(enc, q) == [f'"42"^^<{XSD}byte>']
    q = (f'SELECT ?s WHERE {{ ?s <{EX}knows> ?o . '
         f'FILTER(?o = IRI(CONCAT("{EX}", "b"))) }}')
    assert _vals(enc, q) == [f"<{EX}a>"]


def test_equality_with_escaped_computed_string(enc):
    # the =/IN re-encoding of a plain-string operand applies the
    # serializer escapes — a computed value containing quote/backslash/
    # tab must match the ESCAPED stored encoding, not silently miss
    lit = '"say \\"hi\\"\\\\now\\tend"'  # SPARQL literal for: say "hi"\now<TAB>end
    q = (f'SELECT ?s WHERE {{ ?s <{EX}quote> ?o . '
         f'FILTER(?o = CONCAT({lit})) }}')
    assert _vals(enc, q) == [f"<{EX}a>"]
    q = (f'SELECT ?s WHERE {{ ?s <{EX}quote> ?o . '
         f'FILTER(?o IN (CONCAT({lit}), "zzz")) }}')
    assert _vals(enc, q) == [f"<{EX}a>"]


def test_strlang_escapes_lexical_form(enc):
    # STRLANG/STRDT rebuild the encoding from an UNESCAPED lexical form:
    # the serializer escapes must be re-applied or the result is a
    # non-canonical term that never joins/compares equal
    q = (f'SELECT (STRLANG(STR(?o), "en") AS ?t) '
         f'WHERE {{ ?s <{EX}quote> ?o }}')
    assert _vals(enc, q) == ['"say \\"hi\\"\\\\now\\tend"@en']
    q = (f'SELECT (STRDT(STR(?o), <{XSD}string>) AS ?t) '
         f'WHERE {{ ?s <{EX}quote> ?o }}')
    assert _vals(enc, q) == [f'"say \\"hi\\"\\\\now\\tend"^^<{XSD}string>']


def test_coalesce_if_preserve_terms(enc):
    # COALESCE/IF are term-returning: with all-term value branches the
    # encodings pass through unchanged, so term builtins over the result
    # classify correctly (ADVICE r04)
    q = (f'SELECT ?s WHERE {{ ?s <{EX}age> ?a . '
         f'FILTER(DATATYPE(IF(isLiteral(?a), ?a, ?s)) = <{XSD}integer>) }}')
    assert _vals(enc, q) == [f"<{EX}a>"]
    q = (f'SELECT ?s WHERE {{ ?s <{EX}knows> ?o . '
         f'FILTER(isIRI(COALESCE(?o, ?s))) }}')
    assert _vals(enc, q) == [f"<{EX}a>"]
    # mixed plain/term branches stay on the lexical path (documented)
    q = (f'SELECT ?s WHERE {{ ?s <{EX}name> ?n . '
         f'FILTER(COALESCE(STR(?n), "x") = "Bob") }}')
    assert _vals(enc, q) == [f"<{EX}b>"]


def test_bind_of_term_builtin(enc):
    q = (f'SELECT ?s ?l WHERE {{ ?s <{EX}name> ?n . '
         f'BIND(LANG(?n) AS ?l) FILTER(?l != "") }}')
    got = {(r.s, r.l) for r in _q(enc, q).collect()}
    assert got == {(f"<{EX}a>", "en"), (f"<{EX}a>", "fr"), (f"<{EX}c>", "en-GB")}


# ---------------------------------------------------------------------------
# out-of-scope raises + non-term-mode guard
# ---------------------------------------------------------------------------

def test_term_builtin_requires_term_mode(enc):
    with pytest.raises(SparqlError, match="term_mode"):
        sparql_query(enc, 'SELECT ?s WHERE { ?s ?p ?o . FILTER(isIRI(?o)) }')


def test_term_mode_rejects_bare_names_and_quoted_patterns(enc):
    with pytest.raises(SparqlError, match="bare name"):
        _q(enc, "SELECT ?s WHERE { ?s knows ?o }")
    with pytest.raises(SparqlError, match="quoted-triple"):
        _q(enc, f"SELECT ?s WHERE {{ << ?s <{EX}p> ?o >> <{EX}q> ?v }}")


def test_term_mode_rejects_quads_relation(enc, spark):
    quads = enc.withColumn("graph", enc.subj)
    with pytest.raises(SparqlError, match="terms_spo"):
        sparql_query(quads, "SELECT ?s WHERE { ?s ?p ?o }", term_mode=True)


def test_property_paths_compose_with_encoding(enc):
    q = f'SELECT ?o WHERE {{ <{EX}a> <{EX}knows>+ ?o }}'
    assert _vals(enc, q) == [f"<{EX}b>"]
    q = f'SELECT ?s WHERE {{ ?o ^<{EX}knows> ?s }}'
    assert _vals(enc, q) == [f"<{EX}a>"]


def test_materialized_encoding_pushes_filters(enc, spark, tmp_path):
    # encode-once-query-many: on a MATERIALIZED encoded relation the
    # constant predicate filter must reach the parquet scan (at 100 TB
    # this is the difference between a pruned scan and a full read)
    from parser_rdf_spark.bgp import bgp_query

    path = str(tmp_path / "enc")
    enc.write.parquet(path)
    stored = spark.read.parquet(path)
    q = bgp_query(stored, [("?s", f"<{EX}name>", "?o")], select=["?s", "?o"])
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "extended")
    assert f"PushedFilters: [IsNotNull(pred), EqualTo(pred,<{EX}name>)]" in plan


def test_term_mode_order_by_value(enc):
    # §15.1 value order: numeric literals by VALUE (17.5 < 42 despite
    # "17.5" > "42" lexically); IRIs sort before literals
    q = f'SELECT ?s ?a WHERE {{ ?s <{EX}age> ?a }} ORDER BY ?a'
    rows = _q(enc, q).collect()
    assert [r.s for r in rows] == [f"<{EX}b>", f"<{EX}a>", f"<{EX}c>"]
    q = (f'SELECT ?o WHERE {{ <{EX}a> ?p ?o . '
         f'FILTER(isIRI(?o) || isLiteral(?o)) }} ORDER BY DESC(?o) LIMIT 1')
    rows = _q(enc, q).collect()
    assert rows[0].o.startswith('"')   # a literal outranks the IRI


def test_term_mode_order_by_aggregate_falls_back(enc):
    # a non-string (aggregate) sort column keeps native ordering
    q = ('SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } '
         'GROUP BY ?s ORDER BY DESC(?n) LIMIT 1')
    rows = _q(enc, q).collect()
    assert rows[0].s == f"<{EX}a>" and rows[0].n == 5


def test_encode_for_uri(enc):
    q = ('SELECT (ENCODE_FOR_URI("a b~c*d/e") AS ?u) '
         f'WHERE {{ <{EX}b> <{EX}name> ?n }}')
    assert _vals(enc, q) == ["a%20b~c%2Ad%2Fe"]


def test_term_mode_aggregates_by_value(enc):
    # SUM/AVG strip the encoding (value aggregation; non-numeric → NULL,
    # ignored); MIN/MAX pick by the §15.1 key, not the encoded string
    q = (f'SELECT (SUM(?a) AS ?tot) (MIN(?a) AS ?lo) (MAX(?a) AS ?hi) '
         f'WHERE {{ ?s <{EX}age> ?a . FILTER(isNumeric(?a)) }}')
    rows = _q(enc, q).collect()
    assert rows[0].tot == 59.5
    assert rows[0].lo == f'"17.5"^^<{XSD}decimal>'   # 17.5 < 42 by VALUE
    assert rows[0].hi == f'"42"^^<{XSD}integer>'
    # HAVING references the same term-mode aggregate (alias match)
    q = (f'SELECT ?s (SUM(?a) AS ?tot) WHERE {{ ?s <{EX}age> ?a }} '
         f'GROUP BY ?s HAVING (SUM(?a) > 20)')
    got = {r.s: r.tot for r in _q(enc, q).collect()}
    assert got == {f"<{EX}a>": 42.0}


def test_encoding_roundtrip_adversarial_batch(spark):
    # encode → STR must recover every literal EXACTLY, including values
    # that mimic the encoding itself ('_:x', '<iri>', '"v"@en' as plain
    # literal CONTENT), backslash runs, trailing backslashes, embedded
    # quotes before @-like suffixes, and all five escaped characters
    nasty = [
        'plain', '', ' ', 'a b', '"', '\\', '\\\\', 'x\\', '\\x',
        'a"b', 'a"@en', '"v"@en', '"v"^^<http://x>', '<http://iri>',
        '_:label', '<<quoted>>', 'line1\nline2', 'tab\there', 'cr\rend',
        'mix\\n\\t"q"\\', '\\"escaped-quote', 'unié中文',
        'end-with-quote"', '@en', '^^<dt>', 'a\tb\nc\rd\\e"f',
    ]
    rows = [("d", None, f"http://e/s{i}", "http://e/p", "literal", v,
             None, None, i) for i, v in enumerate(nasty)]
    from parser_rdf_spark import schemas
    from parser_rdf_spark.sparql import sparql_query

    enc2 = terms_spo(spark.createDataFrame(rows, schema=schemas.TRIPLES))
    q = ('SELECT ?s (STR(?o) AS ?lex) (isLiteral(?o) AS ?lit) '
         'WHERE { ?s <http://e/p> ?o }')
    got = {int(r.s[len("<http://e/s"):-1]): (r.lex, r.lit)
           for r in sparql_query(enc2, q, term_mode=True).collect()}
    assert len(got) == len(nasty)
    for i, v in enumerate(nasty):
        assert got[i] == (v, True), f"round-trip failed for {v!r}: {got[i]!r}"


def test_term_mode_combinators(enc):
    # OPTIONAL / UNION / VALUES / NOT EXISTS all compose with encoded
    # constants and term builtins
    q = (f'SELECT ?s ?hb WHERE {{ ?s <{EX}age> ?a . '
         f'OPTIONAL {{ ?s <{EX}knows> ?hb }} }}')
    got = {r.s: r.hb for r in _q(enc, q).collect()}
    assert got[f"<{EX}a>"] == f"<{EX}b>" and got[f"<{EX}c>"] is None
    q = (f'SELECT ?x WHERE {{ {{ ?x <{EX}knows> ?y }} UNION '
         f'{{ ?x <{EX}note> ?y . FILTER(isBlank(?y)) }} }}')
    assert _vals(enc, q) == sorted([f"<{EX}a>", f"<{EX}b>"])
    q = (f'SELECT ?s WHERE {{ VALUES ?s {{ <{EX}a> <{EX}x> }} '
         f'?s <{EX}name> ?n . FILTER(LANG(?n) = "fr") }}')
    assert _vals(enc, q) == [f"<{EX}a>"]
    q = (f'SELECT ?s WHERE {{ ?s <{EX}age> ?a . '
         f'FILTER NOT EXISTS {{ ?s <{EX}knows> ?o }} }}')
    assert _vals(enc, q) == sorted([f"<{EX}b>", f"<{EX}c>"])


def test_term_construct_serializes_directly(enc, spark):
    # term-mode CONSTRUCT output is already N-Triples terms: one
    # concat_ws away from valid lines; the strict parser recovers them
    from parser_rdf_spark.ntriples import parse_document
    from parser_rdf_spark.serialize import encoded_spo_to_ntriples
    from parser_rdf_spark.sparql import sparql_query

    out = sparql_query(enc, f"""
        CONSTRUCT {{ ?s <{EX}tagged> ?n }}
        WHERE {{ ?s <{EX}name> ?n . FILTER(LANG(?n) != "") }}
    """, term_mode=True)
    lines = sorted(r.line for r in encoded_spo_to_ntriples(out).collect())
    assert lines == sorted([
        f'<{EX}a> <{EX}tagged> "Alice"@en .',
        f'<{EX}a> <{EX}tagged> "Alicia"@fr .',
        f'<{EX}c> <{EX}tagged> "Cam"@en-GB .',
    ])
    reparsed = parse_document("\n".join(lines))
    assert {(t.obj_value, t.obj_lang) for t in reparsed} == \
        {("Alice", "en"), ("Alicia", "fr"), ("Cam", "en-GB")}


def test_subselect_inherits_term_mode(enc):
    # inner ORDER BY + LIMIT must use §15.1 VALUE order (17.5 before 42),
    # not lexicographic order over the encoding ("17.5" > "42")
    q = (f'SELECT ?s ?a WHERE {{ '
         f'{{ SELECT ?s ?a WHERE {{ ?s <{EX}age> ?a . '
         f'FILTER(isNumeric(?a)) }} ORDER BY ?a LIMIT 1 }} }}')
    rows = _q(enc, q).collect()
    assert [(r.s, r.a) for r in rows] == \
        [(f"<{EX}b>", f'"17.5"^^<{XSD}decimal>')]


def test_subselect_plain_vars_scoped(enc):
    # a sub-SELECT binding ?x to a PLAIN value must not mark the
    # UNRELATED (non-projected) outer ?x as plain: the outer STR(?x)
    # still lex-strips its encoded term (ADVICE r04 plain_vars leak)
    q = (f'SELECT ?s WHERE {{ '
         f'{{ SELECT ?s WHERE {{ ?s <{EX}name> ?nm . '
         f'BIND(STRLEN(STR(?nm)) AS ?x) FILTER(?x > 5) }} }} '
         f'?s <{EX}age> ?x . FILTER(STR(?x) = "42") }}')
    assert _vals(enc, q) == [f"<{EX}a>"]


def test_subselect_projected_plain_var_propagates(enc):
    # the subquery's PROJECTED plain vars are visible (and plain) in the
    # enclosing group after the natural join
    q = (f'SELECT ?s ?n WHERE {{ '
         f'{{ SELECT ?s (STRLEN(STR(?nm)) AS ?n) '
         f'WHERE {{ ?s <{EX}name> ?nm }} }} FILTER(?n = 5) }}')
    rows = _q(enc, q).collect()
    assert {(r.s, r.n) for r in rows} == {(f"<{EX}a>", 5)}


def test_term_mode_describe_and_group_by(enc):
    # DESCRIBE with an encoded constant target returns that subject's
    # encoded triples; GROUP BY keys group by term identity
    q = f'DESCRIBE <{EX}b>'
    got = {(r.subj, r.pred, r.obj) for r in _q(enc, q).collect()}
    assert (f"<{EX}b>", f"<{EX}name>", '"Bob"') in got
    assert (f"<{EX}b>", f"<{EX}note>", "_:n1") in got
    q = (f'SELECT ?p (COUNT(?o) AS ?n) WHERE {{ <{EX}a> ?p ?o }} '
         f'GROUP BY ?p ORDER BY ?p')
    rows = [(r.p, r.n) for r in _q(enc, q).collect()]
    assert (f"<{EX}name>", 2) in rows and (f"<{EX}knows>", 1) in rows


# ---------------------------------------------------------------------------
# round-5 group constructs in term mode
# ---------------------------------------------------------------------------

def test_term_union_mixed_with_siblings(enc):
    # sibling pattern ⋈ union solutions, all term-encoded
    got = _vals(enc, f"""
        SELECT ?s WHERE {{
          ?s <{EX}name> ?n .
          {{ ?s <{EX}age> ?a . FILTER(?a > 20) }}
          UNION
          {{ ?s <{EX}knows> <{EX}b> }}
        }}
    """)
    # a has TWO names (en+fr) and matches BOTH branches → 2 × 2 rows
    assert got == [f"<{EX}a>"] * 4


def test_term_optional_numeric_filter(enc):
    # OPTIONAL's inner FILTER compares the typed literal numerically and
    # compiles to the left-join condition
    rows = _q(enc, f"""
        SELECT ?s ?a WHERE {{
          ?s <{EX}name> ?n . FILTER(LANG(?n) = "")
          OPTIONAL {{ ?s <{EX}age> ?a FILTER(?a < 20) }}
        }}
    """).collect()
    assert {(r.s, r.a) for r in rows} == {
        (f"<{EX}b>", f'"17.5"^^<{XSD}decimal>'),
    }
    rows2 = _q(enc, f"""
        SELECT ?s ?a WHERE {{
          ?s <{EX}name> ?n . FILTER(LANG(?n) = "")
          OPTIONAL {{ ?s <{EX}age> ?a FILTER(?a < 10) }}
        }}
    """).collect()
    # 17.5 fails the tighter bound → the row survives with ?a unbound
    assert {(r.s, r.a) for r in rows2} == {(f"<{EX}b>", None)}


def test_term_union_sibling_not_exists(enc):
    got = _vals(enc, f"""
        SELECT ?s WHERE {{
          {{ ?s <{EX}age> ?a }} UNION {{ ?s <{EX}ref> ?r }}
          FILTER NOT EXISTS {{ ?s <{EX}knows> ?o }}
        }}
    """)
    assert got == [f"<{EX}b>", f"<{EX}c>", f"<{EX}x>"]
