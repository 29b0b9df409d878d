"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Payload mix per FIXTURES.md: W3C conformance fixtures + the cross-format
quartet + extractor-feature Turtle docs + non-RDF filler, wrapped as
``<html><body><pre>{payload}</pre></body></html>`` with the raw payload in
``text``. Hosts are drawn Zipf-like so one mega-host owns a large share of
rows (skew realism). Everything is seeded and pure-functional — the same
(seed, n_docs) always produces byte-identical pages, which the resume and
scaling benchmarks rely on.

Generation happens distributed: a range DataFrame → JVM-side id
arithmetic → one mapInPandas to stamp payload templates (Python only
touches the small template table, replicated per row by modular index).
For bench sizes (10k-100k) this synthesizes in seconds.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import w3c_fixtures as w3c

# extractor-feature Turtle docs (FIXTURES.md payload class 3)
FEATURE_DOCS: dict[str, str] = {
    "multilingual": """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:Person a rdfs:Class ;
    rdfs:label "Person"@en ;
    rdfs:label "Persoon"@nl ;
    rdfs:comment "A human being"@en ;
    rdfs:comment "Een mens"@nl .
""",
    "subclass-chain": """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:LivingBeing a rdfs:Class .
ex:Person a rdfs:Class ; rdfs:subClassOf ex:LivingBeing .
ex:Student a rdfs:Class ; rdfs:subClassOf ex:Person .
""",
    "blank-node-class": """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:Named a rdfs:Class .
_:anon a rdfs:Class ; rdfs:label "Anonymous"@en .
""",
    "union-domain": """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.org/> .
ex:knows a owl:ObjectProperty ;
    rdfs:domain [ a owl:Class ; owl:unionOf ( ex:Person ex:Organization ) ] ;
    rdfs:range ex:Person .
""",
    "range-from-comment": """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:title a rdf:Property ;
    rdfs:comment "The range of this property is a plain literal."@en .
ex:created a rdf:Property ;
    rdfs:comment "Range is a dateTime value."@en .
""",
    "functional-inverse": """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.org/> .
ex:hasSpouse a owl:ObjectProperty , owl:FunctionalProperty ;
    owl:inverseOf ex:isSpouseOf ;
    rdfs:subPropertyOf ex:relatedTo .
""",
    "annotations": """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix ex: <http://example.org/> .
ex:Person a rdfs:Class ;
    skos:prefLabel "Person"@en ;
    rdfs:seeAlso <http://example.org/docs> ;
    rdfs:isDefinedBy <http://example.org/onto> .
""",
    "shacl-full": """\
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ;
    rdfs:label "Person shape"@en ;
    sh:targetClass ex:Person ;
    sh:minCount "1" ; sh:maxCount "5" ; sh:minLength "2" ; sh:maxLength "64" ;
    sh:pattern "^[A-Z]" ; sh:datatype <http://www.w3.org/2001/XMLSchema#string> ;
    sh:nodeKind sh:IRI ; sh:class ex:Person ; sh:node ex:OtherShape ;
    sh:minInclusive "0" ; sh:maxInclusive "100" ;
    sh:minExclusive "-1" ; sh:maxExclusive "101" ;
    sh:property [ sh:path ex:name ; sh:minCount "1" ; sh:name "name" ;
                  sh:message "name required" ; sh:description "the name" ] .
""",
}

FILLER_TEXT = (
    "web page boilerplate navigation header footer copyright contact about "
    "products services news article lorem ipsum content marketing text "
)


def _nt_filler(i: int, entities_per_doc: int = 4) -> str:
    """Synthetic N-Triples doc with varied subjects so triple counts grow
    linearly at bench scale (FIXTURES.md: 'filler replicated with varied
    subjects'). ~20 triples / ~2.5 KB per doc — Common-Crawl-style pages
    are KB-scale, not the 100-byte toys that make fixed per-doc overhead
    dominate a benchmark."""
    parts = []
    for j in range(entities_per_doc):
        e = i * entities_per_doc + j
        parts.append(
            f"<http://data.example.org/e{e}> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2000/01/rdf-schema#Class> .\n"
            f'<http://data.example.org/e{e}> <http://www.w3.org/2000/01/rdf-schema#label> "Entity {e}"@en .\n'
            f"<http://data.example.org/e{e}> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://data.example.org/base> .\n"
            f'<http://data.example.org/e{e}> <http://purl.org/dc/terms/created> "2026-01-01T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .\n'
            f"<http://data.example.org/e{e}> <http://www.w3.org/2000/01/rdf-schema#seeAlso> <http://data.example.org/e{e + 1}> .\n"
        )
    return "".join(parts)


def _html_filler(i: int, entities_per_doc: int = 3) -> str:
    """Common-Crawl-style HTML page carrying all three structured-data
    carriers (embedded JSON-LD, microdata, RDFa Lite) plus boilerplate —
    the html/structured-data share of the bench corpus. ~9 triples/doc,
    entity ids varied so triple counts grow linearly."""
    e = i * entities_per_doc
    price = f"{(i % 90) + 10}.99"
    return f"""<!DOCTYPE html><html><head><title>Page {i}</title>
<script type="application/ld+json">
{{"@context":"https://schema.org","@id":"https://data.example.org/prod{e}","@type":"Product","name":"Product {e}","offers":{{"@type":"Offer","price":"{price}","priceCurrency":"USD"}}}}
</script></head>
<body vocab="https://schema.org/">
<nav><a href="/">home</a> <a href="/about">about</a></nav>
<div itemscope itemtype="https://schema.org/Person" itemid="https://data.example.org/person{e + 1}">
  <span itemprop="name">Person {e + 1}</span>
  <meta itemprop="birthDate" content="19{50 + (i % 50):02d}-01-01">
  <a itemprop="url" href="https://host{i % 97}.example.org/~p{e + 1}">profile</a>
</div>
<div about="https://data.example.org/org{e + 2}" typeof="Organization">
  <span property="name">Org {e + 2}</span>
  <span property="numberOfEmployees" content="{i % 5000}"></span>
</div>
<footer>{FILLER_TEXT}</footer>
</body></html>"""


def _host(i: int, seed: int) -> str:
    """Zipf-like host assignment: ~40% of pages land on host0 (the
    mega-host), the rest spread over 97 hosts."""
    h = int.from_bytes(hashlib.blake2b(f"{seed}-{i}".encode(), digest_size=4).digest(), "big")
    if h % 10 < 4:
        return "mega.example.org"
    return f"host{h % 97}.example.org"


def corpus_templates() -> list[tuple[str, str]]:
    """(tag, payload) template table: fixtures + features + quartet."""
    out: list[tuple[str, str]] = []
    for name in w3c.POSITIVE + w3c.NEGATIVE:
        out.append((f"w3c/{name}", w3c.FIXTURES[name]))
    for name, content in w3c.SAMPLES.items():
        out.append((f"quartet/{name}", content))
    for name, content in FEATURE_DOCS.items():
        out.append((f"feature/{name}", content))
    return out


def tiny_pages(spark: SparkSession) -> DataFrame:
    """Fixtures-only corpus (~120 docs) for unit/conformance jobs."""
    from datetime import datetime, timezone

    from .schemas import PAGES

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i, (tag, payload) in enumerate(corpus_templates()):
        url = f"https://{_host(i, 42)}/{tag}"
        html = f"<html><body><pre>{payload}</pre></body></html>".encode()
        rows.append((url, ts, html, payload, ["en", "nl", "es", "zh", "de"][i % 5]))
    rows.append((f"https://{_host(998, 42)}/filler/plain", ts, None, FILLER_TEXT, "en"))
    rows.append((f"https://{_host(999, 42)}/filler/empty", ts, None, "  ", "en"))
    return spark.createDataFrame(rows, schema=PAGES)


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic bench corpus of ``n_docs`` pages.

    Mix: 60% N-Triples filler (varied subjects), 10% HTML pages carrying
    structured data (JSON-LD + microdata + RDFa — the Common-Crawl-real
    case, exercising the raw-html fallback), 10% feature Turtle docs,
    10% quartet replicas, 10% non-RDF filler. Generated via
    ``spark.range`` + one mapInPandas (no driver-side materialization),
    so a 100k-doc corpus never touches the driver.
    """
    import pandas as pd

    from .schemas import PAGES

    feature_items = list(FEATURE_DOCS.items())
    samples = list(w3c.SAMPLES.items())

    def gen(batches):
        from datetime import datetime, timedelta, timezone

        t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
        for pdf in batches:
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in pdf["id"].tolist():
                bucket = i % 10
                text: str | None
                if bucket < 6:
                    tag, payload = f"ntfiller/{i}", _nt_filler(i)
                    html = f"<html><body><pre>{payload}</pre></body></html>".encode()
                    text = payload
                elif bucket < 7:
                    # structured-data HTML: raw page in html, text left for
                    # the fused stage-1 extraction + raw-html fallback
                    tag, payload = f"htmlpage/{i}", _html_filler(i)
                    html = payload.encode()
                    text = None
                elif bucket < 8:
                    name, payload = feature_items[i % len(feature_items)]
                    tag = f"feature/{name}/{i}"
                    html = f"<html><body><pre>{payload}</pre></body></html>".encode()
                    text = payload
                elif bucket < 9:
                    name, payload = samples[i % len(samples)]
                    tag = f"quartet/{name}/{i}"
                    html = f"<html><body><pre>{payload}</pre></body></html>".encode()
                    text = payload
                else:
                    tag, payload = f"filler/{i}", FILLER_TEXT + f" doc {i}"
                    html = f"<html><body><pre>{payload}</pre></body></html>".encode()
                    text = payload
                urls.append(f"https://{_host(i, seed)}/{tag}")
                tss.append(t0 + timedelta(minutes=int(i)))
                htmls.append(html)
                texts.append(text)
                langs.append(["en", "nl", "es", "zh", "de"][i % 5])
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
            )

    rng = spark.range(n_docs, numPartitions=partitions or max(8, n_docs // 8192))
    return rng.mapInPandas(gen, schema=PAGES)
