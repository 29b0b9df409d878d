"""W3C RDF 1.1 N-Triples test-suite fixtures, embedded as data.

Source: W3C RDF 1.1 N-Triples Test Suite
URL: https://w3c.github.io/rdf-tests/rdf/rdf11/rdf-n-triples/
License: W3C Test Suite License / W3C Software and Document License.

These are public test DATA (not reference code). The reference library
scores 40 pass / 1 skip (minimal_whitespace) on the positive cases and
29/29 on the negative ones (reference: tests/Conformance/
W3cNTriplesConformanceTest.php:59-173); our engine treats the same
split as its triple-extraction P/R oracle. The cross-format quartet
(SAMPLES) mirrors tests/Fixtures/Integration/sample.{nt,ttl,jsonld,rdf}:
one tiny Person/name ontology in four serializations.
"""

# fmt: off
FIXTURES: dict[str, str] = {
    'comment_following_triple': '<http://example/s> <http://example/p> <http://example/o> . # comment\n<http://example/s> <http://example/p> _:o . # comment\n<http://example/s> <http://example/p> "o" . # comment\n<http://example/s> <http://example/p> "o"^^<http://example/dt> . # comment\n<http://example/s> <http://example/p> "o"@en . # comment\n',
    'langtagged_string': '<http://a.example/s> <http://a.example/p> "chat"@en .\n',
    'lantag_with_subtag': '<http://example.org/ex#a> <http://example.org/ex#b> "Cheers"@en-UK .\n',
    'literal': '<http://a.example/s> <http://a.example/p> "x" .\n',
    'literal_all_controls': '<http://a.example/s> <http://a.example/p> "\\u0000\\u0001\\u0002\\u0003\\u0004\\u0005\\u0006\\u0007\\u0008\\t\\u000B\\u000C\\u000E\\u000F\\u0010\\u0011\\u0012\\u0013\\u0014\\u0015\\u0016\\u0017\\u0018\\u0019\\u001A\\u001B\\u001C\\u001D\\u001E\\u001F" .\n',
    'literal_all_punctuation': '<http://a.example/s> <http://a.example/p> " !\\"#$%&():;<=>?@[]^_`{|}~" .\n',
    'literal_ascii_boundaries': '<http://a.example/s> <http://a.example/p> "\x00\t\x0b\x0c\x0e&([]\x7f" .\n',
    'literal_false': '<http://a.example/s> <http://a.example/p> "false"^^<http://www.w3.org/2001/XMLSchema#boolean> .\n',
    'literal_true': '<http://a.example/s> <http://a.example/p> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .\n',
    'literal_with_2_dquotes': '<http://a.example/s> <http://a.example/p> "x\\"\\"y" .\n',
    'literal_with_2_squotes': '<http://a.example/s> <http://a.example/p> "x\'\'y" .\n',
    'literal_with_BACKSPACE': '<http://a.example/s> <http://a.example/p> "\\b" .\n',
    'literal_with_CARRIAGE_RETURN': '<http://a.example/s> <http://a.example/p> "\\r" .\n',
    'literal_with_CHARACTER_TABULATION': '<http://a.example/s> <http://a.example/p> "\\t" .\n',
    'literal_with_FORM_FEED': '<http://a.example/s> <http://a.example/p> "\\f" .\n',
    'literal_with_LINE_FEED': '<http://a.example/s> <http://a.example/p> "\\n" .\n',
    'literal_with_REVERSE_SOLIDUS': '<http://a.example/s> <http://a.example/p> "\\\\" .\n',
    'literal_with_REVERSE_SOLIDUS2': '<http://example.org/ns#s> <http://example.org/ns#p1> "test-\\\\" .\n',
    'literal_with_UTF8_boundaries': '<http://a.example/s> <http://a.example/p> "\x80߿ࠀ\u0fffက쿿퀀\ud7ff\ue000�𐀀\U0003fffd\U00040000\U000ffffd\U00100000\U0010fffd" .\n',
    'literal_with_dquote': '<http://a.example/s> <http://a.example/p> "x\\"y" .\n',
    'literal_with_numeric_escape4': '<http://a.example/s> <http://a.example/p> "\\u006F" .\n',
    'literal_with_numeric_escape8': '<http://a.example/s> <http://a.example/p> "\\U0000006F" .\n',
    'literal_with_squote': '<http://a.example/s> <http://a.example/p> "x\'y" .\n',
    'minimal_whitespace': '<http://example/s><http://example/p><http://example/o>.\n<http://example/s><http://example/p>"Alice".\n<http://example/s><http://example/p>_:o.\n_:s<http://example/p><http://example/o>.\n_:s<http://example/p>"Alice".\n_:s<http://example/p>_:bnode1.\n',
    'nt-syntax-bad-base-01': '@base <http://example/> .\n',
    'nt-syntax-bad-bnode-01': '_::a  <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-bnode-02': '_:abc:def  <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-esc-01': '# Bad string escape\n<http://example/s> <http://example/p> "a\\zb" .\n',
    'nt-syntax-bad-esc-02': '# Bad string escape\n<http://example/s> <http://example/p> "\\uWXYZ" .\n',
    'nt-syntax-bad-esc-03': '# Bad string escape\n<http://example/s> <http://example/p> "\\U0000WXYZ" .\n',
    'nt-syntax-bad-lang-01': '# Bad lang tag\n<http://example/s> <http://example/p> "string"@1 .\n',
    'nt-syntax-bad-num-01': '<http://example/s> <http://example/p> 1 .\n',
    'nt-syntax-bad-num-02': '<http://example/s> <http://example/p> 1.0 .\n',
    'nt-syntax-bad-num-03': '<http://example/s> <http://example/p> 1.0e0 .\n',
    'nt-syntax-bad-prefix-01': '@prefix : <http://example/> .\n',
    'nt-syntax-bad-string-01': '<http://example/s> <http://example/p> "abc\' .\n',
    'nt-syntax-bad-string-02': '<http://example/s> <http://example/p> 1.0 .\n',
    'nt-syntax-bad-string-03': '<http://example/s> <http://example/p> 1.0e1 .\n',
    'nt-syntax-bad-string-04': "<http://example/s> <http://example/p> '''abc''' .\n",
    'nt-syntax-bad-string-05': '<http://example/s> <http://example/p> """abc""" .\n',
    'nt-syntax-bad-string-06': '<http://example/s> <http://example/p> "abc .\n',
    'nt-syntax-bad-string-07': '<http://example/s> <http://example/p> abc" .\n',
    'nt-syntax-bad-struct-01': '<http://example/s> <http://example/p> <http://example/o>, <http://example/o2> .\n',
    'nt-syntax-bad-struct-02': '<http://example/s> <http://example/p> <http://example/o>; <http://example/p2>, <http://example/o2> .\n',
    'nt-syntax-bad-uri-01': '# Bad IRI : space.\n<http://example/ space> <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-uri-02': '# Bad IRI : bad escape\n<http://example/\\u00ZZ11> <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-uri-03': '# Bad IRI : bad escape\n<http://example/\\U00ZZ1111> <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-uri-04': '# Bad IRI : character escapes not allowed.\n<http://example/\\n> <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-uri-05': '# Bad IRI : character escapes not allowed.\n<http://example/\\/> <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-uri-06': '# No relative IRIs in N-Triples\n<s> <http://example/p> <http://example/o> .\n',
    'nt-syntax-bad-uri-07': '# No relative IRIs in N-Triples\n<http://example/s> <p> <http://example/o> .\n',
    'nt-syntax-bad-uri-08': '# No relative IRIs in N-Triples\n<http://example/s> <http://example/p> <o> .\n',
    'nt-syntax-bad-uri-09': '# No relative IRIs in N-Triples\n<http://example/s> <http://example/p> "foo"^^<dt> .\n',
    'nt-syntax-bnode-01': '_:a  <http://example/p> <http://example/o> .\n',
    'nt-syntax-bnode-02': '<http://example/s> <http://example/p> _:a .\n_:a  <http://example/p> <http://example/o> .\n',
    'nt-syntax-bnode-03': '<http://example/s> <http://example/p> _:1a .\n_:1a  <http://example/p> <http://example/o> .\n',
    'nt-syntax-datatypes-01': '<http://example/s> <http://example/p> "123"^^<http://www.w3.org/2001/XMLSchema#byte> .\n',
    'nt-syntax-datatypes-02': '<http://example/s> <http://example/p> "123"^^<http://www.w3.org/2001/XMLSchema#string> .\n',
    'nt-syntax-file-01': '',
    'nt-syntax-file-02': '#Empty file.\n',
    'nt-syntax-file-03': '#One comment, one empty line.\n\n',
    'nt-syntax-str-esc-01': '<http://example/s> <http://example/p> "a\\n" .\n',
    'nt-syntax-str-esc-02': '<http://example/s> <http://example/p> "a\\u0020b" .\n',
    'nt-syntax-str-esc-03': '<http://example/s> <http://example/p> "a\\U00000020b" .\n',
    'nt-syntax-string-01': '<http://example/s> <http://example/p> "string" .\n',
    'nt-syntax-string-02': '<http://example/s> <http://example/p> "string"@en .\n',
    'nt-syntax-string-03': '<http://example/s> <http://example/p> "string"@en-uk .\n',
    'nt-syntax-subm-01': '#\n# Copyright World Wide Web Consortium, (Massachusetts Institute of\n# Technology, Institut National de Recherche en Informatique et en\n# Automatique, Keio University).\n#\n# All Rights Reserved.\n#\n# Please see the full Copyright clause at\n# <http://www.w3.org/Consortium/Legal/copyright-software.html>\n#\n# Test file with a variety of legal N-Triples\n#\n# Dave Beckett - http://purl.org/net/dajobe/\n# \n# $Id: test.nt,v 1.7 2003/10/06 15:52:19 dbeckett2 Exp $\n# \n#####################################################################\n\n# comment lines\n  \t  \t   # comment line after whitespace\n# empty blank line, then one with spaces and tabs\n\n         \t\n<http://example.org/resource1> <http://example.org/property> <http://example.org/resource2> .\n_:anon <http://example.org/property> <http://example.org/resource2> .\n<http://example.org/resource2> <http://example.org/property> _:anon .\n# spaces and tabs throughout:\n \t <http://example.org/resource3> \t <http://example.org/property>\t <http://example.org/resource2> \t.\t \n\n# line ending with CR NL (ASCII 13, ASCII 10)\n<http://example.org/resource4> <http://example.org/property> <http://example.org/resource2> .\n\n# 2 statement lines separated by single CR (ASCII 10)\n<http://example.org/resource5> <http://example.org/property> <http://example.org/resource2> .\n<http://example.org/resource6> <http://example.org/property> <http://example.org/resource2> .\n\n\n# All literal escapes\n<http://example.org/resource7> <http://example.org/property> "simple literal" .\n<http://example.org/resource8> <http://example.org/property> "backslash:\\\\" .\n<http://example.org/resource9> <http://example.org/property> "dquote:\\"" .\n<http://example.org/resource10> <http://example.org/property> "newline:\\n" .\n<http://example.org/resource11> <http://example.org/property> "return\\r" .\n<http://example.org/resource12> <http://example.org/property> "tab:\\t" .\n\n# Space is optional before final .\n<http://example.org/resource13> <http://example.org/property> <http://example.org/resource2>.\n<http://example.org/resource14> <http://example.org/property> "x".\n<http://example.org/resource15> <http://example.org/property> _:anon.\n\n# \\u and \\U escapes\n# latin small letter e with acute symbol \\u00E9 - 3 UTF-8 bytes #xC3 #A9\n<http://example.org/resource16> <http://example.org/property> "\\u00E9" .\n# Euro symbol \\u20ac  - 3 UTF-8 bytes #xE2 #x82 #xAC\n<http://example.org/resource17> <http://example.org/property> "\\u20AC" .\n# resource18 test removed\n# resource19 test removed\n# resource20 test removed\n\n# XML Literals as Datatyped Literals\n<http://example.org/resource21> <http://example.org/property> ""^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource22> <http://example.org/property> " "^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource23> <http://example.org/property> "x"^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource23> <http://example.org/property> "\\""^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource24> <http://example.org/property> "<a></a>"^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource25> <http://example.org/property> "a <b></b>"^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource26> <http://example.org/property> "a <b></b> c"^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource26> <http://example.org/property> "a\\n<b></b>\\nc"^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n<http://example.org/resource27> <http://example.org/property> "chat"^^<http://www.w3.org/2000/01/rdf-schema#XMLLiteral> .\n# resource28 test removed 2003-08-03\n# resource29 test removed 2003-08-03\n\n# Plain literals with languages\n<http://example.org/resource30> <http://example.org/property> "chat"@fr .\n<http://example.org/resource31> <http://example.org/property> "chat"@en .\n\n# Typed Literals\n<http://example.org/resource32> <http://example.org/property> "abc"^^<http://example.org/datatype1> .\n# resource33 test removed 2003-08-03\n',
    'nt-syntax-uri-01': '<http://example/s> <http://example/p> <http://example/o> .\n',
    'nt-syntax-uri-02': '# x53 is capital S\n<http://example/\\u0053> <http://example/p> <http://example/o> .\n',
    'nt-syntax-uri-03': '# x53 is capital S\n<http://example/\\U00000053> <http://example/p> <http://example/o> .\n',
    'nt-syntax-uri-04': "# IRI with all chars in it.\n<http://example/s> <http://example/p> <scheme:!$%25&'()*+,-./0123456789:/@ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz~?#> .\n",
}

SAMPLES: dict[str, str] = {
    'sample.nt': '<http://example.org/Person> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2000/01/rdf-schema#Class> .\n<http://example.org/Person> <http://www.w3.org/2000/01/rdf-schema#label> "Person"@en .\n<http://example.org/name> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/1999/02/22-rdf-syntax-ns#Property> .\n<http://example.org/name> <http://www.w3.org/2000/01/rdf-schema#label> "name"@en .\n<http://example.org/name> <http://www.w3.org/2000/01/rdf-schema#domain> <http://example.org/Person> .\n',
    'sample.ttl': '@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n@prefix ex: <http://example.org/> .\n\nex:Person a rdfs:Class ;\n    rdfs:label "Person"@en .\n\nex:name a rdf:Property ;\n    rdfs:label "name"@en ;\n    rdfs:domain ex:Person .\n',
    'sample.jsonld': '{\n    "@context": {\n        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",\n        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",\n        "ex": "http://example.org/"\n    },\n    "@graph": [\n        {\n            "@id": "ex:Person",\n            "@type": "rdfs:Class",\n            "rdfs:label": {"@value": "Person", "@language": "en"}\n        },\n        {\n            "@id": "ex:name",\n            "@type": "rdf:Property",\n            "rdfs:label": {"@value": "name", "@language": "en"},\n            "rdfs:domain": {"@id": "ex:Person"}\n        }\n    ]\n}\n',
    'sample.rdf': '<?xml version="1.0"?>\n<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n         xmlns:ex="http://example.org/">\n    <rdfs:Class rdf:about="http://example.org/Person">\n        <rdfs:label xml:lang="en">Person</rdfs:label>\n    </rdfs:Class>\n    <rdf:Property rdf:about="http://example.org/name">\n        <rdfs:label xml:lang="en">name</rdfs:label>\n        <rdfs:domain rdf:resource="http://example.org/Person"/>\n    </rdf:Property>\n</rdf:RDF>\n',
}

POSITIVE: list[str] = ['nt-syntax-file-01', 'nt-syntax-file-02', 'nt-syntax-file-03', 'nt-syntax-uri-01', 'nt-syntax-uri-02', 'nt-syntax-uri-03', 'nt-syntax-uri-04', 'nt-syntax-string-01', 'nt-syntax-string-02', 'nt-syntax-string-03', 'nt-syntax-str-esc-01', 'nt-syntax-str-esc-02', 'nt-syntax-str-esc-03', 'nt-syntax-bnode-01', 'nt-syntax-bnode-02', 'nt-syntax-bnode-03', 'nt-syntax-datatypes-01', 'nt-syntax-datatypes-02', 'nt-syntax-subm-01', 'comment_following_triple', 'literal', 'literal_all_controls', 'literal_all_punctuation', 'literal_ascii_boundaries', 'literal_with_2_dquotes', 'literal_with_2_squotes', 'literal_with_BACKSPACE', 'literal_with_CARRIAGE_RETURN', 'literal_with_CHARACTER_TABULATION', 'literal_with_dquote', 'literal_with_FORM_FEED', 'literal_with_LINE_FEED', 'literal_with_numeric_escape4', 'literal_with_numeric_escape8', 'literal_with_REVERSE_SOLIDUS', 'literal_with_REVERSE_SOLIDUS2', 'literal_with_squote', 'literal_with_UTF8_boundaries', 'langtagged_string', 'lantag_with_subtag', 'minimal_whitespace']

NEGATIVE: list[str] = ['nt-syntax-bad-uri-01', 'nt-syntax-bad-uri-02', 'nt-syntax-bad-uri-03', 'nt-syntax-bad-uri-04', 'nt-syntax-bad-uri-05', 'nt-syntax-bad-uri-06', 'nt-syntax-bad-uri-07', 'nt-syntax-bad-uri-08', 'nt-syntax-bad-uri-09', 'nt-syntax-bad-prefix-01', 'nt-syntax-bad-base-01', 'nt-syntax-bad-bnode-01', 'nt-syntax-bad-bnode-02', 'nt-syntax-bad-struct-01', 'nt-syntax-bad-struct-02', 'nt-syntax-bad-lang-01', 'nt-syntax-bad-esc-01', 'nt-syntax-bad-esc-02', 'nt-syntax-bad-esc-03', 'nt-syntax-bad-string-01', 'nt-syntax-bad-string-02', 'nt-syntax-bad-string-03', 'nt-syntax-bad-string-04', 'nt-syntax-bad-string-05', 'nt-syntax-bad-string-06', 'nt-syntax-bad-string-07', 'nt-syntax-bad-num-01', 'nt-syntax-bad-num-02', 'nt-syntax-bad-num-03']

# the reference skips this one (its EasyRdf backend needs whitespace);
# our tokenizer parses it, which is spec-correct and counted as a pass.
REFERENCE_SKIPS: list[str] = ['minimal_whitespace']
