"""Differential-test corpus run through BOTH the reference (node) and the
engine. Cases cover the operator matrix of SURVEY.md §2 (keyword handling,
containers, scoped contexts, value coercion, lists, graphs, reverse, nest).
"""

EX = "http://example.org/"

CASES = [
    # --- expansion basics ---
    {"name": "expand-simple-terms", "op": "expand", "input": {
        "@context": {"name": "http://schema.org/name",
                     "homepage": {"@id": "http://schema.org/url",
                                  "@type": "@id"}},
        "name": "Manu", "homepage": "http://manu.sporny.org/"}},
    {"name": "expand-id-type", "op": "expand", "input": {
        "@context": {"ex": EX},
        "@id": "http://a.example/s", "@type": "ex:T", "ex:p": "v"}},
    {"name": "expand-vocab", "op": "expand", "input": {
        "@context": {"@vocab": EX}, "p": "v", "q": {"r": 1}}},
    {"name": "expand-base-relative", "op": "expand",
     "options": {"base": "http://base.example/dir/doc"},
     "input": {"@context": {"p": {"@id": EX + "p", "@type": "@id"}},
               "@id": "child", "p": ["../sib", "/root", "#frag", "?q=1"]}},
    {"name": "expand-curie", "op": "expand", "input": {
        "@context": {"ex": EX, "ex:p": {"@type": "@id"}},
        "ex:p": "http://x.example/", "ex:q": "plain"}},
    {"name": "expand-keyword-alias", "op": "expand", "input": {
        "@context": {"id": "@id", "type": "@type", "value": "@value"},
        "id": EX + "s", "type": EX + "T",
        EX + "p": {"value": "v", "type": EX + "D"}}},
    {"name": "expand-null-values", "op": "expand", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:p": None, "ex:q": [None, "x", None]}},
    {"name": "expand-nested-arrays", "op": "expand", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:p": [["a", "b"], ["c"]]}},
    {"name": "expand-numbers", "op": "expand", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:int": 42, "ex:float": 2.5, "ex:bool": True,
        "ex:big": 1.0e22, "ex:neg": -17}},
    {"name": "expand-language", "op": "expand", "input": {
        "@context": {"@language": "en", "ex": EX,
                     "notag": {"@id": EX + "n", "@language": None},
                     "de": {"@id": EX + "d", "@language": "DE"}},
        "ex:p": "hello", "notag": "plain", "de": "hallo"}},
    {"name": "expand-type-coercion", "op": "expand", "input": {
        "@context": {"date": {"@id": EX + "date",
                              "@type": "http://www.w3.org/2001/XMLSchema#dateTime"}},
        "date": "2026-01-01T00:00:00Z"}},

    # --- containers ---
    {"name": "expand-language-map", "op": "expand", "input": {
        "@context": {"label": {"@id": EX + "label",
                               "@container": "@language"}},
        "label": {"en": "hello", "de": ["hallo", "tag"], "@none": "any"}}},
    {"name": "expand-index-map", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p", "@container": "@index"}},
        "p": {"a": {"@id": EX + "1"}, "b": "two"}}},
    {"name": "expand-id-map", "op": "expand", "input": {
        "@context": {"@vocab": EX, "p": {"@container": "@id"}},
        "p": {"http://x.example/a": {"v": 1},
              "http://x.example/b": {"v": 2}}}},
    {"name": "expand-type-map", "op": "expand", "input": {
        "@context": {"@vocab": EX, "p": {"@container": "@type"}},
        "p": {"T1": {"v": 1}, "T2": {"@id": EX + "n", "v": 2}}}},
    {"name": "expand-graph-container", "op": "expand", "input": {
        "@context": {"@vocab": EX, "g": {"@container": "@graph"}},
        "g": {"p": "v"}}},
    {"name": "expand-graph-index-container", "op": "expand", "input": {
        "@context": {"@vocab": EX,
                     "g": {"@container": ["@graph", "@index"]}},
        "g": {"i1": {"p": "v1"}, "i2": {"p": "v2"}}}},
    {"name": "expand-list", "op": "expand", "input": {
        "@context": {"ex": EX, "lst": {"@id": EX + "lst",
                                       "@container": "@list"}},
        "lst": ["a", "b"], "ex:anon": {"@list": [1, 2]}}},
    {"name": "expand-set", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@set": ["a", {"@id": EX + "x"}]}}},

    # --- keywords ---
    {"name": "expand-reverse", "op": "expand", "input": {
        "@context": {"ex": EX, "children": {"@reverse": EX + "parent"}},
        "@id": EX + "s", "children": [{"@id": EX + "c1"}]}},
    {"name": "expand-reverse-block", "op": "expand", "input": {
        "@context": {"ex": EX},
        "@id": EX + "s",
        "@reverse": {"ex:parent": {"@id": EX + "c", "ex:name": "child"}}}},
    {"name": "expand-nest", "op": "expand", "input": {
        "@context": {"@vocab": EX, "meta": "@nest"},
        "@id": EX + "s", "meta": {"p": "v", "q": 2}}},
    {"name": "expand-graph-keyword", "op": "expand", "input": {
        "@context": {"ex": EX},
        "@id": EX + "g",
        "@graph": [{"@id": EX + "s", "ex:p": "v"}]}},
    {"name": "expand-included", "op": "expand", "input": {
        "@context": {"@vocab": EX},
        "@id": EX + "s", "p": "v",
        "@included": [{"@id": EX + "t", "q": "w"}]}},
    {"name": "expand-json-literal", "op": "expand", "input": {
        "@context": {"j": {"@id": EX + "j", "@type": "@json"}},
        "j": {"b": 2, "a": [1, True, None], "c": {"y": 1.5, "x": "s"}}}},
    {"name": "expand-value-language", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@value": "bonjour", "@language": "FR"},
        "ex:q": {"@value": 5, "@type": EX + "D"},
        "ex:r": {"@value": "v", "@index": "i"}}},
    {"name": "expand-index-keyword", "op": "expand", "input": {
        "@context": {"ex": EX},
        "@id": EX + "s", "@index": "idx", "ex:p": "v"}},

    # --- scoped contexts ---
    {"name": "expand-property-scoped", "op": "expand", "input": {
        "@context": {"@vocab": EX,
                     "p": {"@id": EX + "p",
                           "@context": {"q": EX + "scoped-q"}}},
        "p": {"q": "v"}}},
    {"name": "expand-type-scoped", "op": "expand", "input": {
        "@context": {"@vocab": EX,
                     "T": {"@id": EX + "T",
                           "@context": {"q": EX + "typed-q"}}},
        "@type": "T", "q": "v"}},
    {"name": "expand-protected-override", "op": "expand", "input": {
        "@context": [{"@protected": True, "p": EX + "p1"},
                     {"q": EX + "q1"}],
        "p": "a", "q": "b"}},
    {"name": "expand-propagate-false", "op": "expand", "input": {
        "@context": {"@vocab": EX,
                     "T": {"@id": EX + "T",
                           "@context": {"@propagate": False,
                                        "q": EX + "tq"}}},
        "@type": "T", "q": {"q": "inner"}}},

    # --- free-floating / drops ---
    {"name": "expand-free-floating", "op": "expand", "input": [
        "scalar", {"@id": EX + "only-id"}, {"@value": "v"},
        {"@id": EX + "s", "p-unmapped": "x",
         "@context": {"ex": EX}, "ex:p": "kept"}]},
    {"name": "expand-unmapped-dropped", "op": "expand", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "unmapped": "dropped", "ex:kept": "v"}},

    # --- toRdf ---
    {"name": "tordf-simple", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s", "@type": "ex:T",
        "ex:p": "v", "ex:n": 7, "ex:d": 3.25, "ex:b": False}},
    {"name": "tordf-bnodes", "op": "toRdf", "input": {
        "@context": {"ex": EX},
        "ex:knows": [{"ex:name": "A", "ex:knows": {"ex:name": "C"}},
                     {"ex:name": "B"}]}},
    {"name": "tordf-lists", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:l": {"@list": [1, "two", {"@id": EX + "three"},
                           {"@list": ["nested"]}]}}},
    {"name": "tordf-empty-list", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s", "ex:l": {"@list": []}}},
    {"name": "tordf-named-graphs", "op": "toRdf", "input": {
        "@context": {"ex": EX},
        "@graph": [
            {"@id": EX + "g1",
             "@graph": [{"@id": EX + "s", "ex:p": "in-g1"}]},
            {"@id": EX + "s", "ex:p": "in-default"}]}},
    {"name": "tordf-langs", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:p": [{"@value": "x", "@language": "en"},
                 {"@value": "y", "@language": "de-DE"}]}},
    {"name": "tordf-json-literal", "op": "toRdf", "input": {
        "@context": {"j": {"@id": EX + "j", "@type": "@json"}},
        "@id": EX + "s", "j": {"b": [2, False], "a": "str"}}},
    {"name": "tordf-relative-dropped", "op": "toRdf", "input": {
        "@context": {"ex": EX},
        "@id": "relative-subject", "ex:p": "dropped"}},
    {"name": "tordf-type-bnode", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "@type": "_:t", "ex:p": {"@id": "_:o"}}},
    {"name": "tordf-double-edge", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:a": 1.0e21, "ex:b": 1e-7, "ex:c": 123456789.123}},
    {"name": "tordf-shared-bnode-labels", "op": "toRdf", "input": {
        "@context": {"ex": EX},
        "@graph": [{"@id": "_:x", "ex:p": "1"},
                   {"@id": "_:x", "ex:q": "2"},
                   {"ex:r": {"@id": "_:x"}}]}},

    # --- compact ---
    {"name": "compact-terms", "op": "compact",
     "input": {"@id": EX + "s",
               EX + "p": [{"@value": "v"}],
               EX + "q": [{"@id": EX + "o"}]},
     "ctx": {"p": EX + "p", "q": {"@id": EX + "q", "@type": "@id"}}},
    {"name": "compact-curie", "op": "compact",
     "input": {EX + "sub/path": [{"@value": 1}]},
     "ctx": {"ex": EX}},
    {"name": "compact-vocab", "op": "compact",
     "input": {"@type": [EX + "T"], EX + "p": [{"@value": "v"}]},
     "ctx": {"@vocab": EX}},
    {"name": "compact-language-map", "op": "compact",
     "input": {EX + "label": [{"@value": "hello", "@language": "en"},
                              {"@value": "hallo", "@language": "de"}]},
     "ctx": {"label": {"@id": EX + "label", "@container": "@language"}}},
    {"name": "compact-list", "op": "compact",
     "input": {EX + "l": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]},
     "ctx": {"l": {"@id": EX + "l", "@container": "@list"}}},
    {"name": "compact-index-map", "op": "compact",
     "input": {EX + "p": [{"@value": "a", "@index": "i1"},
                          {"@value": "b", "@index": "i2"}]},
     "ctx": {"p": {"@id": EX + "p", "@container": "@index"}}},
    {"name": "compact-base", "op": "compact",
     "options": {"base": "http://base.example/dir/"},
     "input": {"@id": "http://base.example/dir/child",
               EX + "p": [{"@id": "http://base.example/other"}]},
     "ctx": {"p": {"@id": EX + "p", "@type": "@id"}}},
    {"name": "compact-keyword-alias", "op": "compact",
     "input": {"@id": EX + "s", "@type": [EX + "T"],
               EX + "p": [{"@value": "v", "@language": "en"}]},
     "ctx": {"id": "@id", "type": "@type", "ex": EX}},
    {"name": "compact-reverse", "op": "compact",
     "input": {"@id": EX + "s",
               "@reverse": {EX + "parent": [{"@id": EX + "c"}]}},
     "ctx": {"children": {"@reverse": EX + "parent", "@type": "@id"}}},
    {"name": "compact-graph-container", "op": "compact",
     "input": {EX + "g": [{"@graph": [{EX + "p": [{"@value": "v"}]}]}]},
     "ctx": {"@vocab": EX, "g": {"@container": "@graph"}}},

    # --- flatten ---
    {"name": "flatten-nested", "op": "flatten", "input": {
        "@context": {"ex": EX},
        "@id": EX + "s",
        "ex:p": {"@id": EX + "o", "ex:q": {"ex:r": "deep"}}}},
    {"name": "flatten-with-ctx", "op": "flatten", "input": {
        "@context": {"ex": EX},
        "ex:p": {"ex:q": "v"}},
     "ctx": {"ex": EX}},

    # --- frame ---
    {"name": "frame-basic", "op": "frame", "input": {
        "@context": {"ex": EX},
        "@graph": [
            {"@id": EX + "lib", "@type": "ex:Library",
             "ex:contains": {"@id": EX + "book"}},
            {"@id": EX + "book", "@type": "ex:Book",
             "ex:title": "T"}]},
     "frame": {"@context": {"ex": EX}, "@type": "ex:Library",
               "ex:contains": {"@type": "ex:Book"}}},
    {"name": "frame-wildcard", "op": "frame", "input": {
        "@context": {"ex": EX},
        "@graph": [{"@id": EX + "a", "ex:p": "1"},
                   {"@id": EX + "b", "ex:p": "2"}]},
     "frame": {"@context": {"ex": EX}}},

    # --- merge ---
    {"name": "merge-two-docs", "op": "merge", "input": [
        {"@context": {"ex": EX}, "@id": EX + "s", "ex:p": "a",
         "ex:b": {"ex:inner": 1}},
        {"@context": {"ex": EX}, "@id": EX + "s", "ex:p": "b",
         "ex:b": {"ex:inner": 2}}]},

    # --- error cases ---
    {"name": "err-colliding-keywords", "op": "expand", "input": {
        "@context": {"id1": "@id", "id2": "@id"},
        "id1": EX + "a", "id2": EX + "b"}},
    {"name": "err-invalid-value-object", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@value": "v", "@type": EX + "T", "@language": "en"}}},
    {"name": "err-invalid-id", "op": "expand", "input": {
        "@context": {"ex": EX}, "@id": 17, "ex:p": "v"}},
    {"name": "err-keyword-redefine", "op": "expand", "input": {
        "@context": {"@id": EX + "bad"}, EX + "p": "v"}},
    {"name": "err-cyclic-context", "op": "expand", "input": {
        "@context": {"a": "b:x", "b": "a:y"}, "a:1": "v"}},
    {"name": "err-list-of-lists-ok-11", "op": "expand", "input": {
        "@context": {"l": {"@id": EX + "l", "@container": "@list"}},
        "l": [["a"], ["b"]]}},
]

# --- round 1 extension: harder conformance surface ---
CASES += [
    {"name": "expand-direction", "op": "expand", "input": {
        "@context": {"@direction": "rtl", "@language": "ar", "ex": EX},
        "ex:p": "text"}},
    {"name": "expand-direction-term", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p", "@direction": "ltr",
                           "@language": "en"}},
        "p": "text"}},
    {"name": "tordf-i18n-datatype", "op": "toRdf",
     "options": {"rdfDirection": "i18n-datatype"},
     "input": {"@context": {"@direction": "rtl", "@language": "ar",
                            "ex": EX},
               "@id": EX + "s", "ex:p": "نص"}},
    {"name": "expand-nested-nest", "op": "expand", "input": {
        "@context": {"@vocab": EX, "meta": "@nest", "inner": "@nest"},
        "@id": EX + "s",
        "meta": {"inner": {"a": "1"}, "b": "2"}}},
    {"name": "expand-graph-id-container", "op": "expand", "input": {
        "@context": {"@vocab": EX,
                     "g": {"@container": ["@graph", "@id"]}},
        "g": {"http://g.example/1": {"p": "v1"},
              "@none": {"p": "v2"}}}},
    {"name": "expand-index-property-index", "op": "expand", "input": {
        "@context": {"@vocab": EX,
                     "prop": {"@id": EX + "prop"},
                     "p": {"@container": "@index", "@index": "prop"}},
        "p": {"key1": {"q": "a"}, "key2": {"q": "b"}}}},
    {"name": "expand-set-in-language-map", "op": "expand", "input": {
        "@context": {"label": {"@id": EX + "label",
                               "@container": ["@language", "@set"]}},
        "label": {"en": ["one", "two"]}}},
    {"name": "expand-type-array-sorted-ctx", "op": "expand", "input": {
        "@context": {"@vocab": EX,
                     "B": {"@id": EX + "B",
                           "@context": {"x": EX + "fromB"}},
                     "A": {"@id": EX + "A",
                           "@context": {"x": EX + "fromA"}}},
        "@type": ["B", "A"], "x": "which"}},
    {"name": "expand-value-object-index", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@value": 42, "@index": "i0"}}},
    {"name": "expand-graph-keyword-alias", "op": "expand", "input": {
        "@context": {"graph": "@graph", "ex": EX},
        "@id": EX + "g1", "graph": [{"@id": EX + "s", "ex:p": "v"}]}},
    {"name": "expand-keyword-like-term-ignored", "op": "expand", "input": {
        "@context": {"@future": EX + "f", "ex": EX},
        "@future": "dropped", "ex:kept": "v"}},
    {"name": "expand-empty-term-vs-vocab", "op": "expand", "input": {
        "@context": {"@vocab": EX, "": EX + "empty/"},
        "ex-like": "v"}},
    {"name": "expand-curie-prefix-false", "op": "expand", "input": {
        "@context": {"pfx": {"@id": EX + "nons/", "@prefix": False},
                     "q": EX + "q"},
        "pfx:suffix": "dropped-or-kept?", "q": "v"}},
    {"name": "expand-relative-vocab", "op": "expand",
     "options": {"base": "http://base.example/doc"},
     "input": {"@context": {"@vocab": ""}, "term": "v"}},
    {"name": "tordf-list-of-lists", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:l": {"@list": [{"@list": [1, 2]}, "flat"]}}},
    {"name": "tordf-graph-container-bnode-graphs", "op": "toRdf", "input": {
        "@context": {"@vocab": EX, "g": {"@container": "@graph"}},
        "@id": EX + "s", "g": {"p": "v"}}},
    {"name": "tordf-reverse", "op": "toRdf", "input": {
        "@context": {"ex": EX, "children": {"@reverse": EX + "parent"}},
        "@id": EX + "s", "children": [{"@id": EX + "c1"},
                                      {"@id": EX + "c2"}]}},
    {"name": "tordf-xsd-typed", "op": "toRdf", "input": {
        "@context": {"ex": EX,
                     "d": {"@id": EX + "d",
                           "@type": "http://www.w3.org/2001/XMLSchema#date"}},
        "@id": EX + "s", "d": "2024-02-29"}},
    {"name": "tordf-numeric-double-typed-int", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:p": {"@value": 5,
                 "@type": "http://www.w3.org/2001/XMLSchema#double"}}},
    {"name": "tordf-boolean-typed-string", "op": "toRdf", "input": {
        "@context": {"ex": EX}, "@id": EX + "s",
        "ex:p": {"@value": "maybe",
                 "@type": "http://www.w3.org/2001/XMLSchema#boolean"}}},
    {"name": "compact-shortest-term-wins", "op": "compact",
     "input": {EX + "prop": [{"@value": "v"}]},
     "ctx": {"longer-name": EX + "prop", "p": EX + "prop"}},
    {"name": "compact-type-vs-plain", "op": "compact",
     "input": {EX + "p": [{"@value": "5",
                           "@type": "http://www.w3.org/2001/XMLSchema#integer"},
                          {"@value": "plain"}]},
     "ctx": {"typed": {"@id": EX + "p",
                       "@type": "http://www.w3.org/2001/XMLSchema#integer"},
             "plain": EX + "p"}},
    {"name": "compact-id-map", "op": "compact",
     "input": {EX + "p": [{"@id": EX + "a", EX + "v": [{"@value": 1}]},
                          {"@id": EX + "b", EX + "v": [{"@value": 2}]}]},
     "ctx": {"@vocab": EX, "p": {"@container": "@id"}}},
    {"name": "compact-type-map", "op": "compact",
     "input": {EX + "p": [
         {"@id": EX + "a", "@type": [EX + "T1"]},
         {"@id": EX + "b", "@type": [EX + "T2"]}]},
     "ctx": {"@vocab": EX, "p": {"@container": "@type"}}},
    {"name": "compact-nest", "op": "compact",
     "input": {"@id": EX + "s", EX + "a": [{"@value": 1}],
               EX + "b": [{"@value": 2}]},
     "ctx": {"@vocab": EX, "a": {"@nest": "@nest"},
             "meta": "@nest", "b": {"@nest": "meta"}}},
    {"name": "compact-list-of-lists", "op": "compact",
     "input": {EX + "l": [{"@list": [{"@list": [{"@value": 1}]}]}]},
     "ctx": {"l": {"@id": EX + "l", "@container": "@list"}}},
    {"name": "compact-language-index-pref", "op": "compact",
     "input": {EX + "p": [{"@value": "x", "@language": "en",
                           "@index": "i"}]},
     "ctx": {"byLang": {"@id": EX + "p", "@container": "@language"},
             "byIndex": {"@id": EX + "p", "@container": "@index"}}},
    {"name": "compact-reverse-in-ctx", "op": "compact",
     "input": {"@id": EX + "s",
               "@reverse": {EX + "rel": [
                   {"@id": EX + "a", EX + "q": [{"@value": 1}]}]}},
     "ctx": {"rev": {"@reverse": EX + "rel"}, "@vocab": EX}},
    {"name": "frame-embed-never", "op": "frame", "input": {
        "@context": {"ex": EX},
        "@graph": [{"@id": EX + "a", "@type": "ex:T",
                    "ex:link": {"@id": EX + "b"}},
                   {"@id": EX + "b", "ex:p": "v"}]},
     "frame": {"@context": {"ex": EX}, "@type": "ex:T",
               "@embed": "@never"}},
    {"name": "frame-explicit", "op": "frame", "input": {
        "@context": {"ex": EX},
        "@graph": [{"@id": EX + "a", "@type": "ex:T",
                    "ex:keep": "yes", "ex:drop": "no"}]},
     "frame": {"@context": {"ex": EX}, "@type": "ex:T",
               "@explicit": True, "ex:keep": {}}},
    {"name": "frame-default-value", "op": "frame", "input": {
        "@context": {"ex": EX},
        "@graph": [{"@id": EX + "a", "@type": "ex:T"}]},
     "frame": {"@context": {"ex": EX}, "@type": "ex:T",
               "ex:missing": {"@default": "filler"}}},
    {"name": "frame-requireall", "op": "frame", "input": {
        "@context": {"ex": EX},
        "@graph": [
            {"@id": EX + "a", "@type": "ex:T", "ex:p": "1", "ex:q": "2"},
            {"@id": EX + "b", "@type": "ex:T", "ex:p": "1"}]},
     "frame": {"@context": {"ex": EX}, "@requireAll": True,
               "@type": "ex:T", "ex:p": {}, "ex:q": {}}},
    {"name": "flatten-bnode-naming-order", "op": "flatten", "input": {
        "@context": {"ex": EX},
        "ex:z": {"ex:name": "second"},
        "ex:a": {"ex:name": "first"}}},
    {"name": "merge-no-merge-nodes", "op": "merge",
     "options": {"mergeNodes": False},
     "input": [
        {"@context": {"ex": EX}, "@id": EX + "s", "ex:p": "doc0"},
        {"@context": {"ex": EX}, "@id": EX + "s", "ex:p": "doc1",
         "ex:extra": "x"},
        {"@context": {"ex": EX}, "@id": EX + "t", "ex:q": "new"}]},
    {"name": "err-protected-redefine", "op": "expand", "input": {
        "@context": [{"@protected": True, "p": EX + "p1"},
                     {"p": EX + "p2"}],
        "p": "v"}},
    {"name": "err-invalid-reverse-value", "op": "expand", "input": {
        "@context": {"ex": EX},
        "@id": EX + "s", "@reverse": {"ex:p": {"@value": "v"}}}},
    {"name": "err-invalid-type-value", "op": "expand", "input": {
        "@context": {"ex": EX}, "@type": 42, "ex:p": "v"}},
    {"name": "err-invalid-language-map", "op": "expand", "input": {
        "@context": {"label": {"@id": EX + "label",
                               "@container": "@language"}},
        "label": {"en": 42}}},
    {"name": "err-invalid-index", "op": "expand", "input": {
        "@context": {"ex": EX}, "@index": 42, "ex:p": "v"}},
    {"name": "err-context-overflow-missing-remote", "op": "expand",
     "input": {"@context": "http://missing.example/ctx", EX + "p": "v"}},
    {"name": "remote-context-chain", "op": "expand",
     "documents": {
         "http://ctx.example/a": {"@context": {
             "@vocab": EX, "extra": "http://ctx.example/b"}},
         "http://ctx.example/b": {"@context": {"b": EX + "b"}}},
     "input": {"@context": ["http://ctx.example/a",
                            "http://ctx.example/b"],
               "term": "v", "b": "w"}},
]

# --- json-ld-1.0 processing mode ---
CASES += [
    {"name": "expand-10-simple-term-prefix", "op": "expand",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": {"pfx": EX + "base-no-delim"},
               "pfx:suffix": "v", "pfx": "w"}},
    {"name": "err-10-graph-container", "op": "expand",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": {"g": {"@id": EX + "g",
                                  "@container": "@graph"}},
               "g": {"p": "v"}}},
    {"name": "err-10-version-conflict", "op": "expand",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": {"@version": 1.1, "ex": EX}, "ex:p": "v"}},
    {"name": "err-10-nest", "op": "expand",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": {"@vocab": EX, "meta": "@nest"},
               "meta": {"p": "v"}}},
    {"name": "expand-10-included-ignored", "op": "expand",
     "options": {"processingMode": "json-ld-1.0"},
     "input": {"@context": {"@vocab": EX}, "@id": EX + "s",
               "p": "v"}},
    {"name": "expand-import", "op": "expand",
     "documents": {"http://ctx.example/base": {
         "@context": {"base-term": EX + "from-import"}}},
     "input": {"@context": {"@import": "http://ctx.example/base",
                            "local": EX + "local"},
               "base-term": "a", "local": "b"}},
    {"name": "expand-context-null-reset", "op": "expand", "input": {
        "@context": [{"@vocab": EX, "p": EX + "p0"}, None,
                     {"q": EX + "q1"}],
        "p": "dropped?", "q": "kept"}},
    {"name": "compact-graph-explicit", "op": "compact",
     "input": [{"@id": EX + "g1",
                "@graph": [{"@id": EX + "s",
                            EX + "p": [{"@value": "v"}]}]}],
     "ctx": {"ex": EX}},
]

# --- option matrix ---
CASES += [
    {"name": "tordf-generalized-rdf", "op": "toRdf",
     "options": {"produceGeneralizedRdf": True},
     "input": {"@context": {"bp": "_:bpred"}, "@id": EX + "s",
               "_:bpred": "v"}},
    {"name": "tordf-no-generalized-rdf", "op": "toRdf",
     "options": {"produceGeneralizedRdf": False},
     "input": {"@context": {"bp": "_:bpred"}, "@id": EX + "s",
               "_:bpred": "v"}},
    {"name": "compact-no-compact-arrays", "op": "compact",
     "options": {"compactArrays": False},
     "input": {"@id": EX + "s", EX + "p": [{"@value": "single"}]},
     "ctx": {"p": EX + "p"}},
    {"name": "compact-graph-option", "op": "compact",
     "options": {"graph": True},
     "input": [{"@id": EX + "s", EX + "p": [{"@value": "v"}]}],
     "ctx": {"p": EX + "p"}},
    {"name": "frame-omit-graph-false", "op": "frame",
     "options": {"omitGraph": False},
     "input": {"@context": {"ex": EX},
               "@id": EX + "a", "@type": "ex:T", "ex:p": "v"},
     "frame": {"@context": {"ex": EX}, "@type": "ex:T"}},
    {"name": "frame-omit-default", "op": "frame",
     "options": {"omitDefault": True},
     "input": {"@context": {"ex": EX}, "@id": EX + "a", "@type": "ex:T"},
     "frame": {"@context": {"ex": EX}, "@type": "ex:T",
               "ex:absent": {"@default": "x"}}},
    {"name": "expand-keep-free-floating", "op": "expand",
     "options": {"keepFreeFloatingNodes": True},
     "input": [{"@id": EX + "only-id"}, {"@value": "fv"}]},
    # compactToRelative=false clears base pre-expansion
    # (lib/jsonld.js:144,158): IRIs stay absolute
    {"name": "compact-to-relative-false", "op": "compact",
     "options": {"base": "http://base.example/dir/",
                 "compactToRelative": False},
     "input": {"@id": "http://base.example/dir/doc",
               EX + "p": [{"@id": "http://base.example/dir/other"}]},
     "ctx": {"p": {"@id": EX + "p", "@type": "@id"}}},
    # ...but an explicit @base in the compaction CONTEXT still
    # relativizes (compact.js:948)
    {"name": "compact-to-relative-false-ctx-base", "op": "compact",
     "options": {"base": "http://unused.example/",
                 "compactToRelative": False},
     "input": {"@id": "http://ctxbase.example/a",
               EX + "p": [{"@id": "http://ctxbase.example/b"}]},
     "ctx": {"@base": "http://ctxbase.example/",
             "p": {"@id": EX + "p", "@type": "@id"}}},
    # default (true): same doc relativizes against options.base
    {"name": "compact-to-relative-default", "op": "compact",
     "options": {"base": "http://base.example/dir/"},
     "input": {"@id": "http://base.example/dir/doc",
               EX + "p": [{"@id": "http://base.example/dir/other"}]},
     "ctx": {"p": {"@id": EX + "p", "@type": "@id"}}},
]

# --- error-code matrix (negative-evaluation parity, SURVEY §7.4.7) ---
CASES += [
    {"name": "err-bad-container-combo", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p",
                           "@container": ["@list", "@set"]}}, "p": "v"}},
    {"name": "err-bad-container-value", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p", "@container": "@bogus"}},
        "p": "v"}},
    {"name": "err-invalid-prefix-value", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p", "@prefix": "yes"}},
        "p": "v"}},
    {"name": "err-invalid-nest-value", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p", "@nest": "@id"}}, "p": "v"}},
    {"name": "err-invalid-propagate", "op": "expand", "input": {
        "@context": {"@propagate": "yes", "ex": EX}, "ex:p": "v"}},
    {"name": "err-invalid-import-value", "op": "expand", "input": {
        "@context": {"@import": 5, "ex": EX}, "ex:p": "v"}},
    {"name": "err-invalid-base", "op": "expand", "input": {
        "@context": {"@base": 5, "ex": EX}, "ex:p": "v"}},
    {"name": "err-invalid-vocab", "op": "expand", "input": {
        "@context": {"@vocab": 7}, "p": "v"}},
    {"name": "err-invalid-default-language", "op": "expand", "input": {
        "@context": {"@language": 5, "ex": EX}, "ex:p": "v"}},
    {"name": "err-invalid-language-tagged-string", "op": "expand",
     "input": {"@context": {"ex": EX},
               "ex:p": {"@value": "v", "@language": 7}}},
    {"name": "err-invalid-term-language", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p", "@language": 9}}, "p": "v"}},
    {"name": "err-invalid-index-value", "op": "expand", "input": {
        "@context": {"ex": EX}, "ex:p": {"@value": "v", "@index": 5},
        "@id": EX + "s"}},
    {"name": "err-invalid-reverse-obj", "op": "expand", "input": {
        "@context": {"ex": EX}, "@id": EX + "s", "@reverse": "notobj"}},
    {"name": "err-invalid-reverse-def", "op": "expand", "input": {
        "@context": {"r": {"@reverse": EX + "r", "@id": EX + "x"}},
        "r": "v"}},
    {"name": "err-reverse-relative", "op": "expand", "input": {
        "@context": {"r": {"@reverse": "notabsolute"}}, "r": "v"}},
    {"name": "err-set-with-extra", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@set": ["a"], "@id": EX + "x"}}},
    {"name": "err-list-with-extra", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@list": ["a"], "ex:q": "b"}}},
    {"name": "err-value-with-extra", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@value": "v", "ex:extra": 1}}},
    {"name": "err-value-object-value", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@value": {"not": "scalar"}}}},
    {"name": "err-bnode-typed-value", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@value": "v", "@type": "_:b0"}}},
    {"name": "err-keyword-as-reverse-prop", "op": "expand", "input": {
        "@context": {"ex": EX},
        "@id": EX + "s", "@reverse": {"@type": EX + "T"}}},
    {"name": "err-term-def-unknown-key", "op": "expand", "input": {
        "@context": {"p": {"@id": EX + "p", "@bogus": 1}}, "p": "v"}},
    {"name": "err-term-def-nonobject", "op": "expand", "input": {
        "@context": {"p": 42}, "p": "v"}},
    {"name": "err-empty-term", "op": "expand", "input": {
        "@context": {"": EX + "empty"}, "x": "v"}},
    {"name": "err-graph-scalar", "op": "expand", "input": {
        "@context": {"ex": EX}, "@graph": "scalar"}},
    {"name": "err-direction-bad", "op": "expand", "input": {
        "@context": {"ex": EX},
        "ex:p": {"@value": "v", "@direction": "up"}}},
    {"name": "err-ctx-direction-bad", "op": "expand", "input": {
        "@context": {"@direction": "sideways", "ex": EX}, "ex:p": "v"}},
    {"name": "err-alias-context", "op": "expand", "input": {
        "@context": {"c": "@context"}, EX + "p": "v"}},
    {"name": "err-index-container-nonstring-index", "op": "expand",
     "input": {"@context": {"p": {"@id": EX + "p",
                                  "@container": "@index",
                                  "@index": "@bad"}},
               "p": {"i": "v"}}},
    {"name": "err-nest-value-nonobject", "op": "expand", "input": {
        "@context": {"@vocab": EX, "meta": "@nest"},
        "@id": EX + "s", "meta": "scalar"}},
]

# --- high-effort review regression cases ---
CASES += [
    {"name": "expand-prefix-form-term-with-id", "op": "expand", "input": {
        "@context": {"foaf": "http://xmlns.com/foaf/0.1/",
                     "foaf:name": {"@id": "http://xmlns.com/foaf/0.1/name"}},
        "foaf:name": "Alice", "foaf:age": 30}},
    {"name": "expand-scoped-context-null", "op": "expand", "input": {
        "@context": {"@vocab": "http://v/",
                     "term": {"@id": "http://v/term", "@context": None}},
        "term": {"a": "x"}, "b": "y"}},
    {"name": "expand-term-direction-with-type", "op": "expand", "input": {
        "@context": {"p": {"@id": "http://ex/p",
                           "@container": "@language",
                           "@direction": "rtl"}},
        "p": {"en": "hello"}}},
    {"name": "expand-direction-lost-across-contexts", "op": "expand",
     "input": {"@context": [{"@vocab": "http://v/", "@direction": "rtl"},
                            {"@language": "en"}],
               "p": "x"}},
    {"name": "err-type-redefine-empty-object", "op": "expand", "input": {
        "@context": {"@type": {}}, "http://e/p": "v"}},
    {"name": "expand-protected-then-ignored-term-then-null", "op": "expand",
     "input": {"@context": [{"@protected": True,
                             "term": {"@id": "@future"}},
                            None,
                            {"q": "http://e/q"}],
               "q": "v"}},
    {"name": "frame-embed-first-accepted", "op": "frame", "input": {
        "@context": {"ex": EX},
        "@graph": [{"@id": EX + "a", "@type": "ex:T",
                    "ex:p": {"@id": EX + "b"}},
                   {"@id": EX + "b", "ex:q": "v"}]},
     "frame": {"@context": {"ex": EX}, "@type": "ex:T",
               "@embed": "@first"}},
    {"name": "compact-scoped-context-null", "op": "compact",
     "input": [{"http://v/term": [{"http://v/a": [{"@value": "x"}]}]}],
     "ctx": {"@vocab": "http://v/",
             "term": {"@id": "http://v/term", "@context": None}}},
]
