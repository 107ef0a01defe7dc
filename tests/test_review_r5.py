"""Round-5 review pins: _pin block coalescing, the distributed pair
dedup, and the large-offset gram list array."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_pin_coalesces_tiny_blocks(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.entity_merge import _pin

    ds = rd.range(10_000).map_batches(
        lambda b: pa.table({"x": b["id"]}), batch_format="pyarrow")
    ds = ds.repartition(64).materialize()
    assert ds.num_blocks() == 64
    pinned = _pin(ds)
    assert pinned.num_blocks() <= 2          # 10k rows → 1 block target
    assert pinned.count() == 10_000
    got = sorted(pinned.to_pandas()["x"])
    assert got == list(range(10_000))        # rows preserved exactly


def test_pin_leaves_large_blocks_alone(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.entity_merge import (_PIN_TARGET_ROWS,
                                                   _pin)

    n_blocks = 4
    ds = rd.range(_PIN_TARGET_ROWS * n_blocks).map_batches(
        lambda b: pa.table({"x": b["id"]}), batch_format="pyarrow") \
        .repartition(n_blocks).materialize()
    pinned = _pin(ds)
    # blocks already at target → no repartition move
    assert pinned.num_blocks() == n_blocks
    assert pinned.count() == _PIN_TARGET_ROWS * n_blocks


def test_dedupe_pairs_ds_global(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.dedup import _dedupe_pairs_ds

    # duplicates spread across many input blocks must still collapse
    df = pd.DataFrame({"a": [1, 1, 2, 2, 1, 3] * 500,
                       "b": [2, 2, 3, 3, 2, 9] * 500})
    ds = rd.from_pandas(df).repartition(16)
    out = _dedupe_pairs_ds(ds).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert out.equals(pd.DataFrame({"a": [1, 2, 3], "b": [2, 3, 9]}))


def test_gram_list_array_large_offsets():
    from jsonld_js_ray.stages.dedup import _gram_list_array

    arrays = [np.arange(5, dtype=np.uint64),
              np.zeros(0, dtype=np.uint64),
              np.arange(3, dtype=np.uint64)]
    arr = _gram_list_array(arrays, 3)
    assert pa.types.is_large_list(arr.type)   # int64 offsets by type
    assert arr.to_pylist() == [list(range(5)), [], [0, 1, 2]]


def test_canonize_treats_dataset_as_set():
    """An RDF dataset is a SET of quads (RDF 1.1 Concepts §4): a
    duplicated quad must not perturb canonical labels. Found by fuzz
    seed 864917, where the reference fork emits a duplicate value-quad
    through its broken @type-container+@list path — rdf-canonize
    dedupes at N-Quads parse, so matching its comparison semantics
    requires deduping the in-memory multiset too. Covers both the
    hashable fast path and the unhashable (list-typed datatype)
    fallback the fork's bug produces."""
    from jsonld_js_ray.core.canonize import canonize

    q1 = (("BlankNode", "_:b0"), ("NamedNode", "http://e/p"),
          ("Literal", "x", "http://www.w3.org/2001/XMLSchema#string",
           None), ("DefaultGraph", ""))
    q2 = (("BlankNode", "_:b0"), ("NamedNode", "http://e/q"),
          ("BlankNode", "_:b1"), ("DefaultGraph", ""))
    assert canonize([q1, q2, q1]) == canonize([q1, q2])
    # unhashable datatype term (the fork's ['@list'] artifact)
    q3 = (("BlankNode", "_:b0"), ("NamedNode", "http://e/r"),
          ("Literal", "true", ["@list"], None), ("DefaultGraph", ""))
    assert canonize([q1, q3, q3]) == canonize([q1, q3])


def test_distinct_doc_window_hashes_matches_string_path():
    """The chained window hash must induce the SAME (doc, window)
    identity partition as the string-building path it replaced."""
    from jsonld_js_ray.stages.ngrams import (_distinct_doc_grams,
                                             _distinct_doc_window_hashes)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e f",
            "a b c d e f",            # identical → same windows
            "x y z a b c d",          # shares the tail window set
            "one two",                # too short for n=4 → no windows
        ], pa.string()),
    })
    n = 4
    s = _distinct_doc_grams(docs, n)
    h = _distinct_doc_window_hashes(docs, n)
    grams, sids, _ = s
    hids, hh = h
    # same number of distinct (doc, window) rows
    assert len(sids) == len(hids)
    # equal string windows ⇔ equal hashes: group rows by window on
    # each side and compare the doc-set partition
    by_str: dict = {}
    for g, d in zip(grams, sids):
        by_str.setdefault(g, set()).add(int(d))
    by_hash: dict = {}
    for d, v in zip(hids, hh):
        by_hash.setdefault(int(v), set()).add(int(d))
    assert sorted(map(sorted, by_str.values())) == \
        sorted(map(sorted, by_hash.values()))
