"""Round-4 task 3: the decontamination multi-pattern scale path.

Pins that the rolling-hash matcher (a) equals the naive per-snippet
containment count exactly — including multiplicities, repeats within a
text, overlapping probes and multi-byte UTF-8 — and (b) takes one scan
per distinct probe LENGTH, not per probe (the 10^4-probe requirement
from VERDICT r3 #3)."""

from __future__ import annotations

import numpy as np
import pytest

from jsonld_js_ray.stages.text import (DECONTAM_VEC_MIN_PROBES,
                                       _group_probes,
                                       _multi_substring_hits)


def _naive(texts, snips):
    return np.array([sum(1 for s in snips if s in t) for t in texts],
                    dtype=np.int64)


def test_matches_naive_small_cases():
    texts = ["abcdef", "xxabcxx", "", "ααβγδ-abc", "aaaa"]
    snips = ["abc", "abc", "aa", "αβ", "zz", "f", "aaaa"]
    got = _multi_substring_hits(texts, _group_probes(snips))
    np.testing.assert_array_equal(got, _naive(texts, snips))


def test_repeat_occurrences_count_once():
    # "ab" occurs 3 times in text 0 but is CONTAINED once; its probe
    # multiplicity of 2 applies once
    got = _multi_substring_hits(["ababab"], _group_probes(["ab", "ab"]))
    np.testing.assert_array_equal(got, [2])


def test_ten_thousand_probes_single_pass_per_length():
    """10^4 probes, one distinct length → the matcher does ONE scan
    (probe-count-independent), and matches the naive count on a
    corpus where ~1% of probes are planted."""
    rng = np.random.RandomState(7)
    vocab = [f"w{i:04d}" for i in range(3000)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(200)]
    # probes: 64-char prefixes of randomly generated strings + 100
    # REAL prefixes planted from the texts themselves
    probes = ["".join(rng.choice(list("abcdefgh"), 64))
              for _ in range(9900)]
    probes += [t[:64] for t in texts[:100]]
    grouped = _group_probes(probes)
    assert len(grouped) == 1            # one distinct byte-length
    got = _multi_substring_hits(texts, grouped)
    exp = np.zeros(len(texts), np.int64)
    planted = set(t[:64] for t in texts[:100])
    for i, t in enumerate(texts):
        exp[i] = sum(1 for s in planted if s in t)
    np.testing.assert_array_equal(got, exp)
    assert got.sum() >= 100             # every planted prefix hits


def test_marker_switches_paths_identically(ray_session):
    """ContaminationMarker's two paths (per-snippet loop vs rolling
    hash) produce identical tables on the same batch."""
    import pyarrow as pa
    import ray

    from jsonld_js_ray.stages.text import ContaminationMarker

    texts = [f"document number {i} with shared marker SNIPPET-{i % 7}"
             for i in range(300)]
    batch = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    few = ["SNIPPET-3", "number 42"]                 # loop path
    many = few + [f"no-such-{i}" for i in range(DECONTAM_VEC_MIN_PROBES)]
    out_few = ContaminationMarker(ray.put(few))(batch)
    out_many = ContaminationMarker(ray.put(many))(batch)
    np.testing.assert_array_equal(
        out_few["n_hits"].to_numpy(),
        out_many["n_hits"].to_numpy())   # padding probes never match


def test_decontaminate_query_unchanged(ray_session):
    """End-to-end: the decontaminate row still matches its SQL oracle
    at sf0.001. Since the crossover re-measure (round 5) the small
    probe set there takes the loop path; the rolling-hash path's
    equivalence to it is pinned by the tests above on 10^4 probes."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    mine = E.queries()["decontaminate"](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf}/documents.parquet'")
    orc = con.sql(E.oracle_sql()["decontaminate"]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
