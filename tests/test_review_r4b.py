"""Round-4 code-review regression tests (second review pass):

1. RE2-'\\S+' tokenizer parity: the engine's dedup tokenizer must
   agree with DuckDB's regexp_extract_all(..., '\\S+') on exotic
   whitespace (\\x0b, NBSP, ideographic space) where str.split()
   diverges.
2. hamming_pairs: the connectivity-exact unique-signature reduction
   produces the same cluster labels as brute-force all-pairs Hamming,
   and a bucket of m identical signatures emits O(m) edges, not O(m²).
3. rollup._enc/_dec: a value containing the fused-key separator (or
   the escape char) round-trips exactly through a multi-field key
   decoded by splitting — verified end-to-end via ab_metrics vs its
   SQL oracle.
4. conformance runner: a JSON-array-root manifest or entry is recorded
   as a skip, never an AttributeError abort.

Test style mirrors the reference's golden comparisons
(tests/test-common.js:747-760): engine vs DuckDB on the same input.
"""

from __future__ import annotations

import datetime as dt
import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# strings where Python str.split() and RE2 '\S+' disagree, plus
# plain ones where they agree
WS_CASES = [
    "a\x0bb",               # vertical tab: RE2 keeps it inside a token
    "a b",             # NBSP
    "a b",             # line separator
    "a　b",             # ideographic space
    "a\x85b",               # NEL
    " a  b\tc\nd\re\ff ",   # ASCII whitespace: both split
    "",
    "\x0b",
    "héllo wörld\x0b mix",
]


def _duck_tokens(s: str) -> list[str]:
    import duckdb
    con = duckdb.connect()
    try:
        return con.execute(
            r"SELECT regexp_extract_all(?, '\S+')", [s]).fetchone()[0]
    finally:
        con.close()


def test_ws_tokens_matches_duckdb_re2():
    from jsonld_js_ray.stages.dedup import ws_tokens

    for s in WS_CASES:
        assert ws_tokens(s) == _duck_tokens(s), repr(s)


def test_ws_tokens_fastpath_equivalence_fuzz():
    """ws_tokens has a str.split() fast path gated on an exotic-
    whitespace scan; fuzz both paths against DuckDB RE2 over an
    alphabet that mixes ASCII ws, exotic ws, and text."""
    import random

    import duckdb

    from jsonld_js_ray.stages.dedup import ws_tokens

    con = duckdb.connect()
    try:
        random.seed(7)
        alphabet = list("ab \t\n\f\r\x0b\x1c\x85\xa0 　xyz.!")
        for _ in range(500):
            s = "".join(random.choice(alphabet)
                        for _ in range(random.randint(0, 30)))
            got = ws_tokens(s)
            want = con.execute(
                r"SELECT regexp_extract_all(?, '\S+')", [s]).fetchone()[0]
            assert got == want, repr(s)
    finally:
        con.close()


def test_str_split_would_diverge():
    """Meta-test: the divergence ws_tokens exists to prevent is real —
    if this ever fails, str.split() became RE2-compatible and the
    helper could be dropped."""
    assert "a\x0bb".split() != _duck_tokens("a\x0bb")


def test_simhash_signature_sql_parity_exotic_ws():
    """simhash64 must agree with the SIMHASH_DEDUP_SQL signature
    construction on a document containing \\x0b / NBSP."""
    import duckdb

    from jsonld_js_ray.stages.dedup import simhash64

    text = "Alpha\x0bBeta gamma delta gamma"
    sig_sql = r"""
    WITH tok AS (
      SELECT t AS tok, CAST(count(*) AS BIGINT) AS w
      FROM unnest(regexp_extract_all(lower(?), '\S+')) AS u(t)
      GROUP BY 1
    ),
    th AS (
      SELECT CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT)
                 AS h, w
      FROM tok
    ),
    votes AS (
      SELECT b, sum(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) AS v
      FROM th, unnest(generate_series(0, 63)) AS g(b) GROUP BY 1
    )
    SELECT sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b
                    ELSE CAST(0 AS UBIGINT) END) AS sh
    FROM votes
    """
    con = duckdb.connect()
    try:
        expected = int(con.execute(sig_sql, [text]).fetchone()[0])
    finally:
        con.close()
    assert simhash64(text) == expected


# --- hamming_pairs ---

def _labels_from_edges(ids, a, b):
    from jsonld_js_ray.stages.dedup import _UnionFind

    uf = _UnionFind()
    for i in ids:
        uf.union(int(i), int(i))
    for x, y in zip(a, b):
        uf.union(int(x), int(y))
    cl = uf.cluster_map()
    return {int(i): cl.get(int(i), int(i)) for i in ids}


def _brute_edges(ids, sigs, max_h):
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(sigs[i]) ^ int(sigs[j])).count("1") <= max_h:
                a.append(ids[i])
                b.append(ids[j])
    return a, b


@pytest.mark.parametrize("seed", range(5))
def test_hamming_pairs_closure_equals_bruteforce(seed):
    from jsonld_js_ray.stages.dedup import hamming_pairs

    rng = np.random.RandomState(seed)
    # small signature alphabet + bit noise → plenty of identical and
    # near-identical signatures
    base = rng.randint(0, 1 << 16, size=8).astype(np.uint64)
    picks = base[rng.randint(0, 8, size=60)]
    noise = (np.uint64(1) << rng.randint(0, 64, size=60).astype(
        np.uint64)) * (rng.rand(60) < 0.4).astype(np.uint64)
    sigs = picks ^ noise
    ids = np.arange(100, 100 + 60, dtype=np.int64)
    a, b = hamming_pairs(ids, sigs, 3)
    assert (a < b).all()
    got = _labels_from_edges(ids, a, b)
    exp = _labels_from_edges(ids, *_brute_edges(ids, sigs, 3))
    assert got == exp


def test_hamming_pairs_identical_bucket_is_linear():
    """m identical signatures → exactly m-1 star edges (the O(m²)
    blowup the unique-signature reduction removes) and no ×64
    unpackbits expansion anywhere."""
    from jsonld_js_ray.stages.dedup import hamming_pairs

    m = 5000
    ids = np.arange(m, dtype=np.int64)
    sigs = np.full(m, 0xDEADBEEF, dtype=np.uint64)
    a, b = hamming_pairs(ids, sigs, 3)
    assert len(a) == m - 1
    assert (a == 0).all()           # star center = min id
    got = _labels_from_edges(ids, a, b)
    assert set(got.values()) == {0}


def test_hamming_pairs_empty_and_single():
    from jsonld_js_ray.stages.dedup import hamming_pairs

    for n in (0, 1):
        ids = np.arange(n, dtype=np.int64)
        sigs = np.zeros(n, dtype=np.uint64)
        a, b = hamming_pairs(ids, sigs, 3)
        assert len(a) == 0 and len(b) == 0


# --- separator-safe _enc/_dec ---

def test_enc_dec_roundtrip_separator_values():
    import pyarrow.compute as pc

    from jsonld_js_ray.stages.rollup import _SEP, _dec, _enc

    vals = ["plain", "with\x1fsep", "\x1e", "\x1e\x1f", "\x1f\x1e\x1f",
            None, "None", "", "\x1e1", "\x1e0\x1f1"]
    enc = _enc(pa.array(vals, pa.string()))
    # the invariant that makes multi-field split-decoding exact:
    assert not any(_SEP in e for e in enc)
    dec = _dec(pa.array(enc, pa.string())).to_pylist()
    assert dec == vals


def test_fused_two_field_key_split_decode_exact():
    """Two fields, both containing the separator, fused with \\x1f and
    decoded by split: each side must come back byte-exact."""
    import pyarrow.compute as pc

    from jsonld_js_ray.stages.rollup import _dec, _enc

    f1 = ["a\x1fb", "x", None]
    f2 = ["c", "d\x1f\x1ee", None]
    key = np.char.add(
        np.char.add(_enc(pa.array(f1, pa.string())), "\x1f"),
        _enc(pa.array(f2, pa.string())))
    parts = pc.split_pattern(pa.array(key.tolist(), pa.string()),
                             pattern="\x1f")
    assert _dec(pc.list_element(parts, 0)).to_pylist() == f1
    assert _dec(pc.list_element(parts, 1)).to_pylist() == f2


def test_ab_metrics_event_type_with_separator(ray_session, tmp_path):
    """End-to-end: an event_type containing \\x1f survives ab_metrics'
    fused key and matches the SQL oracle byte-exactly (the review's
    truncation scenario: 'click\\x1fbeta' must NOT decode as 'click')."""
    import duckdb

    import __ray_entry__ as E
    from jsonld_js_ray.stages.ab import ab_metrics

    types = ["click\x1fbeta", "click", "click\x1fbeta", "view", None]
    n = len(types)
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * n,
                       pa.timestamp("us")),
        "user_id": pa.array([i % 3 + 1 for i in range(n)], pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    mine = ab_metrics(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
        orc = con.sql(E.oracle_sql()["ab_metrics"]).df()
    finally:
        con.close()
    cols = sorted(mine.columns)
    assert cols == sorted(orc.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    assert "click\x1fbeta" in set(mine["event_type"].dropna())


# --- conformance array-root hardening ---

def test_conformance_array_root_entry_recorded_not_fatal(tmp_path):
    from jsonld_js_ray.conformance import run_manifest

    (tmp_path / "arr.jsonld").write_text(json.dumps([1, 2, 3]))
    man = {
        "@context": {},
        "name": "array-root fixture",
        "sequence": ["arr.jsonld"],
    }
    (tmp_path / "manifest.jsonld").write_text(json.dumps(man))
    report = run_manifest(str(tmp_path / "manifest.jsonld"))
    assert report["fail"] == 0
    assert report["skip"] == 1
    assert any("not a JSON object" in reason
               for _, reason in report["skips"])


def test_conformance_array_root_manifest_recorded_not_fatal(tmp_path):
    from jsonld_js_ray.conformance import run_manifest

    (tmp_path / "manifest.jsonld").write_text(json.dumps(["x"]))
    report = run_manifest(str(tmp_path / "manifest.jsonld"))
    assert report["fail"] == 0
    assert report["skip"] == 1
