"""Representation-kernel unit + property tests.

Mirrors the reference's correctness reasoning for its numeric kernels
(SURVEY.md §5): MinHash signature overlap must estimate exact Jaccard;
SimHash Hamming distance must track token-multiset distance; winnowing must
guarantee shared fingerprints for long shared runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.functions import represent


def _repr_rows(texts: list[str], config: DedupConfig, spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = represent.with_representation(df, config, "doc_id", "text")
    return {r["id"]: r.asDict() for r in out.collect()}


CFG = DedupConfig(shingle_k=3, num_perms=64, bands=16, rows_per_band=4)


def test_identical_texts_identical_representation(spark):
    rows = _repr_rows(["a b c d e f g", "a b c d e f g"], CFG, spark)
    assert rows[0]["signature"] == rows[1]["signature"]
    assert rows[0]["shingle_set"] == rows[1]["shingle_set"]
    assert rows[0]["simhash"] == rows[1]["simhash"]
    assert rows[0]["winnow_fps"] == rows[1]["winnow_fps"]


def test_normalization_invariance(spark):
    rows = _repr_rows(["Hello,   World! Foo-bar baz", "hello world foo bar baz"], CFG, spark)
    assert rows[0]["signature"] == rows[1]["signature"]
    assert rows[0]["shingle_set"] == rows[1]["shingle_set"]


def test_disjoint_texts_disjoint_shingles(spark):
    rows = _repr_rows(["a b c d e f", "x y z w v u"], CFG, spark)
    assert not set(rows[0]["shingle_set"]) & set(rows[1]["shingle_set"])


def test_short_and_empty_docs(spark):
    rows = _repr_rows(["", "one", "one two"], CFG, spark)
    assert rows[0]["shingle_set"] == [0]
    assert len(rows[0]["signature"]) == CFG.num_perms
    assert rows[0]["simhash"] == 0
    assert len(rows[1]["shingle_set"]) == 1 and rows[1]["shingle_set"] != [0]
    assert rows[2]["shingle_set"] != rows[1]["shingle_set"]


def test_signature_shape_and_determinism(spark):
    rows = _repr_rows(
        ["some words repeated some words again"] * 2, CFG, spark
    )
    sig = rows[0]["signature"]
    assert len(sig) == CFG.num_perms
    assert sig == rows[1]["signature"]
    # full-range int64 domain (multiply-shift mod 2^64, signed view)
    assert any(v < 0 for v in sig) or any(v > 2**31 for v in sig)


def test_minhash_estimates_jaccard(spark):
    """Property: signature agreement ≈ exact Jaccard (±0.15 at 64 perms)."""
    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(300)]
    base = list(rng.choice(vocab, size=200))
    # perturb 10% of tokens
    mod = list(base)
    for i in rng.choice(len(mod), size=20, replace=False):
        mod[i] = "zz" + mod[i]
    rows = _repr_rows([" ".join(base), " ".join(mod)], CFG, spark)
    s1, s2 = set(rows[0]["shingle_set"]), set(rows[1]["shingle_set"])
    exact_j = len(s1 & s2) / len(s1 | s2)
    sig1, sig2 = rows[0]["signature"], rows[1]["signature"]
    est_j = sum(a == b for a, b in zip(sig1, sig2)) / len(sig1)
    assert abs(est_j - exact_j) < 0.15


def test_simhash_hamming_tracks_similarity(spark):
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(500)]
    base = list(rng.choice(vocab, size=300))
    near = list(base)
    near[5] = "zz1"
    far = list(rng.choice(vocab, size=300))
    rows = _repr_rows([" ".join(base), " ".join(near), " ".join(far)], CFG, spark)
    h = lambda a, b: bin(rows[a]["simhash"] ^ rows[b]["simhash"]).count("1")
    assert h(0, 1) <= 6
    assert h(0, 2) > 10


def test_winnow_guarantee_shared_run(spark):
    """A shared run of >= k + w - 1 words guarantees a shared fingerprint."""
    k, w = CFG.shingle_k, represent.WINNOW_WINDOW
    rng = np.random.default_rng(3)
    shared = [f"s{i}" for i in range(k + w - 1)]
    a = [f"a{i}" for i in range(50)] + shared + [f"b{i}" for i in range(50)]
    b = [f"c{i}" for i in range(50)] + shared + [f"d{i}" for i in range(50)]
    rows = _repr_rows([" ".join(a), " ".join(b)], CFG, spark)
    assert set(rows[0]["winnow_fps"]) & set(rows[1]["winnow_fps"])


def test_empty_rows_do_not_corrupt_neighbors(spark):
    """Regression (ADVICE r01, high): reduceat offsets clamped to total-1
    truncated the previous row's segment whenever trailing rows had zero
    tokens — a short doc followed by an empty doc got a wrong shingle hash
    and a wrong simhash. Representations must be position-independent."""
    texts = ["one two", "", "one", "", ""]
    batched = _repr_rows(texts, CFG, spark)
    for i, t in enumerate(texts):
        alone = _repr_rows([t], CFG, spark)[0]
        for col in ("shingle_set", "signature", "winnow_fps", "simhash"):
            assert batched[i][col] == alone[col], (
                f"doc {i} ({t!r}) {col} depends on batch layout"
            )


def test_kernel_numpy_paths_empty_row_layouts():
    """Direct numpy checks of _shingle_hashes/_simhash across empty-row
    placements (leading / mid / trailing / all-empty)."""
    coeffs = represent.shingle_coeffs64(CFG)
    layouts = [
        ([2, 0], [11, 22]),
        ([0, 2], [11, 22]),
        ([2, 0, 1], [11, 22, 33]),
        ([0, 0], []),
        ([1, 0, 0], [7]),
    ]
    for lengths, flat in layouts:
        lengths = np.array(lengths, dtype=np.int64)
        flat = np.array(flat, dtype=np.uint64)
        offsets = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        sh, m, _ = represent._shingle_hashes(flat, lengths, offsets, coeffs)
        sim = represent._simhash(flat, lengths, offsets, 8)
        pos = 0
        for r, n in enumerate(lengths):
            row = flat[pos : pos + n]
            one_sh, _, _ = represent._shingle_hashes(
                row, np.array([n]), np.array([0]), coeffs
            )
            one_sim = represent._simhash(row, np.array([n]), np.array([0]), 8)
            s0 = int(np.cumsum(np.concatenate([[0], m]))[r])
            assert sh[s0] == one_sh[0], (lengths.tolist(), r, "shingle")
            assert sim[r] == one_sim[0], (lengths.tolist(), r, "simhash")
            pos += n


def test_kernel_matches_duckdb_oracle(spark, sf001):
    """Cross-engine bit-identity on driver testdata (md5 strategy)."""
    import duckdb
    from pyspark.sql import functions as F

    cfg = DedupConfig(shingle_k=3, num_perms=16, bands=4, rows_per_band=4)
    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(100)
    p = represent.with_representation(docs, cfg, "doc_id", "text", "md5")
    got = {
        r["id"]: (r["shingle_set"], r["signature"], r["winnow_fps"], r["simhash"])
        for r in p.collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet') LIMIT 100"
    )
    q = f"""
WITH {represent.sql_repr_ctes(cfg)},
{represent.sql_signature_cte(cfg)}
SELECT _ss.id, _ss.ss, _sig.sig, _wn.wn
FROM _ss JOIN _sig ON _ss.id = _sig.id JOIN _wn ON _ss.id = _wn.id
"""
    for oid, ss, sig, wn in con.sql(q).fetchall():
        g_ss, g_sig, g_wn, _ = got[oid]
        assert list(g_ss) == sorted(ss), f"shingle set mismatch doc {oid}"
        assert list(g_sig) == list(sig), f"signature mismatch doc {oid}"
        assert sorted(g_wn) == sorted(wn), f"winnow mismatch doc {oid}"
