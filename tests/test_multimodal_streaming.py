"""Multimodal plumbing + streaming ingest tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.operators import multimodal
from entity_deduplication_hack_main_spark.streaming.ingest import StreamingDedup


def test_media_feature_extraction_plumbing(spark):
    media = multimodal.synthesize_media(spark, n=60)
    feats = multimodal.extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(r["ok"] and len(r["feature_digest"]) == 32 for r in rows)
    # deterministic across runs
    again = {r["id"]: r["feature_digest"] for r in
             multimodal.extract_features(media, fake_decode=True).collect()}
    assert all(again[r["id"]] == r["feature_digest"] for r in rows)


def test_media_real_decoder_is_gated(spark):
    media = multimodal.synthesize_media(spark, n=3)
    feats = multimodal.extract_features(media, fake_decode=False)
    with pytest.raises(Exception, match="NotImplementedError|PIL|decod"):
        feats.collect()


def test_media_stats_jvm_only(spark):
    media = multimodal.synthesize_media(spark, n=90)
    stats = {r["media_type"]: r["n"] for r in multimodal.media_stats(media).collect()}
    assert stats == {"image": 30, "audio": 30, "video": 30}


def _sd_config():
    from entity_deduplication_hack_main_spark.config import DedupConfig

    # word-salad-scale config (short test docs)
    return DedupConfig(shingle_k=3, num_perms=32, bands=8, rows_per_band=4)


_BASE = " ".join(f"tok{i}" for i in range(60))
_TYPO = " ".join(("tokXX" if i == 30 else f"tok{i}") for i in range(60))


def test_streaming_neardup_within_and_across_batches(spark, tmp_path):
    """A typo variant arriving in a LATER batch is dropped against the
    committed band/signature index; a within-batch variant collapses to
    the min-id representative (VERDICT r01 missing #2)."""
    src = str(tmp_path / "landing")
    wd = str(tmp_path / "wd")
    os.makedirs(src)
    schema = "url string, warc_ts timestamp, text string"
    other = " ".join(f"zzz{i}" for i in range(60))

    def write_batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    sd = StreamingDedup(spark, wd, config=_sd_config())
    # batch 0: base doc + its in-batch near-variant + one unrelated doc
    variant_b0 = " ".join(
        ("tokYY" if i == 10 else f"tok{i}") for i in range(60)
    )
    write_batch([("u1", None, _BASE), ("u2", None, variant_b0),
                 ("u3", None, other)])
    sd.start(src, schema).awaitTermination(120)
    urls0 = {r["url"] for r in spark.read.parquet(sd.out_path).collect()}
    assert urls0 == {"u1", "u3"}  # u2 collapsed into u1 in-batch

    # batch 1: typo variant of the COMMITTED u1 + a genuinely new doc
    write_batch([("u4", None, _TYPO),
                 ("u5", None, " ".join(f"new{i}" for i in range(60)))])
    sd.start(src, schema).awaitTermination(120)
    urls1 = {r["url"] for r in spark.read.parquet(sd.out_path).collect()}
    assert urls1 == {"u1", "u3", "u5"}, urls1


def test_streaming_batch_retry_is_idempotent(spark, tmp_path):
    """ADVICE r01: a foreachBatch retry (same batch_id) must not duplicate
    rows — writes are dynamic partition overwrites keyed on batch_id and
    index reads exclude the current batch."""
    wd = str(tmp_path / "wd")
    schema = "url string, warc_ts timestamp, text string"
    sd = StreamingDedup(spark, wd, config=_sd_config())
    b0 = spark.createDataFrame(
        [("u1", None, _BASE), ("u2", None, " ".join(f"q{i}" for i in range(40)))],
        schema,
    )
    sd.process_batch(b0, 0)
    sd.process_batch(b0, 0)  # retry after simulated crash
    out = spark.read.parquet(sd.out_path)
    assert out.count() == 2
    assert spark.read.parquet(sd.index_path).count() == 2
    # a later batch still dedups against the retried batch's index
    b1 = spark.createDataFrame([("u9", None, _TYPO)], schema)
    sd.process_batch(b1, 1)
    assert spark.read.parquet(sd.out_path).count() == 2


def test_stage_committer_file_uri_resume(spark, tmp_path):
    """fsutil routes through the Hadoop FileSystem: a file:// workdir URI
    commits and resumes exactly like a bare local path."""
    from entity_deduplication_hack_main_spark.plans.lineage import StageCommitter

    wd = "file://" + str(tmp_path / "wd")
    calls = []

    def build():
        calls.append(1)
        return spark.range(0, 10).toDF("n")

    c1 = StageCommitter(spark, workdir=wd)
    assert c1.stage("s1", build).count() == 10
    c2 = StageCommitter(spark, workdir=wd)
    assert c2.stage("s1", build).count() == 10  # resumed, not rebuilt
    assert calls == [1]
    assert c2.events[0]["resumed"] is True
    files = c2._list_files("s1")
    assert files and all(n.endswith(".parquet") and sz > 0 for n, sz in files)


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "landing")
    wd = str(tmp_path / "wd")
    os.makedirs(src)
    schema = "url string, warc_ts timestamp, text string"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    write_batch(
        [
            ("u1", None, "the quick brown fox"),
            ("u2", None, "the quick brown fox"),   # in-batch dup of u1
            ("u3", None, "completely different"),
        ]
    )
    sd = StreamingDedup(spark, wd)
    q = sd.start(src, schema)
    q.awaitTermination(120)

    out1 = spark.read.parquet(sd.out_path)
    assert out1.count() == 2  # u1 (or u2) + u3

    # second batch: cross-batch dup + one new doc
    write_batch(
        [
            ("u4", None, "the quick brown fox"),   # dup vs committed index
            ("u5", None, "brand new content here"),
        ]
    )
    q2 = sd.start(src, schema)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(sd.out_path)
    assert out2.count() == 3
    urls = {r["url"] for r in out2.collect()}
    assert "u5" in urls and "u4" not in urls


def test_streaming_borderline_estimate_reverified_exactly(spark, tmp_path):
    """r02 verdict #3: corpus-side near-dup used the raw MinHash estimate,
    so a pair whose estimate crosses the threshold while exact Jaccard
    does not was wrongly dropped. With 32 perms and these docs the
    estimate is 0.750 (>= 0.7) but exact J = 0.657 (< 0.7): the doc must
    now SURVIVE (estimate is borderline -> exact re-verify against the
    committed text decides). The m=10 variant has exact J = 0.706 and must
    still be dropped."""
    wd = str(tmp_path / "wd")
    schema = "url string, warc_ts timestamp, text string"
    base = [f"tok{i}" for i in range(60)]
    mk = lambda m: " ".join(base[:-m] + [f"new{i}" for i in range(m)])
    sd = StreamingDedup(spark, wd, config=_sd_config())
    sd.process_batch(
        spark.createDataFrame([("uA", None, " ".join(base))], schema), 0
    )
    # estimate 0.750 over threshold, exact 0.657 under -> keep
    sd.process_batch(spark.createDataFrame([("uKeep", None, mk(12))], schema), 1)
    # estimate 0.719 borderline, exact 0.706 over threshold -> drop
    sd.process_batch(spark.createDataFrame([("uDrop", None, mk(10))], schema), 2)
    urls = {r["url"] for r in spark.read.parquet(sd.out_path).collect()}
    assert urls == {"uA", "uKeep"}, urls


def test_streaming_winnow_and_simhash_channels_match_batch(spark, tmp_path):
    """r03 verdict #3: a containment-dup (contiguous chunk of a committed
    doc — symmetric Jaccard ~0.49, invisible to the MinHash channel) and
    an order-permuted near-exact (identical token bag, Hamming 0,
    shingle-Jaccard ~0 — invisible to MinHash AND winnow) arrive in a
    later batch. The batch pipeline dedups both (containment leg /
    Hamming leg of the edge rule); streaming must agree, and the lineage
    row must attribute each drop to its channel."""
    import random

    wd = str(tmp_path / "wd")
    schema = "url string, warc_ts timestamp, text string"
    a_long = " ".join(f"alpha{i}" for i in range(200))
    c_doc = " ".join(f"ctok{i}" for i in range(60))
    sd = StreamingDedup(spark, wd, config=_sd_config())
    sd.process_batch(
        spark.createDataFrame(
            [("uA", None, a_long), ("uC", None, c_doc)], schema
        ),
        0,
    )
    contained = " ".join(f"alpha{i}" for i in range(50, 150))  # uB ⊂ uA
    shuffled = c_doc.split()
    random.Random(0).shuffle(shuffled)  # uD = uC's bag, new order
    sd.process_batch(
        spark.createDataFrame(
            [
                ("uB", None, contained),
                ("uD", None, " ".join(shuffled)),
                ("uE", None, " ".join(f"fresh{i}" for i in range(60))),
            ],
            schema,
        ),
        1,
    )
    urls = {r["url"] for r in spark.read.parquet(sd.out_path).collect()}
    assert urls == {"uA", "uC", "uE"}, urls
    lin = {
        r["batch_id"]: r
        for r in spark.read.parquet(sd.lineage_path).collect()
    }
    assert lin[1]["wn_drop"] >= 1      # uB fell to the winnow channel
    assert lin[1]["sh_drop"] >= 1      # uD fell to the SimHash channel
    assert lin[1]["n_survivors"] == 1  # uE


def test_streaming_inbatch_containment_and_permutation_dedup(spark, tmp_path):
    """The same two dup classes WITHIN one batch: the in-batch channel now
    runs all three recall channels with the batch edge rule, so both
    collapse to the min-id representative immediately."""
    import random

    wd = str(tmp_path / "wd")
    schema = "url string, warc_ts timestamp, text string"
    a_long = " ".join(f"beta{i}" for i in range(200))
    contained = " ".join(f"beta{i}" for i in range(50, 150))
    c_doc = " ".join(f"dtok{i}" for i in range(60))
    shuffled = c_doc.split()
    random.Random(1).shuffle(shuffled)
    sd = StreamingDedup(spark, wd, config=_sd_config())
    sd.process_batch(
        spark.createDataFrame(
            [
                ("u1", None, a_long),
                ("u2", None, contained),
                ("u3", None, c_doc),
                ("u4", None, " ".join(shuffled)),
            ],
            schema,
        ),
        0,
    )
    urls = {r["url"] for r in spark.read.parquet(sd.out_path).collect()}
    assert urls == {"u1", "u3"}, urls


def test_streaming_lineage_counts_borderline_flips(spark, tmp_path):
    """r03 verdict #7: the lineage table records estimate-band decisions —
    a borderline pair whose exact re-verify FLIPS the estimate's call
    increments mh_borderline_flipped; one that agrees does not."""
    wd = str(tmp_path / "wd")
    schema = "url string, warc_ts timestamp, text string"
    base = [f"tok{i}" for i in range(60)]
    mk = lambda m: " ".join(base[:-m] + [f"new{i}" for i in range(m)])
    sd = StreamingDedup(spark, wd, config=_sd_config())
    sd.process_batch(
        spark.createDataFrame([("uA", None, " ".join(base))], schema), 0
    )
    # estimate 0.750 >= t says drop, exact 0.657 < t says keep -> flipped
    sd.process_batch(spark.createDataFrame([("uKeep", None, mk(12))], schema), 1)
    # estimate 0.719 says drop, exact 0.706 >= t agrees -> not flipped
    sd.process_batch(spark.createDataFrame([("uDrop", None, mk(10))], schema), 2)
    lin = {
        r["batch_id"]: r
        for r in spark.read.parquet(sd.lineage_path).collect()
    }
    assert lin[1]["mh_borderline"] == 1
    assert lin[1]["mh_borderline_drop"] == 0
    assert lin[1]["mh_borderline_flipped"] == 1
    assert lin[1]["n_survivors"] == 1
    assert lin[2]["mh_borderline"] == 1
    assert lin[2]["mh_borderline_drop"] == 1
    assert lin[2]["mh_borderline_flipped"] == 0
    assert lin[2]["n_survivors"] == 0


def test_streaming_bigint_ids_supported(spark, tmp_path):
    """r02 advice: empty-index schemas are typed from the batch id column —
    a bigint id corpus must dedup across batches without string casts."""
    wd = str(tmp_path / "wd")
    schema = "doc_id bigint, warc_ts timestamp, text string"
    sd = StreamingDedup(spark, wd, config=_sd_config(), id_col="doc_id")
    sd.process_batch(
        spark.createDataFrame([(1, None, _BASE)], schema), 0
    )
    # exact dup + near dup of the committed doc, one new doc
    sd.process_batch(
        spark.createDataFrame(
            [(2, None, _BASE), (3, None, _TYPO),
             (4, None, " ".join(f"fresh{i}" for i in range(50)))],
            schema,
        ),
        1,
    )
    out = spark.read.parquet(sd.out_path)
    assert out.schema["doc_id"].dataType.simpleString() == "bigint"
    assert {r["doc_id"] for r in out.collect()} == {1, 4}
