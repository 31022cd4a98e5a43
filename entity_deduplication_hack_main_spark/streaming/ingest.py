"""Incremental dedup ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §2.9); the streaming-adjacent
north_rule requirement is resumability, which the batch pipeline covers via
committed stages. This module adds the natural streaming extension: new
pages arrive as files in `warc_ts`-partitioned directories, are
deduplicated within the micro-batch AND against the committed corpus, and
append to the clustered table — how a production crawler feeds the pipeline.

Per micro-batch (`foreachBatch`), with `near_dup=True` (default):

0. URL channel (opt-in via ``url_col=``) — the cheapest Common-Crawl
   dedup signal, run BEFORE any content hashing: URLs are canonicalized
   (operators/urldedup.py — scheme/case/www/port/slash/fragment/
   tracking-param rules), in-batch recrawls collapse to the earliest
   ``url_ts_col`` (then lowest id), and canonical keys already present
   in the committed ``_url_index`` are dropped ("first crawl wins" —
   a recrawl is dropped even when the page content changed; re-ingest
   of updated pages is a policy choice this channel deliberately does
   not make, matching the batch ``dedup_by_url`` stage). Every NEW
   canonical url is recorded in the index whether or not its content
   survives the later CONTENT channels — a later recrawl of a content-dup
   page is still a recrawl — but contamination-flagged docs do NOT
   register (the holdout promise: no dedup state sees them; a registered
   key would block a clean future recrawl of that URL). URLs with no
   canonical identity (NULL key: scheme-less/unparseable) pass through
   every batch uncounted and unindexed;
1. exact channel — normalized-text fingerprint; first-per-fp within the
   batch, then anti-join against the committed fingerprint index;
2. *within* the batch — ALL THREE batch recall channels (MinHash-LSH ∪
   SimHash Hamming blocks ∪ winnow fingerprints), verified with the SAME
   full measure set and edge rule the batch pipeline uses
   (verify.verify_pairs_full / duplicate_edges_full — r03 verdict #3:
   streaming used to run the MinHash channel only, so a containment-dup or
   2-token-edit near-exact inside one batch survived streaming but not
   batch), then connected components; only each component's min-id
   representative survives;
3. *against the corpus*, one join per channel — every channel's decision
   threshold is ``jaccard_candidate``, the SAME value the in-batch /
   batch-pipeline edge rule passes at (``verify_pairs_full`` status), so a
   pair reaches the identical verdict whether it arrives in one batch or
   split across two (r04 advice #5 — corpus channels previously decided
   at ``jaccard_similar``, so an exact-J-0.6 pair deduped in-batch but
   survived cross-batch):
   - MinHash: the batch's band hashes join the committed band index
     (bounded: bands×docs rows, no signatures re-read); candidates are
     scored by MinHash signature agreement (the unbiased Jaccard
     estimate; the committed shingle sets are not retained). Clear-cut
     candidates (|estimate − threshold| > the ±2.5σ band of
     :func:`est_margin`) are decided by the estimate alone; *borderline*
     candidates are re-verified exactly: the few committed docs involved
     are fetched from the deduped output table, re-shingled, and compared
     by true Jaccard — so batch and streaming agree on every pair except
     the (exponentially rare) ones whose estimate errs by more than the
     margin;
   - SimHash: the batch's 4×16-bit pigeonhole blocks join the committed
     simhash index (one bigint per committed doc, kept in `_index`);
     Hamming <= radius drops the new doc — exact, no text fetch;
   - winnow: the batch's winnow fingerprints join the committed
     `_winnow_index` (df-capped on the committed side — same boilerplate
     cap as the batch channel); pairs sharing >= 2 fingerprints fetch the
     committed text and drop on EXACT jaccard >= threshold OR containment
     >= containment_threshold (the batch edge rule's containment leg);

Per-batch cost vs the committed corpus (r04 verdict #3): the three index
tables are written with a ``kb`` key-bucket column (hash of the join key
mod :data:`N_KEY_BUCKETS`), range-clustered within each batch partition,
and every corpus-side read pushes ``In(kb, <batch's buckets>)`` into the
parquet scan — file/row-group skipping over plain parquet, no metastore
bucketing, and legacy (pre-``kb``) files surface kb NULL and are read in
full. After the pruned scan, the committed side is LEFT-SEMI-reduced by a
broadcast of the batch's distinct keys BEFORE any window/aggregate, so the
per-key df caps (winnow boilerplate, SimHash degenerate buckets) count the
matched subset only — identical counts (key equality keeps whole key
groups) without the full-index window shuffle a growing corpus cannot
afford. The one remaining O(corpus) term is the `_index` SCAN (one narrow
row per committed doc, for signatures + simhashes); it is never shuffled —
signature lookups broadcast-semi-reduce by candidate ids. See SCALE.md
for the cost model.

Span-cut compaction (batch recipe): the exact-substring span pass is
corpus-GLOBAL (a gram index must see every committed doc), so streamed
docs are never span-cut inside a micro-batch. The production pattern is
:func:`span_cut_compaction` run as a periodic committed batch job (e.g.
daily): read the streamed `deduped` table, run
``substring_spans_exact`` + ``cut_spans_raw`` over the whole committed
corpus, overwrite `deduped_cut`. Idempotent (pure derived output); the
streaming indexes are untouched, so ingest keeps deduping against the
UNCUT corpus — span cutting changes training payloads, never dedup
identity. Boilerplate LINE removal follows the same recipe
(:func:`line_dedup_compaction`): line doc-frequency is corpus-global, so
it runs as a scheduled batch job over `deduped` into `deduped_lines`
(doc-frequency rule only — keep-first depends on arrival order and would
not be idempotent across re-runs). Small-FILE compaction is the third
maintenance job (:func:`state_compaction`): trickle ingest writes one
file set per batch per state table, so a quiescent-window rewrite folds
all committed partitions into the ``batch_id = -1`` sentinel partition
in the kb-range-clustered layout — O(1) files per key bucket again,
reads and retry semantics unchanged.
4. survivors append to the output plus the index tables — `_index`
   (id, fp, signature, simhash), `_band_index` (id, band_id, band_hash),
   `_winnow_index` (id, wfp) and, when the URL channel is on,
   `_url_index` (id, url_key) — and one `_streaming_lineage` row
   records the batch's decision counts (input, fresh, per-channel
   candidates/drops, borderline estimate outcomes incl. how many exact
   re-verifies FLIPPED the estimate's call, and the below-band kept tail)
   so estimate drift is observable (r03 verdict #7).

Benchmark decontamination at ingest: pass ``holdout=`` to drop batch
docs contaminated against an eval corpus (exact fp + band-collision →
exact-Jaccard channels via operators/decontaminate.py, holdout
broadcast) BEFORE any dedup state or output sees them; drops land in
the lineage row as ``n_contaminated``. The holdout stays driver-free:
its representation is computed once per StreamingDedup and cached.

Idempotency: every write is a *dynamic partition overwrite* keyed on
`batch_id`, and reads of the indexes exclude the current batch_id — a
foreachBatch retry (or a crash between the output and index writes)
recomputes the same survivor set and overwrites the same partitions
instead of appending duplicates. Paths are probed through the Hadoop
FileSystem (plans/fsutil.py), so `s3a://`/`hdfs://` workdirs behave like
local ones.

Self-overwrite safety: the index/output writes target the same paths their
own input lineage reads (prior fingerprints, old bands, committed text).
The batch's `fresh` and `survivors` frames are therefore
``localCheckpoint(eager=True)``-ed — lineage is TRUNCATED before any write,
so no write plan scans the path it is overwriting, regardless of cache
eviction (round-2 advice: a recompute-under-eviction would otherwise race
the overwrite on s3a/hdfs). If a checkpoint block is lost mid-batch the
batch fails and the foreachBatch retry recomputes it — idempotent by the
partition-overwrite design above.

State growth: the indexes carry O(1 row + bands rows) per committed doc —
fingerprint + 8-byte signature entries, never full text — which is the
bounded-memory alternative to `dropDuplicates` + watermark state (bounded
horizon). Unbounded-horizon dedup needs an index; this one is a parquet
table any batch job can also read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.functions import represent, textstats
from entity_deduplication_hack_main_spark.functions import simhash as shash
from entity_deduplication_hack_main_spark.operators import cluster as cc_op
from entity_deduplication_hack_main_spark.operators import (
    decontaminate as decon_op,
)
from entity_deduplication_hack_main_spark.operators import hamming as ham_op
from entity_deduplication_hack_main_spark.operators import (
    linededup as linededup_op,
)
from entity_deduplication_hack_main_spark.operators import lsh as lsh_op
from entity_deduplication_hack_main_spark.operators import suffix as suffix_op
from entity_deduplication_hack_main_spark.operators import (
    urldedup as urldedup_op,
)
from entity_deduplication_hack_main_spark.operators import verify as verify_op
from entity_deduplication_hack_main_spark.plans import fsutil


#: key buckets for the prunable index layout — the batch's distinct kb set
#: is collected to the driver (bounded by this constant) and pushed into
#: the committed-side parquet scans as an In() filter
N_KEY_BUCKETS = 256


def _kb(col) -> "F.Column":
    """Key bucket of a join key — MUST match between index writes and the
    batch-side kb computation or pruning silently drops committed rows."""
    return F.pmod(F.xxhash64(col), F.lit(N_KEY_BUCKETS)).cast("int")


def est_margin(config: DedupConfig) -> float:
    """Half-width of the estimate band that triggers exact re-verification:
    ±2.5σ of the num_perms-sample agreement estimator at J = threshold,
    2.5·sqrt(t(1−t)/num_perms). The threshold is ``jaccard_candidate`` —
    the edge-rule pass mark shared with the batch pipeline (r04 advice
    #5). At the production config (t=0.5, 128 perms) this is ≈ 0.11; at
    the 32-perm test config σ more than doubles (±0.22), so a fixed 0.1
    would have been under 1.25σ and batch/streaming borderline
    disagreement far more likely than the documented <1% tail (r03
    advice)."""
    import math

    t = float(config.jaccard_candidate)
    return 2.5 * math.sqrt(t * (1.0 - t) / config.num_perms)


class StreamingDedup:
    """Streaming ingest: exact + MinHash near-dup vs batch and corpus."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        config: DedupConfig | None = None,
        text_col: str = "text",
        id_col: str = "url",
        near_dup: bool = True,
        containment_threshold: float = 0.9,
        holdout: DataFrame | None = None,
        holdout_threshold: float | None = None,
        holdout_ngram_n: int | None = None,
        holdout_ngram_frac: float = 0.7,
        url_col: str | None = None,
        url_ts_col: str | None = None,
    ) -> None:
        """holdout: optional benchmark/eval corpus (same id/text column
        names as the stream). When given, every micro-batch is
        DECONTAMINATED before any index write: batch docs matching a
        holdout doc exactly (fingerprint) or nearly (band collision →
        exact Jaccard ≥ holdout_threshold, default jaccard_similar) are
        dropped via operators/decontaminate.py with ``broadcast_ref``
        — the holdout is small by definition, the batch never shuffles
        for it. With ``near_dup=False`` only the exact channel applies
        (no batch representation exists to band-join). Drops are
        counted in the lineage row (``n_contaminated``).

        holdout_ngram_n: when set (e.g. 13, the GPT-3 recipe), a THIRD
        decontamination channel runs on every batch: docs whose fraction
        of distinct n-grams occurring anywhere in the holdout reaches
        ``holdout_ngram_frac`` (PaLM's 0.7) are dropped — this catches a
        batch doc QUOTING part of an eval doc, which neither whole-doc
        channel sees. The holdout's gram set is computed once per
        instance and cached; the per-batch cost is one gram-kernel pass
        over the batch plus a broadcast mark (operators/decontaminate.py
        ngram_overlap_stats). Applies on the ``near_dup=False`` path too
        (the gram pass is independent of the MinHash payload).

        url_col: when set, the URL channel runs FIRST on every batch
        (module docstring item 0): canonicalized recrawls collapse
        in-batch (earliest ``url_ts_col``, then lowest id) and against
        the committed ``_url_index`` ("first crawl wins"); drops are
        counted in the lineage row as ``n_url_dup``. Applies on both
        the near-dup and exact-only paths."""
        self.spark = spark
        self.workdir = workdir
        self.config = config or DedupConfig()
        self.text_col = text_col
        self.id_col = id_col
        self.near_dup = near_dup
        self.containment_threshold = containment_threshold
        self.holdout = holdout
        self.holdout_threshold = holdout_threshold
        self.holdout_ngram_n = holdout_ngram_n
        self.holdout_ngram_frac = holdout_ngram_frac
        self._holdout_payload: DataFrame | None = None
        self._holdout_grams: DataFrame | None = None
        self.url_col = url_col
        self.url_ts_col = url_ts_col
        self.index_path = os.path.join(workdir, "_index")
        self.band_path = os.path.join(workdir, "_band_index")
        self.winnow_path = os.path.join(workdir, "_winnow_index")
        self.url_path = os.path.join(workdir, "_url_index")
        self.out_path = os.path.join(workdir, "deduped")
        self.lineage_path = os.path.join(workdir, "_streaming_lineage")
        self.checkpoint = os.path.join(workdir, "_checkpoint")

    def _holdout_rep(self) -> DataFrame:
        """The holdout corpus's representation payload, computed once per
        StreamingDedup instance and cached (it is read every batch)."""
        if self._holdout_payload is None:
            self._holdout_payload = represent.with_representation(
                self.holdout, self.config, self.id_col, self.text_col
            ).cache()
        return self._holdout_payload

    def _holdout_gram_set(self) -> DataFrame:
        """The holdout's distinct n-gram hash set at holdout_ngram_n,
        computed once per instance and cached (probed every batch)."""
        if self._holdout_grams is None:
            self._holdout_grams = decon_op.ngram_set(
                self.holdout,
                self.config,
                self.holdout_ngram_n,
                self.id_col,
                self.text_col,
            ).cache()
        return self._holdout_grams

    def _ngram_contaminated_ids(self, docs: DataFrame) -> DataFrame:
        """ids (column named id_col) of batch docs whose distinct-n-gram
        overlap fraction vs the holdout reaches holdout_ngram_frac."""
        stats = decon_op.ngram_overlap_stats(
            docs.select(self.id_col, self.text_col),
            None,
            self.config,
            n=self.holdout_ngram_n,
            flag_threshold=self.holdout_ngram_frac,
            id_col=self.id_col,
            text_col=self.text_col,
            ref_grams=self._holdout_gram_set(),
        )
        return stats.where("contaminated").select(
            F.col("doc_id").alias(self.id_col)
        )

    # --- committed state -------------------------------------------------

    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        """Read with the EXPECTED schema enforced — a workdir committed by
        an older code version (fewer index columns, no ``kb``) then
        resumed after an upgrade must surface the missing columns as NULL,
        not raise AnalysisException or depend on which parquet footer
        Spark samples for schema inference (r04 advice #1). Every null a
        legacy row surfaces is tolerated downstream: null simhash blocks
        explode to nothing, null signatures never cross the estimate band,
        null kb rows are exempt from pruning."""
        if fsutil.exists(self.spark, path):
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    @staticmethod
    def _kb_prune(df: DataFrame, kbs: list[int] | None) -> DataFrame:
        """Push the batch's key-bucket set into the scan. kb NULL (legacy
        unbucketed files) always survives — correct, just unpruned."""
        if kbs is None:
            return df
        cond = F.col("kb").isNull()
        if kbs:
            cond = cond | F.col("kb").isin(kbs)
        return df.where(cond)

    @staticmethod
    def _batch_kbs(df: DataFrame, key_col) -> list[int]:
        """Distinct key buckets in the batch — a driver collect bounded by
        N_KEY_BUCKETS values, never by data size."""
        return [
            r[0] for r in df.select(_kb(key_col).alias("kb")).distinct().collect()
        ]

    def _index(
        self,
        exclude_batch: int,
        id_type: str = "string",
        kbs: list[int] | None = None,
    ) -> DataFrame:
        sig = (
            ", signature array<bigint>, simhash bigint"
            if self.near_dup
            else ""
        )
        df = self._read_or_empty(
            self.index_path,
            f"id {id_type}, fp string{sig}, kb int, batch_id bigint",
        )
        return self._kb_prune(
            df.where(F.col("batch_id") != F.lit(exclude_batch)), kbs
        )

    def _winnow_index(
        self,
        exclude_batch: int,
        id_type: str = "string",
        kbs: list[int] | None = None,
    ) -> DataFrame:
        # one row per winnow fingerprint per committed doc — density is
        # ~2/(w+1) of shingle positions (~4% of tokens), the same bounded
        # state class as the band index
        df = self._read_or_empty(
            self.winnow_path, f"id {id_type}, wfp bigint, kb int, batch_id bigint"
        )
        return self._kb_prune(
            df.where(F.col("batch_id") != F.lit(exclude_batch)), kbs
        )

    def _band_index(
        self,
        exclude_batch: int,
        id_type: str = "string",
        kbs: list[int] | None = None,
    ) -> DataFrame:
        # bigint band keys (xxhash64) — the persisted index grows one row
        # per band per committed doc forever, so the 8-byte key vs a
        # 32-char md5 string is a 2.5x standing size difference
        df = self._read_or_empty(
            self.band_path,
            f"id {id_type}, band_id int, band_hash bigint, kb int, "
            "batch_id bigint",
        )
        return self._kb_prune(
            df.where(F.col("batch_id") != F.lit(exclude_batch)), kbs
        )

    def _url_index(
        self,
        exclude_batch: int,
        id_type: str = "string",
        kbs: list[int] | None = None,
    ) -> DataFrame:
        # one row per committed canonical url — the same bounded state
        # class as the fingerprint index (narrow strings, never text)
        df = self._read_or_empty(
            self.url_path,
            f"id {id_type}, url_key string, kb int, batch_id bigint",
        )
        return self._kb_prune(
            df.where(F.col("batch_id") != F.lit(exclude_batch)), kbs
        )

    def _register_urls(
        self,
        url_kept: DataFrame | None,
        batch_id: int,
        contaminated: list[DataFrame],
    ) -> None:
        """Write the batch's NEW canonical urls into ``_url_index`` —
        every in-batch URL winner EXCEPT contamination-flagged docs (the
        holdout promise: no dedup state sees them; a registered key would
        block a clean future recrawl of that URL forever). Content-dup
        drops DO register. NULL keys (unparseable URLs — no canonical
        identity) never enter the index. Each ``contaminated`` frame
        carries the flagged doc ids in its single column; flags are
        computed on the fp-channel survivors, so a contaminated doc whose
        identical in-batch twin was fp-dropped still registers the twin's
        URL — acceptable: that content is represented by the flagged twin
        check, and the fp drop is a content decision, not a holdout one.

        Known same-batch corner: a contaminated doc can still WIN the
        in-batch URL dedup, dropping a clean doc at the same canonical
        key from the SAME batch before contamination is known — that
        batch's clean copy is lost, but because the winner's key is NOT
        registered here, any future recrawl of the URL ingests cleanly.
        Avoiding the loss entirely would require decontaminating the full
        pre-URL-dedup batch (representation for every recrawl), defeating
        the channel's run-first cost purpose."""
        if url_kept is None:
            return
        reg = url_kept.select(
            F.col(self.id_col).alias("id"), "url_key"
        ).where(F.col("url_key").isNotNull())
        for bad in contaminated:
            b = bad.select(F.col(bad.columns[0]).alias("id"))
            reg = reg.join(F.broadcast(b), "id", "left_anti")
        self._write_index(reg, self.url_path, batch_id, F.col("url_key"))

    def _overwrite_partition(self, df: DataFrame, path: str, batch_id: int):
        (
            df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(path)
        )

    def _write_index(
        self, df: DataFrame, path: str, batch_id: int, key_col
    ) -> None:
        """Index write in the prunable layout: kb = key bucket of the join
        key, RANGE-clustered across the batch's files and sorted within
        them, so parquet min/max stats make the read-side In(kb) filter
        skip whole files/row groups. One extra narrow shuffle per index
        write — the price of never re-scanning the full committed index
        per micro-batch."""
        out = df.withColumn("kb", _kb(key_col))
        self._overwrite_partition(
            out.repartitionByRange("kb").sortWithinPartitions("kb"),
            path,
            batch_id,
        )

    # --- the micro-batch body ---------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        cfg = self.config
        id_type = batch.schema[self.id_col].dataType.simpleString()

        # URL channel (module docstring item 0) — before any content work:
        # canonical recrawls collapse in-batch, committed canonical keys
        # drop, and every NEW key is registered ("first crawl wins")
        n_url_dup = 0
        n_input = None
        _url_kept = None
        if self.url_col is not None:
            n_input = batch.count()
            keyed = urldedup_op.dedup_by_url(
                batch,
                id_col=self.id_col,
                url_col=self.url_col,
                ts_col=self.url_ts_col,
            )
            kbs_u = self._batch_kbs(keyed, F.col("url_key"))
            prior_urls = (
                self._url_index(
                    exclude_batch=batch_id, id_type=id_type, kbs=kbs_u
                )
                .select("url_key")
                .distinct()
            )
            # localCheckpoint BEFORE this batch's later url_path write:
            # the anti-join's lineage reads url_path. NULL url_keys
            # (unparseable URLs) pass dedup_by_url through and never match
            # the anti-join — kept, with no index entry.
            _url_kept = keyed.join(
                prior_urls, "url_key", "left_anti"
            ).localCheckpoint(eager=True)
            n_url_dup = n_input - _url_kept.count()
            batch = _url_kept.drop("url_key")
            # the index write is DEFERRED to the end of the batch (each
            # path calls _register_urls): contaminated docs must not
            # register their canonical key — the holdout promise is that
            # NO dedup state sees them, and a registered key would block
            # a future clean recrawl of that URL forever. Content-dup
            # drops DO register (a recrawl of a dup page is still a
            # recrawl).

        with_fp = batch.withColumn(
            "fp", textstats.fingerprint(F.col(self.text_col))
        )
        from pyspark.sql import Window

        # exact channel: one doc per fingerprint in-batch (min id), then
        # drop fps already committed by OTHER batches (retry-safe read)
        w = Window.partitionBy("fp").orderBy(self.id_col)
        first = (
            with_fp.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # fp anti-join reads only the batch's key buckets of the committed
        # index (kb pruning); the full one-row-per-doc index is read
        # separately (prior_full) for signature/simhash lookups
        kbs_fp = self._batch_kbs(first, F.col("fp"))
        prior_fps = self._index(
            exclude_batch=batch_id, id_type=id_type, kbs=kbs_fp
        ).select("fp")
        # localCheckpoint, not cache: fresh's lineage reads index_path,
        # which this batch later overwrites — truncate it (module docstring)
        fresh = first.join(
            prior_fps.distinct(), "fp", "left_anti"
        ).localCheckpoint(eager=True)

        # n-gram holdout channel (docstring): runs on BOTH paths, before
        # any representation/state work — quoted-eval-span docs never get
        # signatures computed, never reach an index
        n_contaminated_ngram = 0
        _contam_flags: list[DataFrame] = []  # fed to _register_urls
        _flag_ckpts: list[DataFrame] = []  # every checkpointed flag frame
        if self.holdout is not None and self.holdout_ngram_n is not None:
            # checkpointed: reused by _register_urls AFTER the parent
            # frame's checkpoint blocks are unpersisted
            ng_flagged = self._ngram_contaminated_ids(fresh).localCheckpoint(
                eager=True
            )
            _flag_ckpts.append(ng_flagged)
            n_contaminated_ngram = ng_flagged.count()
            if n_contaminated_ngram:
                _contam_flags.append(ng_flagged)
                _fresh_pre_ngram = fresh
                fresh = fresh.join(
                    F.broadcast(ng_flagged), self.id_col, "left_anti"
                ).localCheckpoint(eager=True)
                _fresh_pre_ngram.unpersist()  # superseded checkpoint blocks

        if not self.near_dup:
            n_contaminated = 0
            if self.holdout is not None:
                # exact decontamination channel only: no batch
                # representation exists on this path (docstring)
                hold_fps = F.broadcast(
                    self._holdout_rep().select("fp").distinct()
                )
                exact_flagged = (
                    fresh.join(hold_fps, "fp", "left_semi")
                    .select(self.id_col)
                    .localCheckpoint(eager=True)
                )
                _flag_ckpts.append(exact_flagged)
                n_contaminated = exact_flagged.count()
                if n_contaminated:
                    _contam_flags.append(exact_flagged)
                    _fresh_pre_exact = fresh
                    fresh = fresh.join(
                        hold_fps, "fp", "left_anti"
                    ).localCheckpoint(eager=True)
                    _fresh_pre_exact.unpersist()
            self._overwrite_partition(fresh.drop("fp"), self.out_path, batch_id)
            self._write_index(
                fresh.select(F.col(self.id_col).alias("id"), "fp"),
                self.index_path,
                batch_id,
                F.col("fp"),
            )
            self._register_urls(_url_kept, batch_id, _contam_flags)
            # the exact-only path records its decisions too (the holdout
            # docstring's audit promise must not depend on near_dup)
            counts = {
                "n_input": batch.count() if n_input is None else n_input,
                "n_fresh": fresh.count(),
                "n_contaminated": n_contaminated,
                "n_contaminated_ngram": n_contaminated_ngram,
                "n_url_dup": n_url_dup,
            }
            self._overwrite_partition(
                self.spark.createDataFrame(
                    [tuple(counts.values())],
                    ", ".join(f"{k} bigint" for k in counts),
                ),
                self.lineage_path,
                batch_id,
            )
            fresh.unpersist()
            if _url_kept is not None:
                _url_kept.unpersist()
            for df in _flag_ckpts:
                df.unpersist()
            return
        prior_full = self._index(exclude_batch=batch_id, id_type=id_type)

        payload = represent.with_representation(
            fresh, cfg, self.id_col, self.text_col
        ).cache()
        nbits = 64  # xxhash64 strategy on the streaming path

        # decontamination gate (docstring): flag-and-drop vs the holdout
        # BEFORE any dedup state or output sees the batch — both channels
        # (exact fp + band-collision→exact-Jaccard), holdout broadcast
        n_contaminated = 0
        _payload_raw = None
        if self.holdout is not None:
            flagged = (
                decon_op.decontaminate(
                    payload,
                    self._holdout_rep(),
                    cfg,
                    threshold=self.holdout_threshold,
                    broadcast_ref=True,
                )
                .select(F.col("doc_id").alias("id"))
                .localCheckpoint(eager=True)  # reused by _register_urls
            )
            _flag_ckpts.append(flagged)
            n_contaminated = flagged.count()
            if n_contaminated:
                _contam_flags.append(flagged)
                _payload_raw = payload
                payload = payload.join(
                    F.broadcast(flagged), "id", "left_anti"
                ).cache()

        # near-dup WITHIN the batch: all three batch recall channels, the
        # batch pipeline's full measure set and edge rule (r03 verdict #3),
        # then components; non-representative (non-min-id) members drop
        bands = lsh_op.band_hashes(payload, cfg, "signature", "id", "xxhash64")
        lsh_pairs = lsh_op.candidate_pairs(bands, cfg)
        ham_pairs = ham_op.hamming_candidate_pairs(
            payload.select("id", "simhash"), cfg, nbits
        ).select("id1", "id2")
        win_pairs = suffix_op.winnow_pairs_from_payload(
            payload, max_df=cfg.winnow_max_df
        )
        in_cand = (
            lsh_pairs.unionByName(ham_pairs).unionByName(win_pairs).distinct()
        )
        verified = verify_op.verify_pairs_full(in_cand, payload, cfg)
        edges = verify_op.duplicate_edges_full(
            verified, cfg, self.containment_threshold
        )
        labels = cc_op.connected_components(edges, config=cfg)
        in_batch_drop = labels.where(
            F.col("node") != F.col("cluster_id")
        ).select(F.col("node").alias("id"))
        kept = payload.join(in_batch_drop, "id", "left_anti").cache()

        # --- vs the committed corpus, channel 1: MinHash ------------------
        # shared band bucket → signature agreement (MinHash Jaccard
        # estimate); borderline estimates get an exact-Jaccard re-verify
        # against the committed docs' re-shingled text so batch and
        # streaming agree on the same pair (r02 verdict)
        kept_bands = lsh_op.band_hashes(kept, cfg, "signature", "id", "xxhash64")
        kbs_band = self._batch_kbs(kept_bands, F.col("band_hash"))
        old_bands = (
            self._band_index(
                exclude_batch=batch_id, id_type=id_type, kbs=kbs_band
            )
            .select(F.col("id").alias("old_id"), "band_id", "band_hash")
            # broadcast semi-reduce on the batch's band keys: only matching
            # committed rows ever shuffle into the candidate join
            .join(
                F.broadcast(
                    kept_bands.select("band_id", "band_hash").distinct()
                ),
                ["band_id", "band_hash"],
                "left_semi",
            )
        )
        cand = (
            kept_bands.join(old_bands, ["band_id", "band_hash"])
            .select("id", "old_id")
            .distinct()
            .persist()  # reused: scored AND the old_sigs semi-reduction
        )
        # signature lookup: semi-reduce the one-row-per-doc index by the
        # (bounded) candidate id set — the index is scanned, never shuffled
        old_sigs = prior_full.join(
            F.broadcast(cand.select(F.col("old_id").alias("id")).distinct()),
            "id",
            "left_semi",
        ).select(
            F.col("id").alias("old_id"), F.col("signature").alias("old_sig")
        )
        agree = F.size(
            F.filter(
                F.zip_with("signature", "old_sig", lambda a, b: a == b),
                lambda x: x,
            )
        ) / F.lit(cfg.num_perms)
        # decision threshold = the batch edge rule's pass mark (advice #5:
        # cross-batch and in-batch verdicts must agree on the same pair)
        t = float(cfg.jaccard_candidate)
        scored = (
            cand.join(kept.select("id", "signature", "shingle_set"), "id")
            .join(old_sigs, "old_id")
            .withColumn("_est", agree)
            .persist()
        )
        m = est_margin(cfg)
        sure_drop = scored.where(
            F.col("_est") >= F.lit(t + m)
        ).select("id")
        borderline = scored.where(
            (F.col("_est") < F.lit(t + m))
            & (F.col("_est") >= F.lit(t - m))
        ).select("id", "old_id", "_est", "shingle_set")
        bl_meas = self._exact_pair_measures(
            borderline, batch_id, id_type
        ).persist()
        borderline_drop = bl_meas.where(
            F.col("ex_jaccard") >= F.lit(t)
        ).select("id")

        # --- channel 2: SimHash Hamming vs the committed simhash index ---
        # exact from the index (one bigint per committed doc) — no text
        # fetch; same 4x16-bit pigeonhole blocks + bucket cap as the batch
        # channel (hamming.hamming_candidate_pairs)
        from pyspark.sql import Window as W

        old_sim = prior_full.select(
            F.col("id").alias("old_id"), F.col("simhash").alias("old_sh")
        )
        new_blocks = kept.select(
            "id",
            "simhash",
            F.explode(
                shash.simhash_blocks(F.col("simhash"), cfg, nbits)
            ).alias("b"),
        ).select("id", "simhash", "b.block_id", "b.block_key")
        # broadcast semi-reduce on the batch's block keys BEFORE the
        # degenerate-bucket count: the count per (block_id, block_key) is
        # identical on the matched subset (key equality keeps whole key
        # groups), but the window no longer shuffles the entire committed
        # corpus every micro-batch (r04 advice #3)
        old_blocks = (
            old_sim.select(
                "old_id",
                "old_sh",
                F.explode(
                    shash.simhash_blocks(F.col("old_sh"), cfg, nbits)
                ).alias("b"),
            )
            .select("old_id", "old_sh", "b.block_id", "b.block_key")
            .join(
                F.broadcast(
                    new_blocks.select("block_id", "block_key").distinct()
                ),
                ["block_id", "block_key"],
                "left_semi",
            )
            .withColumn(
                "_n", F.count("*").over(W.partitionBy("block_id", "block_key"))
            )
            .where(F.col("_n") <= 10000)  # degenerate-fp coverage cap
        )
        sh_drop = (
            new_blocks.join(old_blocks, ["block_id", "block_key"])
            .where(
                shash.hamming(F.col("simhash"), F.col("old_sh"))
                <= cfg.hamming_radius
            )
            .select("id")
            .distinct()
            .persist()
        )

        # --- channel 3: winnow fingerprints vs the committed index -------
        # pairs sharing >= 2 committed fps fetch the committed text and
        # drop on EXACT jaccard or containment — the batch edge rule's
        # containment leg, which the estimate channels cannot see
        # (containment-dups sit below the symmetric-Jaccard threshold)
        new_fps = kept.select("id", F.explode("winnow_fps").alias("wfp"))
        kbs_w = self._batch_kbs(new_fps, F.col("wfp"))
        # pruned scan + broadcast semi-reduce on the batch's fps, THEN the
        # boilerplate df count on the matched subset — exact per matched
        # key, and the committed index is never re-windowed whole
        old_fps = (
            self._winnow_index(
                exclude_batch=batch_id, id_type=id_type, kbs=kbs_w
            )
            .select(F.col("id").alias("old_id"), "wfp")
            .join(
                F.broadcast(new_fps.select("wfp").distinct()),
                "wfp",
                "left_semi",
            )
            .withColumn("_df", F.count("*").over(W.partitionBy("wfp")))
            .where(F.col("_df") <= cfg.winnow_max_df)  # boilerplate cap
        )
        wn_cand = (
            new_fps.join(old_fps.select("old_id", "wfp"), "wfp")
            .groupBy("id", "old_id")
            .agg(F.count("*").alias("_nfp"))
            .where(F.col("_nfp") >= 2)
            .join(kept.select("id", "shingle_set"), "id")
            .select("id", "old_id", "shingle_set")
            .persist()
        )
        wn_meas = self._exact_pair_measures(wn_cand, batch_id, id_type)
        wn_drop = (
            wn_meas.where(
                (F.col("ex_jaccard") >= F.lit(t))
                | (F.col("ex_containment") >= F.lit(self.containment_threshold))
            )
            .select("id")
            .distinct()
            .persist()
        )

        corpus_drop = (
            sure_drop.unionByName(borderline_drop)
            .unionByName(sh_drop)
            .unionByName(wn_drop)
            .distinct()
        )
        # localCheckpoint: survivors' lineage reads index_path, band_path,
        # winnow_path AND out_path (exact text fetches) — all overwritten
        # below
        survivors = (
            kept.join(corpus_drop, "id", "left_anti")
            .select("id")
            .localCheckpoint(eager=True)
        )

        # --- per-batch decision counts (r03 verdict #7) --------------------
        # Evaluated BEFORE the index/output writes: the candidate frames
        # (scored, bl_meas, …) read the committed index paths this batch is
        # about to overwrite, and persist() alone does not pin them — AQE
        # empty-relation pruning can skip a cached subtree entirely while
        # materializing `survivors` (seen when the committed corpus is
        # empty: the post-write count then re-listed the band index and
        # collided with the batch's own fresh write). Counting here forces
        # every frame onto its pre-write file listing.
        est_says_drop = F.col("_est") >= F.lit(t)
        exact_says_drop = F.col("ex_jaccard") >= F.lit(t)
        counts = {
            "n_input": batch.count() if n_input is None else n_input,
            "n_fresh": fresh.count(),
            "n_contaminated": n_contaminated,
            "n_contaminated_ngram": n_contaminated_ngram,
            "n_inbatch_drop": in_batch_drop.count(),
            "mh_candidates": scored.count(),
            "mh_sure_drop": sure_drop.count(),
            "mh_borderline": bl_meas.count(),
            "mh_borderline_drop": bl_meas.where(exact_says_drop).count(),
            "mh_borderline_flipped": bl_meas.where(
                est_says_drop != exact_says_drop
            ).count(),
            "mh_below_band_kept": scored.where(
                F.col("_est") < F.lit(t - m)
            ).count(),
            "sh_drop": sh_drop.count(),
            "wn_candidates": wn_cand.count(),
            "wn_drop": wn_drop.count(),
            "n_survivors": survivors.count(),
            "n_url_dup": n_url_dup,
        }

        out_rows = fresh.join(
            survivors.withColumnRenamed("id", self.id_col), self.id_col, "left_semi"
        )
        self._overwrite_partition(out_rows.drop("fp"), self.out_path, batch_id)
        self._write_index(
            kept.join(survivors, "id", "left_semi").select(
                "id", "fp", "signature", "simhash"
            ),
            self.index_path,
            batch_id,
            F.col("fp"),
        )
        self._write_index(
            kept_bands.join(survivors, "id", "left_semi"),
            self.band_path,
            batch_id,
            F.col("band_hash"),
        )
        self._write_index(
            kept.join(survivors, "id", "left_semi").select(
                "id", F.explode("winnow_fps").alias("wfp")
            ),
            self.winnow_path,
            batch_id,
            F.col("wfp"),
        )
        self._register_urls(_url_kept, batch_id, _contam_flags)

        schema = ", ".join(f"{k} bigint" for k in counts)
        self._overwrite_partition(
            self.spark.createDataFrame([tuple(counts.values())], schema),
            self.lineage_path,
            batch_id,
        )
        for df in (
            payload, kept, cand, scored, bl_meas, sh_drop, wn_cand, wn_drop
        ):
            df.unpersist()
        if _payload_raw is not None:
            _payload_raw.unpersist()
        if _url_kept is not None:
            _url_kept.unpersist()
        for df in _flag_ckpts:
            df.unpersist()

    def _exact_pair_measures(
        self, pairs: DataFrame, batch_id: int, id_type: str
    ) -> DataFrame:
        """pairs (id, old_id, shingle_set, *extras) → the same rows with
        EXACT ``ex_jaccard`` and ``ex_containment`` against the committed
        partner doc: fetch the committed text from the deduped output
        table, re-shingle it, intersect/union shingle sets.

        Bounded: only borderline MinHash candidates (the ±2.5σ
        est_margin band — a few % of candidates) and >=2-shared-fp winnow
        candidates reach this, and only distinct old_ids are fetched
        (left-semi on the committed table, pushed down to the parquet
        scan).
        """
        out = self._read_or_empty(
            self.out_path,
            f"{self.id_col} {id_type}, {self.text_col} string, batch_id bigint",
        ).where(F.col("batch_id") != F.lit(batch_id))
        old_docs = out.select(
            F.col(self.id_col).alias("old_id"), self.text_col
        ).join(pairs.select("old_id").distinct(), "old_id", "left_semi")
        old_repr = represent.with_representation(
            old_docs, self.config, "old_id", self.text_col
        ).select(  # with_representation renames the id col to "id"
            F.col("id").alias("old_id"),
            F.col("shingle_set").alias("old_shingles"),
        )
        union_sz = F.size(F.array_union("shingle_set", "old_shingles"))
        inter = F.size(F.array_intersect("shingle_set", "old_shingles"))
        smaller = F.least(F.size("shingle_set"), F.size("old_shingles"))
        jaccard = F.when(union_sz == 0, F.lit(1.0)).otherwise(inter / union_sz)
        containment = F.when(smaller == 0, F.lit(1.0)).otherwise(inter / smaller)
        keep_cols = [c for c in pairs.columns if c != "shingle_set"]
        return (
            pairs.join(old_repr, "old_id")
            .withColumn("ex_jaccard", jaccard)
            .withColumn("ex_containment", containment)
            .select(*keep_cols, "ex_jaccard", "ex_containment")
        )

    def span_cut_compaction(
        self, span_k: int = 20, max_df: int | None = None
    ) -> DataFrame:
        """Periodic batch compaction: the corpus-global exact-substring
        span pass + raw-byte cutting over the STREAMED output table (r04
        verdict #8 — module docstring, "Span-cut compaction").

        Reads every committed `deduped` row, runs
        :func:`operators.suffix.substring_spans_exact` (the gram pass must
        see the whole corpus — spans between docs committed by DIFFERENT
        batches are exactly what streaming cannot cut per-batch), cuts
        with :func:`operators.suffix.cut_spans_raw`, and overwrites
        ``<workdir>/deduped_cut``. Pure derived output — idempotent,
        indexes untouched, dedup identity unaffected; schedule it like any
        committed batch stage (daily / per-N-batches).

        Returns the cut table re-read from disk."""
        cut_path = os.path.join(self.workdir, "deduped_cut")
        docs = self.spark.read.parquet(self.out_path).select(
            self.id_col, self.text_col
        )
        spans = suffix_op.substring_spans_exact(
            docs,
            self.config,
            span_k=span_k,
            max_df=max_df,
            id_col=self.id_col,
            text_col=self.text_col,
        )
        cut = suffix_op.cut_spans_raw(
            docs, spans, id_col=self.id_col, text_col=self.text_col
        ).withColumnRenamed("id", self.id_col)
        cut.write.mode("overwrite").parquet(cut_path)
        return self.spark.read.parquet(cut_path)

    def line_dedup_compaction(self, max_doc_freq: int = 8) -> DataFrame:
        """Periodic batch compaction: corpus-global boilerplate LINE
        removal over the streamed output table, same pattern as
        :meth:`span_cut_compaction`.

        Line frequency is corpus-global (a banner's doc frequency only
        crosses the removal threshold once enough batches committed it),
        so — like the span pass — it runs as a scheduled batch job, not
        per micro-batch. Applies the doc-frequency rule only
        (``keep_first=False``): keep-first depends on arrival order,
        which a re-run compaction could not reproduce; the df rule is a
        pure function of the committed corpus, so the overwrite is
        idempotent. Writes ``<workdir>/deduped_lines`` (id, text,
        n_lines, n_kept, n_removed); indexes untouched — dedup identity
        is still the UNCUT text."""
        out = os.path.join(self.workdir, "deduped_lines")
        docs = self.spark.read.parquet(self.out_path).select(
            self.id_col, self.text_col
        )
        cleaned = linededup_op.dedup_lines(
            docs,
            id_col=self.id_col,
            text_col=self.text_col,
            keep_first=False,
            max_doc_freq=max_doc_freq,
        ).withColumnRenamed("id", self.id_col)
        cleaned.write.mode("overwrite").parquet(out)
        return self.spark.read.parquet(out)

    #: batch_id owning compacted rows — never a real micro-batch id, so
    #: every ``exclude_batch`` read filter keeps compacted state visible
    COMPACTED_BATCH_ID = -1

    def state_compaction(self, files_per_table: int = 8) -> dict:
        """Periodic small-file compaction for the committed state tables.

        Trickle ingest writes one small file set per micro-batch per
        table; after B batches every read — even a perfectly kb-pruned
        one — still opens O(B) parquet footers, and at B in the tens of
        thousands footer I/O dominates the scan. This job folds every
        committed ``batch_id`` partition of the three index tables and
        the output table into ONE partition (``batch_id = -1``, a
        sentinel no live batch uses, so the per-batch
        ``exclude_batch=batch_id`` filters keep compacted rows visible),
        restoring the kb-range-clustered layout (_write_index) so file
        skipping works as on day one.

        Run it while ingest is QUIESCENT (between availableNow triggers,
        after the checkpoint committed): the next batch's reads are
        unaffected, but a redelivery of an already-compacted batch would
        duplicate its rows into the sentinel partition — the streaming
        checkpoint prevents redelivery; don't compact mid-trigger. The
        rewrite is idempotent (re-running folds the single sentinel
        partition onto itself). Cost: one localCheckpoint materialization
        of each table (rows are narrow index entries) — the
        read-own-path-then-overwrite safety pattern the module docstring
        describes.

        ``files_per_table`` caps the rewrite's partition count (without
        it, repartitionByRange defaults to spark.sql.shuffle.partitions
        and a small table would come out in MORE files than it went in —
        measured in the pytest). Size it as total_bytes / target file
        size (~256 MB-1 GB) in production.

        Returns {table: {"files_before": n, "files_after": n}}."""
        stats = {}
        for name, path, has_kb in (
            ("index", self.index_path, True),
            ("band_index", self.band_path, True),
            ("winnow_index", self.winnow_path, True),
            ("url_index", self.url_path, True),
            ("deduped", self.out_path, False),
        ):
            if not fsutil.exists(self.spark, path):
                continue
            # mergeSchema: partitions written by older engine versions may
            # lack newer columns — the fold must not drop them
            df = self.spark.read.option("mergeSchema", "true").parquet(path)
            before = df.select(F.input_file_name()).distinct().count()
            folded = df.drop("batch_id").localCheckpoint(eager=True)
            if has_kb and "kb" in folded.columns:
                folded = folded.repartitionByRange(
                    int(files_per_table), "kb"
                ).sortWithinPartitions("kb")
            else:
                folded = folded.repartition(int(files_per_table))
            (
                folded.withColumn(
                    "batch_id", F.lit(int(self.COMPACTED_BATCH_ID))
                )
                # static, EXPLICITLY: under a cluster default of 'dynamic'
                # (the mode _overwrite_partition itself uses) an overwrite
                # would replace only the sentinel partition and leave every
                # per-batch partition in place — duplicating all state
                .write.option("partitionOverwriteMode", "static")
                .partitionBy("batch_id")
                .mode("overwrite")
                .parquet(path)
            )
            after = (
                self.spark.read.parquet(path)
                .select(F.input_file_name())
                .distinct()
                .count()
            )
            stats[name] = {"files_before": before, "files_after": after}
        return stats

    def start(self, source_dir: str, schema: str, trigger_once: bool = True):
        stream = (
            self.spark.readStream.schema(schema)
            .parquet(source_dir)
            .withWatermark("warc_ts", "1 day")
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
