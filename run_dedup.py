#!/usr/bin/env python
"""spark-submit driver for the dedup pipeline.

Cluster usage (north_rule contract):

    zip -r spark_dedup.zip entity_deduplication_hack_main_spark/
    spark-submit --py-files spark_dedup.zip run_dedup.py \
        --input  s3://bucket/crawl/documents/ \
        --output s3://bucket/crawl/clusters/ \
        --workdir s3://bucket/crawl/_stages/run42 \
        --text-col text --id-col url

Local smoke:

    python run_dedup.py --synthetic 10000 --output /tmp/clusters \
        --workdir /tmp/dedup_stages

Resumable: re-running with the same --workdir skips committed stages
(plans/lineage.py); per-partition lineage rows land in <workdir>/_lineage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet/Iceberg path of the documents table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--output", default=None,
                    help="cluster-assignment sink (required unless "
                         "--compact-spans, whose sink is "
                         "<workdir>/deduped_cut)")
    ap.add_argument("--workdir", default=None, help="stage-commit dir (resume)")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--extract-html", action="store_true",
                    help="derive text from the html column first")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] when not under spark-submit")
    ap.add_argument("--streaming-source", default=None,
                    help="landing directory: run the Structured Streaming "
                         "ingest (exact + MinHash near-dup vs the committed "
                         "index; availableNow trigger) instead of the batch "
                         "pipeline. Requires --workdir.")
    ap.add_argument("--streaming-schema",
                    default="url string, warc_ts timestamp, text string")
    ap.add_argument("--holdout", default=None,
                    help="parquet path of a benchmark/eval corpus (same "
                         "id/text columns). Streaming mode: every "
                         "micro-batch is decontaminated against it before "
                         "any state write (drops recorded as "
                         "n_contaminated). Batch mode: a committed "
                         "'contaminated' stage removes matching docs "
                         "before candidates/spans/output.")
    ap.add_argument("--holdout-ngram-n", type=int, default=None,
                    help="with --holdout: also drop batch docs whose "
                         "fraction of distinct n-grams found in the "
                         "holdout reaches --holdout-ngram-frac (quoted "
                         "eval spans; GPT-3 uses n=13)")
    ap.add_argument("--holdout-ngram-frac", type=float, default=0.7)
    ap.add_argument("--table-format", choices=["parquet", "iceberg"],
                    default=None,
                    help="input/output table format; default "
                         "$SPARK_DEDUP_TABLE_FORMAT or parquet. iceberg "
                         "targets are catalog.db.table identifiers and "
                         "need the runtime jar + catalog conf "
                         "(sources/tables.py iceberg_spark_conf)")
    ap.add_argument("--span-k", type=int, default=None,
                    help="also run the exact-substring span pass (maximal "
                         "verbatim runs >= span-k tokens; Lee et al. 2021 "
                         "span cutting) and write spans to --spans-output")
    ap.add_argument("--spans-output", default=None,
                    help="sink for the span pass (requires --span-k)")
    ap.add_argument("--cut-output", default=None,
                    help="sink for the RAW-byte span-cut corpus (id, "
                         "n_tokens, n_cut, aligned, text_cut); requires "
                         "--span-k. One gram pass feeds both spans and cut.")
    ap.add_argument("--line-dedup-max-doc-freq", type=int, default=None,
                    help="pre-stage: remove every line appearing in more "
                         "than this many distinct docs (C4/CCNet "
                         "boilerplate rule) before representation; "
                         "emptied docs are dropped")
    ap.add_argument("--url-dedup", action="store_true",
                    help="pre-stage: keep one page per canonical URL "
                         "(tracking params/www/ports/fragments stripped; "
                         "earliest warc_ts wins)")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--gopher-filter", action="store_true",
                    help="pre-stage: drop docs failing the published "
                         "Gopher repetition thresholds (zero-shuffle "
                         "kernel map)")
    ap.add_argument("--redact-output", default=None,
                    help="post-stage: write the SHIPPED corpus — one "
                         "keep-best representative per cluster, PII "
                         "masked (functions/pii.py) — to this path")
    ap.add_argument("--compact-lines", action="store_true",
                    help="periodic batch compaction for a STREAMED "
                         "workdir: corpus-global boilerplate line removal "
                         "over <workdir>/deduped into "
                         "<workdir>/deduped_lines (doc-freq rule via "
                         "--line-dedup-max-doc-freq, default 8). Requires "
                         "--workdir; runs instead of the pipeline.")
    ap.add_argument("--compact-state", action="store_true",
                    help="maintenance for a STREAMED workdir: fold every "
                         "per-batch partition of the index/output tables "
                         "into one compacted partition (small-file "
                         "compaction, kb layout preserved). Run while "
                         "ingest is quiescent. Requires --workdir; runs "
                         "instead of the pipeline.")
    ap.add_argument("--compact-state-files", type=int, default=8,
                    help="target file count per compacted table")
    ap.add_argument("--compact-spans", action="store_true",
                    help="periodic batch compaction for a STREAMED workdir: "
                         "run the corpus-global exact-substring span pass + "
                         "raw-byte cutting over <workdir>/deduped and "
                         "overwrite <workdir>/deduped_cut (span-k via "
                         "--span-k, default 20). Requires --workdir; runs "
                         "instead of the pipeline.")
    args = ap.parse_args()
    if args.holdout_ngram_n is not None and not args.holdout:
        ap.error("--holdout-ngram-n requires --holdout")

    from pyspark.sql import SparkSession

    from entity_deduplication_hack_main_spark import DedupConfig, get_spark
    from entity_deduplication_hack_main_spark.operators import extraction
    from entity_deduplication_hack_main_spark.plans.pipeline import run_pipeline
    from entity_deduplication_hack_main_spark.sources import corpus, sinks, tables

    active = SparkSession.getActiveSession()
    spark = active or get_spark(parallelism=args.cpus)
    config = DedupConfig()
    if args.span_k:
        from dataclasses import replace

        config = replace(
            config,
            substring_span_k=args.span_k,
            substring_cut=bool(args.cut_output),
        )
    elif args.cut_output:
        ap.error("--cut-output requires --span-k")

    if not args.output and not (
        args.compact_spans or args.compact_lines or args.compact_state
    ):
        ap.error("--output is required (except with --compact-spans/"
                 "--compact-lines/--compact-state)")

    if args.compact_state:
        if not args.workdir:
            ap.error("--compact-state requires --workdir")
        from entity_deduplication_hack_main_spark.streaming.ingest import (
            StreamingDedup,
        )

        sd = StreamingDedup(
            spark, args.workdir, config,
            text_col=args.text_col, id_col=args.id_col,
        )
        t0 = time.monotonic()
        stats = sd.state_compaction(files_per_table=args.compact_state_files)
        print(json.dumps({
            "mode": "compact_state",
            "tables": stats,
            "wall_sec": round(time.monotonic() - t0, 2),
        }))
        return

    if args.compact_spans:
        if not args.workdir:
            ap.error("--compact-spans requires --workdir")
        from entity_deduplication_hack_main_spark.streaming.ingest import (
            StreamingDedup,
        )

        sd = StreamingDedup(
            spark, args.workdir, config,
            text_col=args.text_col, id_col=args.id_col,
        )
        t0 = time.monotonic()
        cut = sd.span_cut_compaction(span_k=args.span_k or 20)
        from pyspark.sql import functions as F

        stats = cut.agg(
            F.count("*").alias("docs"),
            F.sum(F.col("n_cut").cast("decimal(38,0)")).alias("cut_tokens"),
            F.sum((F.col("n_cut") > 0).cast("bigint")).alias("docs_cut"),
        ).collect()[0]
        print(json.dumps({
            "mode": "compact_spans",
            "docs": stats["docs"],
            "docs_cut": stats["docs_cut"],
            "cut_tokens": int(stats["cut_tokens"] or 0),
            "wall_sec": round(time.monotonic() - t0, 2),
            "out_path": os.path.join(args.workdir, "deduped_cut"),
        }))
        return

    if args.compact_lines:
        if not args.workdir:
            ap.error("--compact-lines requires --workdir")
        from entity_deduplication_hack_main_spark.streaming.ingest import (
            StreamingDedup,
        )

        sd = StreamingDedup(
            spark, args.workdir, config,
            text_col=args.text_col, id_col=args.id_col,
        )
        t0 = time.monotonic()
        cleaned = sd.line_dedup_compaction(
            max_doc_freq=args.line_dedup_max_doc_freq or 8
        )
        from pyspark.sql import functions as F

        stats = cleaned.agg(
            F.count("*").alias("docs"),
            F.sum(F.col("n_removed").cast("decimal(38,0)")).alias("rm"),
            F.sum((F.col("n_kept") == 0).cast("bigint")).alias("emptied"),
        ).collect()[0]
        print(json.dumps({
            "mode": "compact_lines",
            "docs": stats["docs"],
            "lines_removed": int(stats["rm"] or 0),
            "docs_emptied": stats["emptied"],
            "wall_sec": round(time.monotonic() - t0, 2),
            "out_path": os.path.join(args.workdir, "deduped_lines"),
        }))
        return

    if args.streaming_source:
        if not args.workdir:
            ap.error("--streaming-source requires --workdir")
        from entity_deduplication_hack_main_spark.streaming.ingest import (
            StreamingDedup,
        )

        holdout = (
            spark.read.parquet(args.holdout) if args.holdout else None
        )
        sd = StreamingDedup(
            spark, args.workdir, config,
            text_col=args.text_col, id_col=args.id_col,
            holdout=holdout,
            holdout_ngram_n=args.holdout_ngram_n,
            holdout_ngram_frac=args.holdout_ngram_frac,
            # --url-dedup applies to streaming too: the URL channel runs
            # first per batch; earliest warc_ts wins when the stream
            # schema carries it, else lowest id
            url_col=args.url_col if args.url_dedup else None,
            url_ts_col=(
                "warc_ts" if "warc_ts" in args.streaming_schema else None
            ),
        )
        t0 = time.monotonic()
        sd.start(args.streaming_source, args.streaming_schema).awaitTermination()
        out = spark.read.parquet(sd.out_path)
        result = {
            "mode": "streaming",
            "deduped_rows": out.count(),
            "wall_sec": round(time.monotonic() - t0, 2),
            "out_path": sd.out_path,
        }
        # per-channel decision counts, summed over this run's batches —
        # the _streaming_lineage table holds the per-batch rows
        from entity_deduplication_hack_main_spark.plans import fsutil

        if fsutil.exists(spark, sd.lineage_path):
            # mergeSchema: lineage columns grow across engine versions
            # (e.g. n_contaminated); a resumed legacy workdir holds
            # mixed-schema batch partitions
            lin = spark.read.option("mergeSchema", "true").parquet(
                sd.lineage_path
            )
            agg = lin.groupBy().sum().collect()[0].asDict()
            result["lineage_totals"] = {
                k.removeprefix("sum(").removesuffix(")"): v
                for k, v in agg.items()
                if k.startswith("sum(") and "batch_id" not in k
            }
            result["n_batches"] = lin.count()
        print(json.dumps(result))
        return

    if args.synthetic:
        docs = corpus.synthesize_corpus(spark, n_docs=args.synthetic)
        id_col, text_col = "doc_id", "text"
    else:
        if not args.input:
            ap.error("--input or --synthetic required")
        docs = tables.read_table(spark, args.input, args.table_format)
        id_col, text_col = args.id_col, args.text_col

    if args.extract_html:
        docs = extraction.with_extracted_text(docs, "html", "_text")
        text_col = "_text"

    run_id = args.run_id or f"run-{int(time.time())}"
    t0 = time.monotonic()
    res = run_pipeline(
        spark, docs, config,
        id_col=id_col, text_col=text_col,
        workdir=args.workdir, run_id=run_id,
        line_dedup_max_doc_freq=args.line_dedup_max_doc_freq,
        gopher_filter=args.gopher_filter,
        url_dedup_col=args.url_col if args.url_dedup else None,
        pii_redact=args.redact_output is not None,
        holdout=(spark.read.parquet(args.holdout) if args.holdout else None),
        holdout_ngram_n=args.holdout_ngram_n,
        holdout_ngram_frac=args.holdout_ngram_frac,
    )
    tables.write_table(res.assignments, args.output, args.table_format)
    if res.spans is not None and args.spans_output:
        tables.write_table(res.spans, args.spans_output, args.table_format)
    if res.cut_docs is not None and args.cut_output:
        tables.write_table(res.cut_docs, args.cut_output, args.table_format)
    if res.redacted is not None and args.redact_output:
        tables.write_table(res.redacted, args.redact_output, args.table_format)
    n = res.assignments.count()
    n_clusters = res.assignments.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0
    print(json.dumps({
        "run_id": run_id, "docs": n, "clusters": n_clusters,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1) if wall else None,
        "stages": res.committer.events,
    }))


if __name__ == "__main__":
    main()
