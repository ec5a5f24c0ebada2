"""Structured Streaming surface.

The reference has NO data streaming (SURVEY.md §2.10 — its "streaming"
is fake token chunking, dspy_inference.py:236-330), so nothing here
ports reference behavior. These operators exist because the engine's
batch plans (queries.events_hourly, extraction) have natural streaming
twins that a production deployment of this pipeline would run for
incremental KG construction:

- hourly_event_counts: the watermarked streaming twin of
  queries.events_hourly — identical agg expression, late data bounded
  by the watermark.
- incremental_extract_triples: readStream over a repos directory →
  the same Arrow-batched extractor → append-mode sink. New source
  files become new triples without re-running the batch job
  (micro-batch checkpointing gives the same resume semantics as
  lineage.StageTracker does for batch).

Tested with in-memory/file streams in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extract import extract_triples
from ..schema import REPOS


def _word_shingles_stream(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as array<string> (lowercased,
    whitespace-tokenized) — JVM-side higher-order functions only.

    STREAM-ONLY shingle path: batch consumers must use
    operators.dedup.shingle_rows (posexplode + window-lead, ~10×
    faster — per-element lambda evaluation drops out of whole-stage
    codegen).  This HOF expression exists because a streaming
    DataFrame cannot run shingle_rows' sort window; it lives here, in
    the only module allowed to use it, so it cannot be reached for by
    batch code."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda _, i: F.when(
                    i <= F.size(toks) - n,
                    F.concat_ws(
                        " ",
                        *[
                            F.element_at(toks, (i + j + 1).cast("int"))
                            for j in range(n)
                        ],
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )


def hourly_event_counts(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling-window aggregate with late-data watermark.

    events_stream must carry (ts timestamp, event_type string, value
    double). Output schema matches the batch events_hourly query
    (hour, event_type, n, avg_value) so batch and stream results are
    union-compatible (lambda-free kappa shape).
    """
    return (
        # watermarks require TIMESTAMP (parquet may carry TIMESTAMP_NTZ)
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "avg_value")
    )


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of operators.dedup.exact_dedup's keep policy:
    forward only the first-arriving document per content hash.

    dropDuplicatesWithinWatermark keys the state store on md5(text)
    and expires entries past the watermark horizon — at ingest scale
    the state holds one key per in-horizon distinct content, never the
    full corpus history (the property that makes exact dedup runnable
    as a continuous job instead of a nightly batch)."""
    return (
        docs_stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def incremental_extract_triples(
    spark, input_dir: str, checkpoint_dir: str, output_dir: str,
    trigger_once: bool = True,
):
    """readStream(repos parquet dir) → extract → append parquet sink.

    Returns the StreamingQuery. trigger_once=True processes all
    available input then stops (the batch-equivalence mode the tests
    assert on); in production use a processingTime trigger.
    """
    stream = spark.readStream.schema(REPOS).parquet(input_dir)
    triples = extract_triples(stream, salt=False)  # no repartition in stream
    writer = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_quality_filter(
    docs_stream: DataFrame, min_quality: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Stateless streaming twin of the batch quality gate: score each
    arriving document with operators.text.quality_exprs (the SAME
    column expressions the batch quality_score projects — shared so
    the two paths cannot drift) and forward only docs at or above the
    threshold.

    No watermark, no state store: a pure per-row projection+filter, so
    the micro-batch plan is identical to the batch plan and
    stream-filtered output is row-equal to batch-filtered output on
    the same input (asserted in tests/test_streaming.py)."""
    from ..operators.text import quality_exprs

    score = F.round(quality_exprs(text_col)["score"], 6)
    return docs_stream.withColumn("quality", score).where(
        F.col("quality") >= min_quality
    )


def streaming_decontaminate_hits(
    docs_stream: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of operators.curation.decontaminate, emitted as
    stateless (doc_id, g) contamination hits: each arriving doc's
    word n-grams (array HOFs — a stream cannot run the batch path's
    sort window) stream-static join against the (static, broadcast)
    benchmark gram dictionary. No watermark, no state store —
    downstream rolls hits up per doc if it wants counts; the stateless
    emission is what keeps the operator append-mode and
    backfill-equal to the batch join (asserted in
    tests/test_streaming.py)."""
    from ..operators.dedup import shingle_rows

    # benchmark is STATIC — it gets the fast batch shingle path
    bench_grams = F.broadcast(
        shingle_rows(benchmark, text_col, id_col, shingle_n)
        .select("g")
        .distinct()
    )
    grams = docs_stream.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_shingles_stream(text_col, shingle_n)).alias("g"),
    )
    return grams.join(bench_grams, "g").select("doc_id", "g")


def streaming_hourly_rollup(
    spark, events_dir: str, rollup_dir: str, checkpoint_dir: str,
    schema=None, trigger_once: bool = True,
):
    """Continuous aggregate: readStream(events) → foreachBatch →
    operators.rollup.refresh_hourly_rollup. foreachBatch delivery is
    AT-LEAST-ONCE (a crash between the sink write and the checkpoint
    commit replays the batch), so the refresh is keyed by the
    micro-batch id: a replayed batch REPLACES its own prior partial
    rows instead of double-counting — effectively-once results from an
    at-least-once feed. Every refresh rewrites only the batch's
    affected hour partitions. Returns the StreamingQuery."""
    from ..operators.rollup import refresh_hourly_rollup

    if schema is None:  # file streams need an explicit schema
        schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    writer = stream.writeStream.foreachBatch(
        lambda batch_df, bid: refresh_hourly_rollup(
            spark, rollup_dir, batch_df, batch_id=bid
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_tokenize(
    docs_stream: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Stateless streaming twin of operators.tokenizer.bpe_apply: each
    arriving document is subword-tokenized with the SAME trained merge
    list (bpe_apply is reused verbatim — mapInPandas runs unchanged on
    a streaming DataFrame, so the two paths cannot drift).

    No watermark, no state store: the merge table rides the closure,
    the per-batch word memo resets per micro-batch. This is the online
    half of tokenizer induction — train offline on the corpus
    (bpe_train), tokenize the firehose with the frozen vocabulary."""
    from ..operators.tokenizer import bpe_apply

    return bpe_apply(
        docs_stream, merges, text_col=text_col, id_col=id_col,
        lowercase=lowercase,
    )


def streaming_decode_media_features(
    media_stream: DataFrame, strict: bool = False
) -> DataFrame:
    """Stateless streaming twin of operators.multimodal
    .decode_media_features: each arriving media row is decoded with the
    SAME Arrow-batched kernel (decode_features_kernel is reused
    verbatim, so the two paths cannot drift) — real WAV/PPM/BMP/Y4M
    parsing, row-level error quarantine (ok/err columns) for payloads
    the codecs can't read.

    No watermark, no state store, and no skew-spread repartition: the
    batch operator's payload-size spread is a throughput concern for
    corpus-sized scans; a micro-batch is already bounded, and keeping
    the stream plan shuffle-free means one bad or huge blob delays only
    its own micro-batch task."""
    from ..operators.multimodal import DECODED_FEATURES, decode_features_kernel

    return media_stream.mapInPandas(
        decode_features_kernel(strict), schema=DECODED_FEATURES
    )


def streaming_lsh_index_update(
    spark, docs_dir: str, index_dir: str, checkpoint_dir: str,
    schema=None, trigger_once: bool = True, version_base: int = 1,
):
    """Continuous near-dup index maintenance: readStream(docs) →
    foreachBatch → dedup_index.upsert_lsh_index at version
    ``version_base + batch_id`` — the arriving firehose folds into the
    standing band index in O(batch) per micro-batch, and any consumer
    can probe/read the index mid-stream (version-log reads are always
    consistent). Build the index on the standing corpus first
    (build_lsh_index); stream deltas after.

    Delivery is AT-LEAST-ONCE (the rollup twin's caveat): a replayed
    batch re-appends the SAME rows at the SAME version — harmless for
    reads (the resolution window picks one log row and pair/probe
    results are distinct) and reclaimed by compact_lsh_index. Batch
    ids are monotone, so a doc updated across batches resolves to its
    latest text. Caller contract: a doc_id at most once per
    micro-batch (same-version duplicates with DIFFERENT text are
    undefined, as in upsert_lsh_index). Returns the StreamingQuery."""
    from ..operators.dedup_index import upsert_lsh_index

    if schema is None:  # file streams need an explicit schema
        schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    writer = stream.writeStream.foreachBatch(
        lambda batch_df, bid: upsert_lsh_index(
            batch_df, index_dir, version=version_base + bid
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_lsh_dedup_on_ingest(
    spark, docs_dir: str, index_dir: str, hits_dir: str,
    checkpoint_dir: str, schema=None, trigger_once: bool = True,
    version_base: int = 1,
):
    """Near-dup screening ON INGEST: for each micro-batch, (1) probe
    the batch against the standing band index (O(batch) — only the
    batch shingles), appending the (new_id, index_id, batch_id)
    candidates to ``hits_dir``; then (2) fold the batch into the index
    at version ``version_base + batch_id`` so later batches dedup
    against it too. The order inside the batch matters: probe BEFORE
    upsert, so a doc never reports itself as its own near-dup and
    within-batch pairs stay the caller's concern (as in
    lsh_index_probe).

    Replay caveat (at-least-once foreachBatch): a re-delivered batch
    re-probes and re-appends its hits — hits_dir rows carry batch_id,
    so consumers dedup with a DISTINCT or latest-batch read. A replay
    can also arrive AFTER the batch's own upsert committed (crash
    between the upsert and the sink checkpoint), so the re-probe runs
    against an index that already holds the batch's own docs — the
    probe hits are therefore anti-joined against the batch's own ids
    on index_id, keeping replayed probes idempotent up to DISTINCT
    (without it, within-batch near-dup pairs appeared as NEW rows a
    DISTINCT cannot remove — ADVICE r06). The index side is
    replay-safe as in streaming_lsh_index_update. Returns the
    StreamingQuery."""
    from ..operators.dedup_index import lsh_index_probe, upsert_lsh_index

    if schema is None:
        schema = spark.read.parquet(docs_dir).schema

    def step(batch_df, bid):
        hits = (
            lsh_index_probe(batch_df, index_dir)
            .join(
                batch_df.select(F.col("doc_id").alias("index_id")),
                "index_id",
                "left_anti",
            )
            .withColumn("batch_id", F.lit(int(bid)).cast("long"))
        )
        hits.write.mode("append").parquet(hits_dir)
        upsert_lsh_index(batch_df, index_dir, version=version_base + bid)

    stream = spark.readStream.schema(schema).parquet(docs_dir)
    writer = stream.writeStream.foreachBatch(step).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
