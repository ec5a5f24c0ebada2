"""Streaming twins: watermarked windowed agg + incremental extraction
produce batch-identical results (kappa equivalence)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_hourly_counts_stream_equals_batch(spark, tmp_path):
    from datacapsule_spark.streaming.stream_ops import hourly_event_counts

    src = str(tmp_path / "events_in")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        hourly_event_counts(stream)
        .writeStream.format("memory")
        .queryName("hourly_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["avg_value"])
        for r in spark.sql("select * from hourly_mem").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["avg_value"])
        for r in (
            events.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        ).collect()
    }
    assert got == want


def test_streaming_exact_dedup_keeps_one_per_hash(spark, tmp_path):
    """Streaming dedup twin: duplicates within the watermark horizon
    collapse to the first arrival; output hash set == batch distinct."""
    from datacapsule_spark.streaming.stream_ops import streaming_exact_dedup

    rows = [
        (1, "alpha beta gamma", "2024-01-01 10:00:00"),
        (2, "alpha beta gamma", "2024-01-01 10:05:00"),  # dup of 1
        (3, "delta epsilon", "2024-01-01 10:10:00"),
        (4, "alpha beta gamma", "2024-01-01 10:20:00"),  # dup of 1
        (5, "zeta eta", "2024-01-01 10:30:00"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string, ts string")
    src = str(tmp_path / "docs_in")
    batch.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_mem").collect()
    hashes = [r["content_hash"] for r in out]
    assert len(hashes) == len(set(hashes)) == 3  # one survivor per content
    assert {r["text"] for r in out} == {"alpha beta gamma", "delta epsilon", "zeta eta"}


def test_incremental_extract_matches_batch(spark, tmp_path, smoke_repos):
    from datacapsule_spark.extract import extract_triples
    from datacapsule_spark.streaming.stream_ops import incremental_extract_triples

    in_dir = str(tmp_path / "repos_in")
    out_dir = str(tmp_path / "triples_out")
    ck_dir = str(tmp_path / "ck")
    sample = smoke_repos.limit(50)
    sample.write.mode("overwrite").parquet(in_dir)

    q = incremental_extract_triples(spark, in_dir, ck_dir, out_dir)
    q.awaitTermination(180)

    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["subj"], r["pred"], r["obj"])
        for r in extract_triples(spark.read.parquet(in_dir), salt=False).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_quality_filter_equals_batch(spark, tmp_path):
    """The stateless quality gate forwards exactly the docs the batch
    filter keeps, with identical scores."""
    from datacapsule_spark.streaming.stream_ops import streaming_quality_filter

    src = str(tmp_path / "docs_in")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_quality_filter(stream, min_quality=0.6)
        .select("doc_id", "quality")
        .writeStream.format("memory")
        .queryName("quality_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["quality"])
        for r in spark.sql("select * from quality_mem").collect()
    }
    want = {
        (r["doc_id"], r["quality"])
        for r in streaming_quality_filter(docs, min_quality=0.6)
        .select("doc_id", "quality")
        .collect()
    }
    assert got == want and len(got) > 0
    # and some docs were actually filtered out
    assert len(got) < docs.count()


def test_streaming_decontaminate_hits_equals_batch(spark, tmp_path):
    """Stream-static join: contamination hits from the stream match
    the batch join exactly (stateless, append mode)."""
    from datacapsule_spark.streaming.stream_ops import streaming_decontaminate_hits

    src = str(tmp_path / "decon_in")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    train = docs.where(F.col("doc_id") % 7 != 0)
    train.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(train.schema).parquet(src)
    q = (
        streaming_decontaminate_hits(stream, bench)
        .writeStream.format("memory")
        .queryName("decon_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["g"])
        for r in spark.sql("select * from decon_mem").collect()
    }
    want = {
        (r["doc_id"], r["g"])
        for r in streaming_decontaminate_hits(train, bench).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_rollup_equals_batch(spark, tmp_path):
    """foreachBatch continuous aggregate: streaming all events into the
    rollup equals the one-shot batch rollup."""
    from datacapsule_spark.operators.rollup import hourly_rollup, read_rollup, with_avg
    from datacapsule_spark.streaming.stream_ops import streaming_hourly_rollup

    src = str(tmp_path / "ev_in")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    rdir = str(tmp_path / "rollup_s")
    q = streaming_hourly_rollup(
        spark, src, rdir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"], r["avg_value"])
        for r in with_avg(read_rollup(spark, rdir)).collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"], r["avg_value"])
        for r in with_avg(hourly_rollup(events)).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_pii_redaction_equals_batch(spark, tmp_path):
    """redact_pii is stateless column expressions, so it applies to a
    stream unchanged — the scrub runs in-flight before anything lands.
    Append-mode availableNow output must equal the batch scrub."""
    from datacapsule_spark.operators.curation import redact_pii

    rows = [
        (1, "mail a@b.co now"),
        (2, "from 10.0.0.1 tel 555-123-4567"),
        (3, "clean"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "pii_in")
    batch.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        redact_pii(stream)
        .writeStream.format("memory")
        .queryName("pii_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["text"], r["pii_total"])
        for r in spark.sql("select * from pii_mem").collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["pii_total"])
        for r in redact_pii(batch).collect()
    }
    assert got == want and got[3] == ("clean", 0)


def test_funnel_prune_preserves_greedy_under_any_arrival_order():
    """Pure-Python core: accumulating random event batches with the
    state's prune rule yields the same final greedy depth/frontier as
    one-shot greedy over the full set — i.e. pruning is safe under
    arbitrary in-watermark lateness."""
    import random

    from datacapsule_spark.streaming.funnel_stream import _prune, greedy_depth

    for seed in range(30):
        rng = random.Random(seed)
        full = [
            [rng.randint(0, 20) for _ in range(rng.randint(0, 6))]
            for _ in range(3)
        ]
        flat = [(i, t) for i, lst in enumerate(full) for t in lst]
        rng.shuffle(flat)  # arrival order unrelated to event time
        state = [[] for _ in range(3)]
        while flat:
            take = rng.randint(1, max(1, len(flat) // 2))
            batch, flat = flat[:take], flat[take:]
            for i, t in batch:
                state[i].append(t)
            state = _prune(state)
        assert greedy_depth(state) == greedy_depth(full), seed

    # rule 2 (watermark prune at steps past the first empty step):
    # arrivals respect the watermark (events sorted by ts with bounded
    # disorder; wm = max seen - delay), final greedy unchanged
    for seed in range(30):
        rng = random.Random(1000 + seed)
        full = [
            [rng.randint(0, 40) for _ in range(rng.randint(0, 6))]
            for _ in range(3)
        ]
        flat = sorted(
            ((i, t) for i, lst in enumerate(full) for t in lst),
            key=lambda it: it[1] + rng.randint(0, 5),  # bounded disorder
        )
        state = [[] for _ in range(3)]
        seen_max = 0
        while flat:
            take = rng.randint(1, max(1, len(flat) // 2))
            batch, flat = flat[:take], flat[take:]
            for i, t in batch:
                state[i].append(t)
                seen_max = max(seen_max, t)
            state = _prune(state, wm_ms=seen_max - 6)  # delay > disorder
        assert greedy_depth(state) == greedy_depth(full), seed

    # rule 2 bounds the broken-chain state: endless step-1 events with
    # no step-0 event must not accumulate
    state = [[], [], []]
    for t in range(0, 1000):
        state[1].append(t)
        state = _prune(state, wm_ms=t - 10)
    assert len(state[1]) <= 12

    # rule 2a: chain broken at a step holding a NON-VIABLE candidate
    # (out-of-order early-step event below the frontier) + endless
    # later-step events — once wm >= frontier the break step counts as
    # empty, so the tail step stays bounded too
    state = [[5], [3], []]
    for t in range(20, 1000):
        state[2].append(t)
        state = _prune(state, wm_ms=t - 10)
    assert state[1] == [] and len(state[2]) <= 12
    assert greedy_depth(state)[0] == 1


def test_streaming_funnel_matches_batch_operator(spark, tmp_path):
    """The stateful streaming funnel's emitted depths equal the batch
    operator's counts for every user whose state timed out before
    stream end (watermark = max ts - 10s, horizon 5s — every user
    whose last relevant event is older than ~15s closes)."""
    import pandas as pd

    from datacapsule_spark.operators.funnel import funnel_counts
    from datacapsule_spark.streaming.funnel_stream import streaming_funnel

    steps = ["view", "click", "purchase"]
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 25)
        .select("ts", "user_id", "event_type")
    )
    src = str(tmp_path / "funnel_in")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        streaming_funnel(stream, steps, horizon_s=5.0, watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("funnel_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from funnel_mem").collect()
    got = {r["user_id"]: r["depth"] for r in rows}
    # one emission per user in this single-activity-span dataset — a
    # dict would silently mask duplicate emissions otherwise
    assert len(rows) == len(got)

    # batch oracle: per-user greedy depth over the same events, for
    # users whose last STEP event precedes the end-of-stream closure
    pdf = events.where(F.col("event_type").isin(steps)).toPandas()
    wm_ms = int(pd.Timestamp(pdf["ts"].max()).value // 10**6) - 10_000
    from datacapsule_spark.streaming.funnel_stream import greedy_depth

    want = {}
    for uid, grp in pdf.groupby("user_id"):
        times = [[] for _ in steps]
        last = 0
        for t, typ in zip(grp["ts"], grp["event_type"]):
            ms = int(pd.Timestamp(t).value // 10**6)
            times[steps.index(typ)].append(ms)
            last = max(last, ms)
        if wm_ms > last + 5_000:  # timeout fired before stream end
            want[uid] = greedy_depth(times)[0]
    assert got == want
    assert len(got) > 0
    # cross-check totals against the batch DataFrame operator on the
    # closed-user subset
    closed = events.join(
        spark.createDataFrame([(u,) for u in want], "user_id long"),
        "user_id",
        "left_semi",
    )
    batch = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(closed, steps).collect()
    }
    for i in range(3):
        assert batch.get(i, 0) == sum(1 for d in want.values() if d > i)


def test_streaming_tokenize_equals_batch(spark, tmp_path):
    """Frozen-vocabulary subword tokenization over a stream emits
    exactly the batch tokenization (stateless, append mode)."""
    from datacapsule_spark.operators.tokenizer import bpe_apply, bpe_train
    from datacapsule_spark.streaming.stream_ops import streaming_tokenize

    src = str(tmp_path / "tok_in")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(src)
    merges = bpe_train(docs.limit(100), n_merges=6)
    assert merges

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_tokenize(stream, merges)
        .writeStream.format("memory")
        .queryName("tok_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], tuple(r["subwords"]), r["n_subwords"])
        for r in spark.sql("select * from tok_mem").collect()
    }
    want = {
        (r["doc_id"], tuple(r["subwords"]), r["n_subwords"])
        for r in bpe_apply(docs, merges).collect()
    }
    assert got == want and len(got) == docs.count()
    # the vocabulary actually merged something: some doc has a
    # multi-char subword
    assert any(
        len(s) > 1 and s != "</w>" for _, subs, _ in got for s in subs
    )


def test_streaming_decode_media_features_equals_batch(spark, tmp_path):
    """The multimodal decode twin produces row-identical decoded
    features and quarantine verdicts to the batch operator on the same
    media set (shared kernel — decode_features_kernel)."""
    import numpy as np

    from datacapsule_spark.operators.media_codecs import (
        encode_ppm,
        encode_wav_pcm16,
        encode_y4m,
    )
    from datacapsule_spark.operators.multimodal import MEDIA, decode_media_features
    from datacapsule_spark.streaming.stream_ops import (
        streaming_decode_media_features,
    )

    rows = []
    for i in range(6):
        img = np.full((4, 4, 3), 40 * i, dtype=np.uint8)
        rows.append(
            (f"img{i}", "image", bytearray(encode_ppm(img)),
             "image/x-portable-pixmap", 4, 4, None)
        )
    wav = encode_wav_pcm16(np.linspace(-0.5, 0.5, 400), 8000)
    rows.append(("aud0", "audio", bytearray(wav), "audio/wav", None, None, 50))
    vid = encode_y4m(np.full((3, 2, 2), 9, dtype=np.uint8), fps=3)
    rows.append(("vid0", "video", bytearray(vid), "video/x-yuv4mpeg", 2, 2, 1000))
    rows.append(("bad0", "image", bytearray(b"\x89PNG nope"), "image/png", 1, 1, None))

    media = spark.createDataFrame(rows, MEDIA)
    src = str(tmp_path / "media_in")
    media.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(MEDIA).parquet(src)
    q = (
        streaming_decode_media_features(stream)
        .writeStream.format("memory")
        .queryName("media_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def key(r):
        feats = tuple(round(v, 9) for v in r["features"]) if r["features"] else None
        return (r["media_id"], r["ok"], r["payload_bytes"], feats)

    got = {key(r) for r in spark.sql("select * from media_mem").collect()}
    want = {key(r) for r in decode_media_features(spark.read.parquet(src)).collect()}
    assert got == want and len(got) == 9
    assert sum(1 for k in got if k[1] == "error") == 1  # the PNG quarantined


def test_decode_media_fuzz_never_escapes_quarantine(spark):
    """Corrupt payloads (random byte flips / truncations of valid
    WAV/PPM/BMP/Y4M bytes) must either decode or raise an ordinary
    exception the quarantine catches — a poisoned corpus degrades to
    err-rows, never a dead stage. 120 mutants through the distributed
    operator: row count preserved, every row verdicted."""
    import numpy as np

    from datacapsule_spark.operators.media_codecs import (
        encode_bmp,
        encode_ppm,
        encode_wav_pcm16,
        encode_y4m,
    )
    from datacapsule_spark.operators.multimodal import MEDIA, decode_media_features

    rng = np.random.default_rng(42)
    base = [
        ("image/x-portable-pixmap", encode_ppm(
            rng.integers(0, 256, (6, 5, 3), dtype=np.uint8))),
        ("image/bmp", encode_bmp(
            rng.integers(0, 256, (4, 7, 3), dtype=np.uint8))),
        ("audio/wav", encode_wav_pcm16(rng.uniform(-1, 1, 300), 8000)),
        ("video/x-yuv4mpeg", encode_y4m(
            rng.integers(0, 256, (4, 4, 4), dtype=np.uint8), fps=2)),
    ]
    rows = []
    for i in range(120):
        mime, payload = base[i % 4]
        raw = bytearray(payload)
        mode = i % 3
        if mode == 0:  # flip 1-4 bytes anywhere (headers included)
            for _ in range(rng.integers(1, 5)):
                raw[rng.integers(0, len(raw))] = rng.integers(0, 256)
        elif mode == 1:  # truncate
            raw = raw[: rng.integers(0, len(raw))]
        else:  # prepend garbage
            raw = bytearray(rng.integers(0, 256, 7, dtype=np.uint8).tobytes()) + raw
        rows.append((f"m{i}", "fuzz", raw, mime, None, None, None))

    media = spark.createDataFrame(rows, MEDIA)
    out = decode_media_features(media).collect()
    assert len(out) == 120
    for r in out:
        assert r["ok"] in ("ok", "error")
        if r["ok"] == "error":
            assert r["err"] and r["features"] is None
        else:
            assert r["features"] is not None


def test_streaming_lsh_index_equals_rebuild(spark, tmp_path):
    """Streamed index maintenance: build on a standing corpus, stream a
    delta in (availableNow), and the index's pairs equal the in-memory
    rebuild over standing ∪ delta; a second streamed update of an
    existing doc supersedes it (latest version wins)."""
    from datacapsule_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_signatures,
    )
    from datacapsule_spark.operators.dedup_index import (
        build_lsh_index, lsh_index_pairs,
    )
    from datacapsule_spark.streaming.stream_ops import (
        streaming_lsh_index_update,
    )

    base = spark.createDataFrame(
        [(i, f"standing corpus doc number {i} body") for i in range(10)]
        + [(100, "shared near dup text body one"),
           (101, "shared near dup text body one")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_lsh_index(base, idx)

    src = str(tmp_path / "delta_in")
    delta1 = spark.createDataFrame(
        [(200, "shared near dup text body one"),
         (201, "totally fresh streamed text")],
        "doc_id long, text string",
    )
    delta1.write.mode("append").parquet(src)
    q = streaming_lsh_index_update(spark, src, idx, str(tmp_path / "ck1"))
    q.awaitTermination(120)

    def pairs_of(df):
        return sorted(
            (r["a"], r["b"])
            for r in minhash_lsh_pairs(minhash_signatures(df)).collect()
        )

    live = base.unionByName(delta1)
    got = sorted((r["a"], r["b"]) for r in lsh_index_pairs(spark, idx).collect())
    assert got == pairs_of(live) and (100, 200) in got

    # second stream: doc 200 changes text and leaves the dup cluster
    delta2 = spark.createDataFrame(
        [(200, "rewritten text no longer a duplicate")],
        "doc_id long, text string",
    )
    delta2.write.mode("append").parquet(src)
    q2 = streaming_lsh_index_update(spark, src, idx, str(tmp_path / "ck1"))
    q2.awaitTermination(120)
    live2 = base.unionByName(
        spark.createDataFrame(
            [(201, "totally fresh streamed text"),
             (200, "rewritten text no longer a duplicate")],
            "doc_id long, text string",
        )
    )
    got2 = sorted((r["a"], r["b"]) for r in lsh_index_pairs(spark, idx).collect())
    assert got2 == pairs_of(live2)
    assert all(200 not in p for p in got2)


def test_streaming_dedup_on_ingest(spark, tmp_path):
    """Probe-then-fold per batch: the first streamed delta's dup is
    flagged against the STANDING corpus; a second delta's dup of a
    doc from the FIRST delta is flagged too (the index grew mid-
    stream); fresh docs produce no hits; and the index ends equal to
    the rebuild over everything."""
    from datacapsule_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_signatures,
    )
    from datacapsule_spark.operators.dedup_index import (
        build_lsh_index, lsh_index_pairs,
    )
    from datacapsule_spark.streaming.stream_ops import (
        streaming_lsh_dedup_on_ingest,
    )

    base = spark.createDataFrame(
        [(1, "standing shared near dup body"), (2, "plain standing doc two")],
        "doc_id long, text string",
    )
    idx, hits = str(tmp_path / "idx"), str(tmp_path / "hits")
    build_lsh_index(base, idx)

    src = str(tmp_path / "in")
    d1 = spark.createDataFrame(
        [(10, "standing shared near dup body"), (11, "fresh streamed text one")],
        "doc_id long, text string",
    )
    d1.write.mode("append").parquet(src)
    q = streaming_lsh_dedup_on_ingest(
        spark, src, idx, hits, str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    d2 = spark.createDataFrame(
        [(20, "fresh streamed text one"), (21, "never seen anywhere else")],
        "doc_id long, text string",
    )
    d2.write.mode("append").parquet(src)
    q2 = streaming_lsh_dedup_on_ingest(
        spark, src, idx, hits, str(tmp_path / "ck")
    )
    q2.awaitTermination(120)

    got = {
        (r["new_id"], r["index_id"])
        for r in spark.read.parquet(hits).collect()
    }
    assert got == {(10, 1), (20, 11)}  # cross-batch dup caught mid-stream

    live = base.unionByName(d1).unionByName(d2)
    want = sorted(
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(minhash_signatures(live)).collect()
    )
    assert sorted(
        (r["a"], r["b"]) for r in lsh_index_pairs(spark, idx).collect()
    ) == want


def test_streaming_dedup_on_ingest_replay_idempotent(spark, tmp_path):
    """At-least-once replay AFTER the batch's upsert committed but
    before the sink checkpoint: the re-probe runs against an index
    already holding the batch's own docs, so without the own-id
    anti-join, within-batch near-dup pairs would appear as NEW hit
    rows that a DISTINCT cannot remove (ADVICE r06). Simulated by
    re-running the stream with a FRESH checkpoint dir (same batch,
    index already folded): hits must stay the same set."""
    from datacapsule_spark.operators.dedup_index import build_lsh_index
    from datacapsule_spark.streaming.stream_ops import (
        streaming_lsh_dedup_on_ingest,
    )

    base = spark.createDataFrame(
        [(1, "standing shared near dup body")], "doc_id long, text string"
    )
    idx, hits = str(tmp_path / "idx"), str(tmp_path / "hits")
    build_lsh_index(base, idx)

    src = str(tmp_path / "in")
    # 10 and 11 are near-dups of each other WITHIN the batch
    spark.createDataFrame(
        [(10, "totally new shared pair body"),
         (11, "totally new shared pair body")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)

    q = streaming_lsh_dedup_on_ingest(
        spark, src, idx, hits, str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    first = {
        (r["new_id"], r["index_id"])
        for r in spark.read.parquet(hits).collect()
    }
    assert first == set()  # within-batch pairs are the caller's concern

    # replay: fresh checkpoint, index already contains 10 and 11
    q2 = streaming_lsh_dedup_on_ingest(
        spark, src, idx, hits, str(tmp_path / "ck2")
    )
    q2.awaitTermination(120)
    replayed = {
        (r["new_id"], r["index_id"])
        for r in spark.read.parquet(hits).collect()
    }
    assert replayed == first  # idempotent up to DISTINCT
