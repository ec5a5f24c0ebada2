"""Document deduplication operators for large-scale training pipelines.

Five tiers, each a DataFrame-native operator over a documents table
(doc_id, text, ...):

- exact:     hash-groupBy on md5(text) — one shuffle on the hash key.
- minhash:   shingle → minhash signature → banded LSH bucket join —
             near-dup pairs without O(n²); signatures via md5 (stable
             across engines so the DuckDB oracle can reproduce them).
- simhash:   64-bit sign-aggregated token fingerprint; near-dups =
             small hamming distance within blocking buckets.
- ngram_jaccard: exact n-gram Jaccard over candidate pairs (the
             re-score stage after any blocking tier).
- embedding_cosine: near-dup by cosine ≥ τ over an embedding column
             (pairs via LSH buckets at scale; exact join here).

Determinism note: every hash is md5-derived (F.md5 ≡ DuckDB md5), so
the oracle SQL reproduces signatures bit-for-bit — Spark's xxhash64 and
DuckDB's hash() would NOT match across engines.

At 100 TB: exact dedup shuffles only (hash, doc_id) pairs; minhash
bands shuffle B small (band_hash, doc_id) tables; no stage materializes
pairwise candidates beyond colliding buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Word-n-gram shingles as ROWS (doc_id, g).

    Shuffle-free sliding window (r07): n aligned `slice`s of the token
    array zipped (`arrays_zip`) and exploded — all fixed-argument
    codegen expressions, NO per-doc window. The previous
    posexplode + lead-over-window form shuffled and sorted every token
    row by doc_id before the grams even existed (the dominant exchange
    of the whole minhash path; at 100 TB that is a full-corpus-tokens
    shuffle bought for nothing). Per-element lambda HOFs
    (transform/element_at with dynamic ordinals) remain out: they drop
    to interpreted eval and cost ~10× — measured 23s → 1.5s on 260k
    shingles; slice/arrays_zip/explode stay in whole-stage codegen.

    distinct=False skips the per-(doc_id, g) dedup SHUFFLE for
    consumers that are duplicate-invariant (min in minhash_signatures,
    collect_set in with_shingles) — rows arrive doc-contiguous straight
    off the scan split, so a following groupBy(doc_id) partial-
    aggregates map-side to ~one row per doc before its exchange.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    length = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.arrays_zip(*[F.slice(toks, j + 1, length) for j in range(n)])
        ).alias("_t"),
    )
    out = z.select(
        "doc_id",
        F.concat_ws(" ", *[F.col("_t")[str(j)] for j in range(n)]).alias("g"),
    )
    return out.distinct() if distinct else out


def with_shingles(
    docs: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "grams",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shingles as an array column (collect_set over shingle_rows),
    re-joined onto the input. Docs with < n tokens get an empty array."""
    arrs = (
        shingle_rows(docs, text_col, id_col, n, distinct=False)
        .groupBy("doc_id")  # collect_set dedups; no pre-distinct shuffle
        .agg(F.collect_set("g").alias(out_col))
        .withColumnRenamed("doc_id", id_col)
    )
    return docs.join(arrs, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → (content_hash, n_dups,
    keep_id = min id). Groups with n_dups > 1 are duplicates."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, sig array): sig[i] = min over shingles of
    hash(i || ':' || shingle).

    hash_fn="md5" (default) is the cross-engine-reproducible contract
    — the DuckDB oracle rebuilds signatures bit-for-bit. hash_fn=
    "xxhash64" is the PRODUCTION path: a native 64-bit JVM hash with
    bigint mins instead of 32-hex-char string digests — no oracle twin
    (DuckDB has no xxhash64), same banding semantics; the pipeline's
    near-dedup stage uses it (equivalence pytest on the gated chain).
    """
    # NOTE an affine family ((a + i·b) mod p from two digests) was
    # tried and REVERTED: warm-session A/Bs showed it 3× faster, but
    # fresh-JVM isolation inverted the ordering (md5-per-hash wins on
    # this host — the window/shuffle dominates, and conv(hex) costs
    # more than short-string md5). Kept out per the measurement
    # discipline in CLAUDE.md.
    if hash_fn == "md5":
        def h(i):
            return F.md5(F.concat(F.lit(f"{i}:"), F.col("g")))
    elif hash_fn == "xxhash64":
        # hash the GRAM once to 8 bytes, then derive the n_hashes family
        # from (i, g64): each per-index hash works on a fixed-width
        # bigint instead of re-hashing the ~25-char gram string — the
        # per-row hash cost drops n_hashes-fold on the string part
        # (fresh-JVM A/B'd on the neardedup tier; the earlier affine-
        # family revert replaced the HASH with arithmetic — this keeps
        # a full xxhash64 per index, only narrowing its input)
        def h(i):
            return F.xxhash64(F.lit(i), F.col("_g64"))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    # shingle rows + hash-aggregate: min-per-hash runs in whole-stage
    # codegen (nested transform() closures drop to interpreted eval)
    exploded = shingle_rows(docs, text_col, id_col, shingle_n, distinct=False)
    if hash_fn == "xxhash64":
        exploded = exploded.withColumn("_g64", F.xxhash64("g"))
    mins = exploded.groupBy("doc_id").agg(  # min is duplicate-invariant
        *[F.min(h(i)).alias(f"h{i}") for i in range(n_hashes)]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def band_rows(
    signatures: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Banded LSH rows (doc_id, band_idx, band_hash) — the ONE banding
    implementation, shared by the in-memory pair join and the
    incremental on-disk index (dedup_index.py). hash_fn must match the
    signatures': "md5" (string elements, oracle-reproducible) or
    "xxhash64" (bigint elements, native)."""
    def band_hash(b):
        elems = [
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        if hash_fn == "md5":
            return F.md5(F.concat_ws("|", *elems))
        if hash_fn == "xxhash64":
            return F.xxhash64(*elems)
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")

    return signatures.select(
        "doc_id",
        F.posexplode(
            F.array(*[band_hash(b) for b in range(n_bands)])
        ).alias("band_idx", "band_hash"),
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Banded LSH: docs sharing any band of the signature become a
    candidate pair (a < b). Shuffle key = (band_idx, band_hash)."""
    # the self-join consumes `bands` twice; without materialization the
    # whole shingle→signature pipeline would run once per side
    bands = band_rows(
        signatures, n_bands, rows_per_band, hash_fn
    ).localCheckpoint(eager=False)
    # shuffle_hash: bands is corpus-scale (|docs| × n_bands rows) and
    # comes off a localCheckpoint with no stats — Catalyst's fallback
    # guess otherwise BROADCASTS a whole side of the self-join (driver
    # OOM at scale). The shuffle key below is the point of banding.
    left = bands.alias("l")
    right = bands.hint("shuffle_hash").alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def minhash_lsh_pairs_cross(
    signatures_a: DataFrame,
    signatures_b: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Two-corpus banded LSH: candidate pairs only ACROSS the corpora
    (a from A, b from B) — a unioned self-join would also pay for the
    A×A and B×B candidate volume, which at train-vs-eval scale (huge A,
    small B) is almost all of the work for none of the answer. Same
    banding/shuffle key as minhash_lsh_pairs; both signature sets must
    come from minhash_signatures with identical n_hashes/hash_fn.
    Caller contract: id domains are disjoint (pairs are emitted
    without an ordering constraint)."""
    # shuffle_hash: neither corpus is stats-known here and either can be
    # huge (train side always is) — never leave the build side to
    # Catalyst's no-stats broadcast guess. AQE may still downgrade the
    # exchange reader when the eval side turns out tiny at runtime.
    left = band_rows(signatures_a, n_bands, rows_per_band, hash_fn).alias("l")
    right = (
        band_rows(signatures_b, n_bands, rows_per_band, hash_fn)
        .hint("shuffle_hash")
        .alias("r")
    )
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def cross_corpus_near_pairs(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_n: int = 3,
    n_bands: int = 4,
    rows_per_band: int = 4,
    min_jaccard: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Doc-level train-vs-eval near-duplicate screening: MinHash-LSH
    candidates ACROSS two corpora, exact n-gram Jaccard re-score →
    (a, b, jaccard) with a from docs_a, b from docs_b. The doc-level
    complement of curation.decontaminate's gram-level overlap — finds
    eval documents that exist in the training set as whole near-copies
    rather than quoted fragments. Never all-pairs: candidates exist
    only where a band collides across the corpora."""
    sa = minhash_signatures(docs_a, text_col, id_col, n_hashes, shingle_n, hash_fn)
    sb = minhash_signatures(docs_b, text_col, id_col, n_hashes, shingle_n, hash_fn)
    cand = minhash_lsh_pairs_cross(sa, sb, n_bands, rows_per_band, hash_fn).localCheckpoint(
        eager=False
    )
    # re-score via the shared row-form gate over the UNION of the two
    # corpora (id domains are disjoint by caller contract, so pair ids
    # resolve unambiguously): only docs appearing in candidates are
    # shingled — previously BOTH corpora were fully shingled into
    # per-doc arrays and Catalyst broadcast the corpus-scale gram
    # tables (4 BroadcastHashJoins, driver OOM at scale).
    both = docs_a.select(F.col(id_col), F.col(text_col)).unionByName(
        docs_b.select(F.col(id_col), F.col(text_col))
    )
    return ngram_jaccard_pairs(both, cand, text_col, id_col, shingle_n, min_jaccard)


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard re-score of candidate pairs(a, b) in
    ROW form — distinct shingle rows, a pair×gram join for |A∩B|, and
    per-doc gram counts for |A∪B| = |A|+|B|−|A∩B|. No UDF, no arrays.

    Two scale properties the previous array form
    (with_shingles → array_intersect/array_union) lacked:

    - only docs that APPEAR in pairs are shingled (left-semi on the
      pair id set): candidates are orders of magnitude fewer than the
      corpus, and the corpus-wide with_shingles was the dominant cost
      of the pipeline's near-dedup stage (5.5s of a 12.7s warm
      near_dedup on the 50k-file bench corpus for 16.6k pairs);
    - no per-doc gram ARRAY is ever built: a long document is spread
      across shingle rows instead of one collect_set row, so there is
      no hot-row memory spike and the joins stay in whole-stage
      codegen (measured 7.1s → 1.9s for the gate on the bench corpus).

    Callers should materialize `pairs` first (near_dedup does) — it is
    consumed multiple times below. Semantics match the array form
    exactly: jaccard = |A∩B| / (|A|+|B|−|A∩B|) over DISTINCT grams;
    docs with < shingle_n tokens have empty gram sets, making the
    denominator 0 for empty∧empty pairs (NULL jaccard → dropped, as
    0/0 was in the array form) and jaccard 0 for empty∧non-empty."""
    cand_ids = (
        pairs.select(F.col("a").alias(id_col))
        .union(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    gsh = shingle_rows(
        docs.join(cand_ids, id_col, "left_semi"),
        text_col, id_col, shingle_n, distinct=True,
    ).localCheckpoint(eager=False)  # consumed by sizes + both join sides
    sizes = gsh.groupBy("doc_id").count()
    na = sizes.select(F.col("doc_id").alias("a"), F.col("count").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("count").alias("nb"))
    # distinct probe side: duplicate (a, b) input rows must not double-
    # count grams (minhash_lsh_pairs already distincts; arbitrary
    # callers may not) — each input row still gets its score via the
    # final left join.
    # shuffle_hash hints: gsh comes off a localCheckpoint (ExistingRDD,
    # no stats), so Catalyst's size guess otherwise BROADCASTS the
    # multi-million-row gram table on both joins (measured: two ~200MB
    # driver-built hash relations, 15s for a join whose shuffle form is
    # ~2s; at scale the gram table never fits a broadcast). Hash join,
    # not sort-merge — the (b, g) string sort is pure waste before a
    # hash aggregate.
    inter = (
        pairs.select("a", "b").distinct()
        .join(gsh.select(F.col("doc_id").alias("a"), "g").hint("shuffle_hash"), "a")
        .join(gsh.select(F.col("doc_id").alias("b"), "g").hint("shuffle_hash"), ["b", "g"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("ni"))
    )
    # assembly joins are pair-/candidate-scale on every side — also
    # unbounded, so keep them off the broadcast path too
    return (
        pairs.join(na.hint("shuffle_hash"), "a", "left")
        .join(nb.hint("shuffle_hash"), "b", "left")
        .join(inter.hint("shuffle_hash"), ["a", "b"], "left")
        .withColumn("ni", F.coalesce("ni", F.lit(0)))
        .withColumn(
            "_union",
            F.coalesce("na", F.lit(0)) + F.coalesce("nb", F.lit(0)) - F.col("ni"),
        )
        # try_divide: an empty∧empty pair has union 0 → NULL jaccard →
        # dropped by the threshold (Spark 4 ANSI mode THROWS on the
        # bare division; caught by the brute-force pytest)
        .withColumn("jaccard", F.try_divide("ni", "_union"))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def near_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_n: int = 3,
    n_bands: int = 4,
    rows_per_band: int = 4,
    min_jaccard: float | None = None,
    hash_fn: str = "md5",
    keep_best_col: str | None = None,
) -> DataFrame:
    """Surviving corpus after MinHash-LSH near-dup removal: banded LSH
    candidate pairs → (optional) exact n-gram Jaccard gate → connected
    components → keep ONE doc per duplicate cluster, drop the rest
    with one anti-join.

    The kept member is the minimum id by default. keep_best_col names
    a numeric column (a quality score — text.quality,
    code_quality, lm_score...) and keeps the HIGHEST-scoring member
    instead (ties → min id, so still deterministic) — the production
    training-data shape: near-dup clusters usually mix a clean
    original with mangled copies, and min-id keeps an arbitrary one.
    Implemented as one extra broadcast-scale join of the (pair-set-
    sized) cluster mapping onto the scores + a per-cluster max_by —
    the corpus is still touched only by the final anti-join.

    min_jaccard=None accepts every LSH collision (cheap, slightly
    over-drops); set a threshold to re-score candidates exactly before
    clustering. CC runs on the PAIR set (orders of magnitude smaller
    than the corpus — canonicalize.connected_components tiers between
    driver union-find and large-star/small-star on size).
    hash_fn="xxhash64" is the production fast path (native bigint
    hashing; the md5 default exists for oracle reproducibility)."""
    from ..canonicalize import connected_components

    pairs = minhash_lsh_pairs(
        minhash_signatures(docs, text_col, id_col, n_hashes, shingle_n, hash_fn),
        n_bands,
        rows_per_band,
        hash_fn,
    ).localCheckpoint(eager=False)  # 3 consumers in the gate below; the
    # band self-join must not re-run per consumer (on a cluster this is
    # a persist(DISK) / checkpoint — same intent: cut the lineage)
    if min_jaccard is not None:
        pairs = ngram_jaccard_pairs(
            docs, pairs, text_col, id_col, shingle_n, min_jaccard
        ).select("a", "b")
    mapping = connected_components(pairs, "a", "b")
    if keep_best_col is not None:
        scored = mapping.join(
            docs.select(
                F.col(id_col).alias("node_id"), F.col(keep_best_col).alias("_s")
            ),
            "node_id",
        )
        winners = scored.groupBy("canonical_id").agg(
            # max score, ties -> min id: min_by on (-score, id) struct
            F.min_by(
                "node_id", F.struct((-F.col("_s")).alias("s"), F.col("node_id"))
            ).alias("_keep")
        )
        losers = (
            mapping.join(winners, "canonical_id")
            .where(F.col("node_id") != F.col("_keep"))
            .select(F.col("node_id").alias(id_col))
        )
    else:
        losers = mapping.where(
            F.col("node_id") != F.col("canonical_id")
        ).select(F.col("node_id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    max_block_df: int | None = None,
    on_overflow: str = "error",
    report_skipped: bool = False,
) -> DataFrame:
    """Token-sequence containment dedup: (inner_id, outer_id) pairs
    where inner's token sequence (lowercased, whitespace-normalized)
    appears as a CONTIGUOUS run of outer's tokens — catches
    quote-inclusion / wrapper-page duplication that Jaccard misses
    when lengths differ a lot. Token-boundary semantics (not raw char
    substring: 'a b' inside 'xa b' does NOT match) is what makes the
    blocking below complete.

    Blocking is prefix-filter style and COMPLETE: each candidate inner
    doc contributes only its globally RAREST shingle (min document
    frequency, gram as tiebreak); the join probes every (doc, shingle)
    row with it. If inner's tokens are a contiguous run of outer's,
    every shingle of inner is a shingle of outer — including the
    rarest — so no true pair is missed, and the output is exactly the
    token-containment relation over docs with >= shingle_n tokens.
    Candidate volume is sum over docs of df(rarest shingle) —
    near-unique shingles prune almost everything, but a TEMPLATE-HEAVY
    corpus (k docs whose every shingle is shared by ~k docs) has no
    rare shingle to block on: candidates degrade toward k² within the
    template's grams, and no complete content-based blocking can do
    better (the docs genuinely share all their keys). max_block_df is
    the guard rail: docs whose rarest shingle's df exceeds it either
    abort the job with routing guidance (on_overflow='error' — run
    curation.boilerplate_strip / exact_dedup first, which removes the
    shared grams) or are excluded as INNER candidates
    (on_overflow='skip' — pairs whose inner is an over-the-ceiling doc
    are then not emitted; all other pairs remain complete). Verify:
    exact JVM-side contains() over space-delimited normalized token
    strings (padded with boundary spaces), fetched by id-keyed joins.
    Ties (equal token sequence) emit only inner_id < outer_id; docs
    shorter than shingle_n tokens never block (screen those with
    exact_dedup first).

    report_skipped=True returns (pairs, skipped) where skipped is the
    DataFrame of inner-candidate doc_ids excluded by the
    on_overflow='skip' ceiling (empty when nothing was skipped, or
    when max_block_df is None) — so production runs can observe the
    incompleteness instead of silently losing pairs."""
    if on_overflow not in ("error", "skip"):
        raise ValueError("on_overflow must be 'error' or 'skip'")
    skipped = docs.select(F.col(id_col)).limit(0)
    sh = shingle_rows(docs, text_col, id_col, shingle_n).localCheckpoint(
        eager=False
    )  # consumed by the df agg, the argmin, and the probe side
    # shuffle_hash hints throughout: every side here is unbounded (sh =
    # corpus-scale shingle rows off a stats-less localCheckpoint, gdf =
    # the gram vocabulary, txt below = full normalized document text) —
    # Catalyst's no-stats fallback otherwise broadcasts one of them
    # (observed: 4 BroadcastHashJoins in this plan at sf0.001), which is
    # a driver OOM at scale.
    gdf = sh.groupBy("g").agg(F.count("*").alias("gdf"))  # sh distinct per doc
    rarest = (
        sh.join(gdf.hint("shuffle_hash"), "g")
        .groupBy("doc_id")
        .agg(F.min(F.struct("gdf", "g")).alias("_m"))  # lexicographic argmin
        .select("doc_id", F.col("_m.g").alias("g"), F.col("_m.gdf").alias("gdf"))
    )
    if max_block_df is not None:
        if on_overflow == "error":
            n_over = rarest.where(F.col("gdf") > max_block_df).count()
            if n_over:
                raise ValueError(
                    f"{n_over} docs have no blocking shingle with df <= "
                    f"{max_block_df} (template-heavy corpus): their candidate "
                    f"fanout would approach all-pairs within the shared grams. "
                    f"Strip the template first (curation.boilerplate_strip), "
                    f"screen identical docs (exact_dedup), or pass "
                    f"on_overflow='skip' to exclude them as inner candidates."
                )
        else:
            skipped = rarest.where(F.col("gdf") > max_block_df).select(
                F.col("doc_id").alias(id_col)
            )
            rarest = rarest.where(F.col("gdf") <= max_block_df)
    rarest = rarest.drop("gdf")
    cand = (
        rarest.alias("l")
        .join(
            sh.hint("shuffle_hash").alias("r"),
            (F.col("l.g") == F.col("r.g"))
            & (F.col("l.doc_id") != F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("inner_id"), F.col("r.doc_id").alias("outer_id"))
        .distinct()
    )
    # normalized token string with boundary pads: ' t1 t2 ... tn '
    norm = F.concat(
        F.lit(" "),
        F.concat_ws(
            " ",
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            ),
        ),
        F.lit(" "),
    )
    txt = docs.select(F.col(id_col).alias("_id"), norm.alias("_lt"))
    a = txt.select(F.col("_id").alias("inner_id"), F.col("_lt").alias("_ta"))
    b = txt.select(F.col("_id").alias("outer_id"), F.col("_lt").alias("_tb"))
    pairs = (
        cand.join(a.hint("shuffle_hash"), "inner_id")
        .join(b.hint("shuffle_hash"), "outer_id")
        .where(
            F.col("_tb").contains(F.col("_ta"))
            & (
                (F.col("_ta") != F.col("_tb"))
                | (F.col("inner_id") < F.col("outer_id"))
            )
        )
        .select("inner_id", "outer_id")
    )
    return (pairs, skipped) if report_skipped else pairs


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: per-token 64-bit hash from md5 hex
    (first 16 hex chars → bigint via conv), bit-majority aggregated.

    Implementation: explode tokens, per-bit ±1 contributions summed via
    groupBy — one shuffle on doc_id; the bit loop is 64 column
    expressions, all codegen'd.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    ).where(F.col("tok") != "")
    # unsigned 60-bit token hash — 15 hex chars < 2^60 fits SIGNED
    # int64, so the whole bit loop runs on bigint bitwise ops (codegen
    # integer path) instead of decimal division
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    toks = toks.withColumn("th", h)
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("th").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(60)
        ]
    )
    sim = None
    for i in range(60):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("bigint").alias("simhash"))


def simhash_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    fp_col: str = "simhash",
    id_col: str = "doc_id",
    n_bits: int = 60,
) -> DataFrame:
    """Near-dup pairs from simhash64 fingerprints: (a, b, hamming) for
    every pair with hamming distance ≤ max_hamming.

    Blocking is bit-block banding — the banded-LSH shape of
    minhash_band_pairs applied to bit positions: split the n_bits
    fingerprint into max_hamming+1 contiguous blocks; a pair differing
    in ≤ max_hamming bits cannot differ in every block (pigeonhole), so
    an exact match on ANY block is a complete candidate generator. One
    explode (n_blocks rows/doc), one self-join shuffled on
    (block, value), then an exact popcount verify:
    bit_count(a XOR b) ≤ max_hamming — all codegen'd bigint ops, no
    Python on data, never all-pairs.

    Candidate volume per (block, value) bucket is quadratic in bucket
    size; byte-identical docs share ALL blocks, so screen with
    exact_dedup first when the corpus has heavy exact duplication
    (their pairs are hamming-0 and already found by the cheaper hash).
    """
    n_blocks = max_hamming + 1
    width = n_bits // n_blocks
    widths = [width + (1 if i < n_bits % n_blocks else 0) for i in range(n_blocks)]
    starts = [sum(widths[:i]) for i in range(n_blocks)]
    fp = fingerprints.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    blocks = fp.select(
        "_id",
        "_fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("_fp", starts[i]).bitwiseAND(
                        F.lit((1 << widths[i]) - 1)
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("blk", "val"),
    ).localCheckpoint(eager=False)
    # ^ the self-join below consumes `blocks` on BOTH sides; without the
    # materialization the entire upstream fingerprint computation (for
    # simhash64 inputs: the token explode + 60-bit aggregation) executes
    # once per side — measured 2x the stage for zero benefit (r07).
    # shuffle_hash: blocks is corpus-scale (n_blocks rows/doc) — without
    # stats Catalyst broadcasts a side of the self-join (driver OOM at
    # scale); the (blk, val) shuffle IS the blocking scheme
    cand = (
        blocks.alias("l")
        .join(
            blocks.hint("shuffle_hash").alias("r"),
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("a"),
            F.col("r._id").alias("b"),
            F.col("l._fp").alias("fa"),
            F.col("r._fp").alias("fb"),
        )
        .distinct()  # a pair can match in several blocks
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def semantic_dedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    exact: bool = False,
    **lsh_kwargs,
) -> DataFrame:
    """SemDeDup-style surviving set (Abbas et al. 2023's shape, exact
    clustering instead of per-centroid sampling): items whose
    embeddings are cosine-similar ≥ threshold form duplicate clusters
    via connected components over the pair graph; each cluster keeps
    min(id), the rest drop with one anti-join — near_dedup's exact
    composition, driven by embedding similarity instead of MinHash.

    Pair generation is embedding_cosine_pairs: the default is the
    multi-table hyperplane-LSH bucketed join (never all-pairs); CC runs
    on the pair set only (tiered union-find / large-star small-star).
    exact=True is the all-pairs oracle twin for small slices."""
    from ..canonicalize import connected_components

    pairs = embedding_cosine_pairs(
        embeddings, id_col, vec_col, threshold, exact=exact, **lsh_kwargs
    )
    mapping = connected_components(pairs, "a", "b")
    losers = mapping.where(F.col("node_id") != F.col("canonical_id")).select(
        F.col("node_id").alias(id_col)
    )
    return embeddings.join(losers, id_col, "left_anti")


def embedding_cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    exact: bool = False,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    kernel: str = "auto",
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold.

    Default path: multi-table random-hyperplane LSH. Every vector gets
    n_tables independent bucket ids (sign pattern of n_planes random
    projections each, vectorize.hyperplane_signatures); candidate pairs
    are generated ONLY inside (table, bucket) groups — one self-join
    shuffled on (table, bucket), exactly the MinHash banding shape —
    then re-scored with exact cosine. Expected recall for a true pair
    at cosine c is 1 - (1 - (1 - arccos(c)/pi)^n_planes)^n_tables;
    the defaults give ~0.98 at c = 0.9 (recall-gated in
    tests/test_operators.py). No stage is O(n^2): candidate volume is
    sum over buckets of C(|bucket|, 2), and n_planes dials bucket
    granularity up with corpus size.

    exact=True is the all-pairs theta join — a nested-loop cartesian at
    scale, kept as the small-input / DuckDB-oracle twin only.

    kernel: how candidate pairs are scored — "hof" (JVM fold, right at
    dim≈64), "arrow" (one numpy einsum per Arrow batch — at the
    reference's production width dim=1024 the fold is ~20x slower,
    bench/vector1024.py), or "auto" (default: peek the width, arrow at
    dim ≥ vectorize.AUTO_KERNEL_DIM). Kernels are row-identical
    including the degenerate zero-norm case: cosine is undefined
    there, and both kernels drop the pair (hof via the NULL-guarded
    division — Spark 4's default ANSI mode would otherwise THROW
    DIVIDE_BY_ZERO on one bad row — arrow via an isfinite mask).
    """
    a = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    if exact:
        cand = a.join(b, F.col("a") < F.col("b"))
    else:
        from ..vectorize import hyperplane_signatures

        first = embeddings.select(vec_col).first()
        if first is None:  # empty input: the theta join is free and
            return embedding_cosine_pairs(  # keeps the output schema
                embeddings, id_col, vec_col, threshold, exact=True
            )
        dim = len(first[0])
        # all tables' buckets in one pass over the vectors, then one
        # posexplode → one self-join keyed (table, bucket)
        with_b = embeddings
        for t in range(n_tables):
            with_b = hyperplane_signatures(
                with_b, n_planes=n_planes, seed=seed + 1000 * t, dim=dim,
                vec_col=vec_col, out_col=f"_bkt_{t}",
            )
        buckets = with_b.select(
            F.col(id_col).alias("doc"),
            F.posexplode(
                F.array(*[F.col(f"_bkt_{t}") for t in range(n_tables)])
            ).alias("tbl", "bucket"),
        ).localCheckpoint(eager=False)  # consumed by both join sides
        # shuffle_hash: buckets and the vector fetches are corpus-scale
        # sides off stats-less checkpoints/scans — Catalyst's no-stats
        # guess otherwise broadcasts them (the vector table doubly so:
        # wide embedding rows in a driver hash relation)
        pair_ids = (
            buckets.alias("l")
            .join(
                buckets.hint("shuffle_hash").alias("r"),
                (F.col("l.tbl") == F.col("r.tbl"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.doc") < F.col("r.doc")),
            )
            .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
            .distinct()
        )
        cand = pair_ids.join(a.hint("shuffle_hash"), "a").join(
            b.hint("shuffle_hash"), "b"
        )

    if kernel == "auto":
        from ..vectorize import AUTO_KERNEL_DIM

        first = embeddings.select(vec_col).first()
        dim = len(first[0]) if first and first[0] is not None else 0
        kernel = "arrow" if dim >= AUTO_KERNEL_DIM else "hof"

    if kernel == "arrow":
        import numpy as np
        import pandas as pd

        a_t = cand.schema["a"].dataType.simpleString()
        b_t = cand.schema["b"].dataType.simpleString()
        out_schema = f"a {a_t}, b {b_t}, cos double"

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                va = np.asarray(pdf["va"].tolist(), dtype=np.float64)
                vb = np.asarray(pdf["vb"].tolist(), dtype=np.float64)
                dots = np.einsum("ij,ij->i", va, vb)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / (
                        np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
                    )
                # zero-norm side → NaN here, NULL on the hof path
                # (guarded division) — dropped by both
                m = np.isfinite(cos) & (cos >= threshold)
                if m.any():
                    yield pd.DataFrame(
                        {"a": pdf["a"][m], "b": pdf["b"][m], "cos": cos[m]}
                    )

        return cand.select("a", "b", "va", "vb").mapInPandas(score, out_schema)

    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        # when-guard: zero-norm → NULL (cosine undefined; ANSI mode
        # would throw on the bare division), dropped by the filter
        cand.withColumn("cos", F.when(na * nb > 0, dot / (na * nb)))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def duplicate_spans(
    docs: DataFrame,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
    keep: str = "none",
) -> DataFrame:
    """Exact duplicated-substring spans (the distributed analogue of
    Lee et al. 2022's suffix-array substring dedup, arXiv:2107.06499):
    for every token position, fingerprint the ``min_len``-token window
    (md5 over the shared shingle tokenization — split(lower(trim)),
    same as shingle_rows); a window is DUPLICATED if its fingerprint
    occurs more than once in the corpus (cross-doc or self-repeat,
    as in the paper); per doc, runs of consecutive duplicated
    positions merge to maximal spans.

    Returns (doc_id, span_start, span_end, n_windows): 0-based token
    offsets, inclusive; every min_len-window inside the span occurs
    elsewhere, so the span is removable text. Callers cut spans or
    drop docs whose spans cover most of the text.

    keep="none" (default) marks EVERY occurrence of a duplicated
    window — cutting them removes the content entirely. keep="first"
    is the paper's keep-one rule: the canonical occurrence (min
    (doc_id, pos) per fingerprint, a packed-bigint min so the argmin
    is one map-side-combining aggregate, never a sort-over-window)
    is NOT marked, so strip_spans removes all-but-one copy and
    re-running duplicate_spans on the result finds nothing
    (pytest-pinned fixed point).

    Scale shape: every-position fingerprinting is token-scale by
    definition — but what shuffles is (16-byte hash, id, pos) rows,
    never text. Duplicate detection is groupBy(h) with map-side
    partial counts rather than a count-over-window, so a boilerplate
    fingerprint occurring 10M times folds to one row per map task
    before the exchange (a window would sort all 10M copies on one
    reducer — the hot-key trap). The join-back of the filtered
    fingerprint set is unbounded on both sides → shuffle_hash, never
    a driver broadcast. Island merging is one doc-keyed window over
    duplicated positions only."""
    from pyspark.sql import Window

    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    if keep not in ("none", "first"):
        raise ValueError('keep must be "none" or "first"')
    L = int(min_len)

    # shuffle-free every-position windows (r07, the shingle_rows trick):
    # L aligned slices of the token array zipped and POSexploded — the
    # zip index IS the 0-based window position, so no posexplode+lead-
    # over-window pass (which shuffled and sorted every token row by
    # doc_id before a single fingerprint existed)
    tokarr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    length = F.greatest(F.size(tokarr) - F.lit(L - 1), F.lit(0))
    wins = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.arrays_zip(*[F.slice(tokarr, j + 1, length) for j in range(L)])
        ).alias("pos", "_t"),
    ).select(
        "doc_id",
        "pos",
        F.md5(F.concat_ws(" ", *[F.col("_t")[str(j)] for j in range(L)])).alias(
            "h"
        ),
    )
    # wins feeds the duplicate aggregation AND the probe join; without
    # materialization the tokenize+window chain executes once per
    # consumer (no ReusedExchange fires: the Window subtree appears
    # twice in the plan). materialize=True checkpoints the compact
    # (doc_id, pos, 16-byte h) rows once. Fresh-JVM alternating A/B at
    # sf0.1 (3 reps): mat best 2.10s vs nomat 2.13s — within noise at
    # toy scale, so the default keeps the checkpoint: the recompute tax
    # is a full second corpus pass at 100 TB, the checkpoint cost is a
    # compact local spill that shrinks relative to it.
    if materialize:
        wins = wins.localCheckpoint(eager=True)
    # lexicographic struct-min (the containment_pairs argmin pattern)
    # lets the canonical first occurrence fall out of the SAME partial-
    # aggregating groupBy that counts duplicates. NOT arithmetic
    # packing (doc_id * 2^31 + pos): that silently assumed numeric
    # doc_id < 2^32 — string ids failed under ANSI mode and 64-bit ids
    # overflowed to a wrong keep-first pick (ADVICE r06). Ordering is
    # identical for in-range numeric ids, so results are unchanged.
    dup = (
        wins.groupBy("h")
        .agg(
            F.count("*").alias("n"),
            F.min(F.struct("doc_id", "pos")).alias("_first"),
        )
        .where(F.col("n") > 1)
    )
    hits = wins.join(dup.hint("shuffle_hash"), "h")
    if keep == "first":
        hits = hits.where(
            ~(
                (F.col("doc_id") == F.col("_first.doc_id"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
    dp = hits.select("doc_id", "pos")
    w2 = Window.partitionBy("doc_id").orderBy("pos")
    isl = dp.withColumn("grp", F.col("pos") - F.row_number().over(w2))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .drop("grp")
    )


def strip_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut token spans out of documents — the removal half of
    substring dedup (duplicate_spans finds removable spans; the caller
    picks the keep-policy, e.g. keep the span in the smallest doc_id
    holding the content, and passes the rest here).

    spans: (doc_id, span_start, span_end) inclusive 0-based token
    offsets under the shared tokenization. Text is rebuilt from the
    surviving tokens joined by single spaces (tokenization is the
    unit of every operator in this family, so intra-doc whitespace is
    normalized — documented contract, asserted in the oracle twin).

    Scale shape: tokens join spans per doc_id (co-keyed shuffle_hash —
    both sides unbounded, never a driver broadcast); the surviving
    (pos, tok) rows fold back per doc with an in-agg sort bounded by
    the doc length. Returns (doc_id, n_tokens, n_removed, text).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    sp = spans.select(
        F.col(id_col).alias("doc_id"),
        F.col("span_start").alias("_s"),
        F.col("span_end").alias("_e"),
    )
    hit = (
        toks.join(sp.hint("shuffle_hash"), "doc_id")
        .where(F.col("pos").between(F.col("_s"), F.col("_e")))
        .select("doc_id", "pos")
        .distinct()  # overlapping spans may cover a position twice
    )
    kept = toks.join(hit.hint("shuffle_hash"), ["doc_id", "pos"], "left_anti")
    n_tok = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    out = (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
            ).alias("text"),
        )
    )
    return (
        n_tok.join(out, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce("text", F.lit("")).alias("text"),
        )
    )
