"""Distributed entity linking: MinHash-LSH blocking + cosine scoring.

Upgrades the reference's exact-string node identity (NetworkX add_node
on the same surface string, tools/entity_extraction.py:93-133 — J5 in
SURVEY.md) to real alias resolution: symbol names that differ only by
case convention (HttpClient / http_client) or small edits are linked.

Two-tier design, both fully distributed:

1. **Normalization tier** (exact, cheap): `norm = lower + strip
   non-alnum`. Names sharing a normal form are aliases by construction.
   This is a groupBy, no pairwise work — it alone resolves the planted
   CamelCase/snake_case variants.
2. **LSH tier** (approximate, for near-miss aliases): character-3-gram
   shingles → HashingTF → MinHashLSH.approxSimilarityJoin (Jaccard
   distance ≤ threshold) → exact token-set Jaccard re-score via
   DataFrame functions. Candidate generation is band-bucketed (the LSH
   OR-amplification), so cost is ~O(candidates), never O(n²).

At 10^12-file scale the distinct-symbol dictionary is << corpus size
(vocabulary saturates), so the LSH join runs on the deduped name table,
not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_name(col):
    """lower + strip non-alphanumeric: HttpClient → httpclient."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def exact_norm_alias_pairs(names: DataFrame, name_col: str = "name") -> DataFrame:
    """names(name) → alias_pairs(a, b, score=1.0) via shared normal form.

    Emits a star per normal-form group (every member → group min), not
    the quadratic pairs — CC closes the component anyway.
    """
    n = names.select(F.col(name_col).alias("name")).distinct()
    grouped = (
        n.withColumn("norm", normalize_name(F.col("name")))
        .where(F.length("norm") > 0)
        .groupBy("norm")
        .agg(F.min("name").alias("a"), F.collect_set("name").alias("members"))
    )
    return (
        grouped.select("a", F.explode("members").alias("b"))
        .where(F.col("a") != F.col("b"))
        .withColumn("score", F.lit(1.0))
    )


def lsh_alias_pairs(
    names: DataFrame,
    name_col: str = "name",
    jaccard_max_distance: float = 0.4,
    num_hash_tables: int = 5,
    min_rescore: float = 0.7,
    score_fn: str = "jaccard",
) -> DataFrame:
    """Near-duplicate alias candidates via MinHash-LSH over 3-gram
    shingles of the normalized name, re-scored exactly.

    score_fn="jaccard" (default): exact 3-gram set Jaccard.
    score_fn="tfidf_cosine": TF-IDF-weighted cosine over the gram sets
    — each gram weighs by its smoothed idf from the NAME DICTIONARY
    (rare grams dominate, so two long names sharing only ubiquitous
    affixes like 'get'/'handler' score low where raw Jaccard would
    over-link). Binary tf over distinct grams, so
        cos(A, B) = Σ_{g∈A∩B} idf(g)² / (‖A‖ ‖B‖),
        ‖X‖ = sqrt(Σ_{g∈X} idf(g)²).
    Computed on CANDIDATES only: the pair set explodes its
    intersection grams against the (dictionary-sized, broadcastable)
    idf table; per-name norms come from one explode+join+groupBy over
    the name dictionary — never the corpus.

    Returns alias_pairs(a, b, score) with score ≥ min_rescore. Pairs
    are emitted once (a < b).
    """
    if score_fn not in ("jaccard", "tfidf_cosine"):
        raise ValueError("score_fn must be 'jaccard' or 'tfidf_cosine'")
    from pyspark.ml.feature import HashingTF, MinHashLSH

    n = (
        names.select(F.col(name_col).alias("name"))
        .distinct()
        .withColumn("norm", normalize_name(F.col("name")))
        .where(F.length("norm") >= 3)
    )
    # char-3-gram shingles as array<string>; CHECKPOINTED because the
    # MinHashLSH machinery evaluates this plan many times (fit pass +
    # both approxSimilarityJoin sides, each of which explodes hashes) —
    # when `names` arrives as a lazy view over a corpus-sized boundary
    # (the pipeline's 20_link shape), every re-execution re-runs the
    # corpus scan + distinct: measured 151s -> 6s at 1.5M files / 204
    # names (bench/skew_evidence.py run). The name dictionary is
    # vocabulary-sized by design, so materializing it is always cheap.
    grams = (
        n.withColumn(
            "grams",
            F.expr(
                "transform(sequence(1, length(norm) - 2), i -> substring(norm, i, 3))"
            ),
        )
        .withColumn("grams", F.array_distinct("grams"))
        .localCheckpoint(eager=True)
    )

    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=1 << 18)
    feat = tf.transform(grams)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = mh.fit(feat)
    pairs = (
        model.approxSimilarityJoin(feat, feat, jaccard_max_distance, distCol="dist")
        .where(F.col("datasetA.name") < F.col("datasetB.name"))
        .select(
            F.col("datasetA.name").alias("a"),
            F.col("datasetB.name").alias("b"),
            F.col("datasetA.grams").alias("ga"),
            F.col("datasetB.grams").alias("gb"),
        )
    )
    if score_fn == "jaccard":
        # exact Jaccard re-score, JVM-side (no UDF)
        rescored = pairs.withColumn(
            "score",
            F.size(F.array_intersect("ga", "gb"))
            / F.size(F.array_union("ga", "gb")),
        ).drop("ga", "gb")
        return rescored.where(F.col("score") >= min_rescore)

    # TF-IDF cosine: idf from the name dictionary's gram dfs (grams is
    # already checkpointed above; idf feeds norms and dots)
    n_names = grams.count()
    idf = (
        grams.select(F.explode("grams").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("df"))  # grams distinct per name
        .withColumn(
            "idf", F.log((F.lit(float(n_names)) + 1) / (F.col("df") + 1)) + 1
        )
        .select("g", "idf")
        .localCheckpoint(eager=False)
    )
    norms = (
        grams.select(F.col("name"), F.explode("grams").alias("g"))
        .join(F.broadcast(idf), "g")
        .groupBy("name")
        .agg(F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("nrm"))
    )
    # LEFT join + coalesce keeps zero-intersection candidates at
    # score 0 — same pair set as the jaccard branch for any
    # min_rescore (an empty intersection must not silently drop the
    # pair before the score filter)
    dots = (
        pairs.select(
            "a", "b", F.explode(F.array_intersect("ga", "gb")).alias("g")
        )
        .join(F.broadcast(idf), "g")
        .groupBy("a", "b")
        .agg(F.sum(F.col("idf") * F.col("idf")).alias("dot"))
    )
    base = pairs.select("a", "b")
    na = norms.select(F.col("name").alias("a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("name").alias("b"), F.col("nrm").alias("nb"))
    rescored = (
        base.join(dots, ["a", "b"], "left")
        .join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (
                F.coalesce("dot", F.lit(0.0)) / (F.col("na") * F.col("nb"))
            ).alias("score"),
        )
    )
    return rescored.where(F.col("score") >= min_rescore)


def alias_pairs(
    names: DataFrame,
    name_col: str = "name",
    use_lsh: bool = True,
    score_fn: str = "jaccard",
) -> DataFrame:
    """Union of the exact-normal-form tier and (optionally) the LSH
    tier; score_fn selects the LSH tier's exact re-score (see
    lsh_alias_pairs). The deduped name dictionary is materialized ONCE
    here when both tiers run — `names` is typically a lazy view over a
    corpus-sized boundary, and each tier would otherwise re-run that
    scan + distinct."""
    n = names.select(F.col(name_col).alias("name")).distinct()
    if use_lsh:
        n = n.localCheckpoint(eager=True)
    exact = exact_norm_alias_pairs(n)
    if not use_lsh:
        return exact
    return exact.unionByName(
        lsh_alias_pairs(n, score_fn=score_fn)
    ).dropDuplicates(["a", "b"])
