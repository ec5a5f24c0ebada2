"""Distributed BPE tokenizer induction + subword tokenization.

A training-data engine that packs sequences (curation.pack_sequences)
and counts tokens needs the tokenizer itself to come from somewhere.
This module trains a byte-pair-encoding vocabulary (Sennrich et al.
2016, arXiv:1508.07909) the Spark-first way and applies it back to the
corpus:

- **word_counts** is the only corpus-sized job: one shuffle folds the
  100 TB corpus to its word-frequency table (O(vocabulary) rows —
  this is why classic BPE trains on word counts, and the shape that
  makes tokenizer training tractable at web scale).
- **bpe_train** loops n_merges rounds over the DISTRIBUTED word table:
  each round one weighted adjacent-pair aggregation (posexplode +
  window lead, the shingle_rows pattern) picks the global top pair —
  count desc, pair lexicographic asc, so training is deterministic —
  and one Arrow-batched mapInPandas applies the merge to every word's
  symbol array (the merge is an inherently sequential per-word scan:
  exactly the "genuinely can't express with built-ins" case for the
  pandas escape hatch; the table it runs over is vocabulary-sized).
  A web-corpus vocabulary (10^8 types) stays comfortably distributed;
  per round the driver receives ONE row (the winning pair).
- **bpe_apply** tokenizes the full corpus with the trained merge list:
  merges broadcast in the task closure, per-batch word→subwords memo
  (Zipf makes the memo hit rate ~99%), Arrow-batched, zero shuffles —
  the actual 100 TB pass.

End-of-word is marked with the standard '</w>' symbol so merges never
cross word boundaries and the tokenization is reversible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-sized
    shuffle in tokenizer training."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(
            F.explode(F.filter(F.split(t, r"\s+"), lambda x: x != "")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _adjacent_pair_counts(symtab: DataFrame) -> DataFrame:
    """Weighted adjacent symbol pairs over (syms array, freq) rows.

    posexplode + window lead (shingle_rows' codegen-friendly shape —
    per-element array HOFs drop out of whole-stage codegen) keyed on
    the word row, then one global aggregation on the pair."""
    w = Window.partitionBy("_wid").orderBy("pos")
    ex = (
        # _wid must bind BEFORE the generator: inside the same select a
        # per-row expression evaluates per exploded element
        symtab.withColumn("_wid", F.monotonically_increasing_id())
        .select("_wid", "freq", F.posexplode("syms").alias("pos", "s"))
        .select("_wid", "freq", "s", F.lead("s", 1).over(w).alias("s2"))
    )
    return (
        ex.where(F.col("s2").isNotNull())
        .groupBy("s", "s2")
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _merge_batch(x: str, y: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xy = x + y

        def merge(syms):
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == x and syms[i + 1] == y:
                    out.append(xy)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [merge(list(s)) for s in pdf["syms"]]
            yield pdf

    return gen


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_freq: int = 2,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus. Deterministic:
    ties on pair frequency break lexicographically on the pair."""
    words = word_counts(docs, text_col, lowercase=lowercase)
    symtab = words.select(
        F.concat(F.split("word", ""), F.array(F.lit(EOW))).alias("syms"),
        "freq",
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _adjacent_pair_counts(symtab)
            .orderBy(F.desc("pair_freq"), F.asc("s"), F.asc("s2"))
            .take(1)
        )
        if not top or top[0]["pair_freq"] < min_pair_freq:
            break
        x, y = top[0]["s"], top[0]["s2"]
        merges.append((x, y))
        symtab = symtab.mapInPandas(
            _merge_batch(x, y), schema="syms array<string>, freq long"
        ).localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # apply the best-ranked merge everywhere it occurs, left to
        # right — equivalent to replaying the training merge order
        x, y = syms[best], syms[best + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize the corpus with a trained merge list → (doc_id,
    subwords array<string>, n_subwords). Zero shuffles: the merge
    table rides the task closure, a per-batch word memo collapses
    repeated words (Zipf), and each Arrow batch maps independently."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(text):
            t = text.strip()
            if lowercase:
                t = t.lower()
            out = []
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            toks = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "subwords": toks,
                    "n_subwords": [len(t) for t in toks],
                }
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.mapInPandas(
        gen,
        schema=f"doc_id {id_type}, subwords array<string>, n_subwords long",
    )
