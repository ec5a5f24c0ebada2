"""Distributed BPE training/apply vs a pure-Python Sennrich reference."""

from __future__ import annotations

import collections

import pytest


def ref_bpe_train(texts, n_merges, min_pair_freq=2):
    """Reference Sennrich et al. BPE on word counts; ties on pair
    frequency break lexicographically (the operator's pin)."""
    wc = collections.Counter()
    for t in texts:
        wc.update(t.strip().lower().split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (x, y) = best[0]
        merges.append((x, y))
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def ref_encode(word, merges):
    syms = list(word) + ["</w>"]
    for x, y in merges:  # replay training order
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


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest low new",
    "the the the the newer lower",
]


class TestBPE:
    def test_train_matches_reference(self, spark):
        from datacapsule_spark.operators.tokenizer import bpe_train

        docs = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(CORPUS)],
            "doc_id string, text string",
        )
        for n in (1, 5, 12):
            got = bpe_train(docs, n_merges=n)
            want = ref_bpe_train(CORPUS, n_merges=n)
            assert got == want, n

    def test_apply_matches_training_order_replay(self, spark):
        """rank-greedy encoding (bpe_apply) == replaying the merges in
        training order word by word, and the tokenization round-trips
        back to the original words."""
        from datacapsule_spark.operators.tokenizer import bpe_apply, bpe_train

        docs = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(CORPUS)],
            "doc_id string, text string",
        )
        merges = bpe_train(docs, n_merges=8)
        assert len(merges) == 8
        out = {r["doc_id"]: r for r in bpe_apply(docs, merges).collect()}
        for i, t in enumerate(CORPUS):
            want = []
            for w in t.strip().lower().split():
                want.extend(ref_encode(w, merges))
            row = out[str(i)]
            assert row["subwords"] == want
            assert row["n_subwords"] == len(want)
            # round-trip: strip the merge structure -> original words
            rebuilt = "".join(row["subwords"]).replace("</w>", " ").split()
            assert rebuilt == t.strip().lower().split()

    def test_min_pair_freq_stops_training(self, spark):
        from datacapsule_spark.operators.tokenizer import bpe_train

        docs = spark.createDataFrame(
            [("1", "ab cd ef")], "doc_id string, text string"
        )
        # every pair occurs once -> below min_pair_freq=2, no merges
        assert bpe_train(docs, n_merges=5) == []

    def test_empty_and_whitespace_docs(self, spark):
        from datacapsule_spark.operators.tokenizer import bpe_apply

        docs = spark.createDataFrame(
            [("1", ""), ("2", "   "), ("3", "ok")],
            "doc_id string, text string",
        )
        out = {r["doc_id"]: r for r in bpe_apply(docs, [("o", "k")]).collect()}
        assert out["1"]["subwords"] == [] and out["1"]["n_subwords"] == 0
        assert out["2"]["subwords"] == []
        assert out["3"]["subwords"] == ["ok", "</w>"]
