"""ResilientEmbedFn — retry / rate-limit / poison-bisection semantics.

The wrapper is pure Python, so everything except the final Spark
integration test runs driver-side with an injected fake clock (no
sleeps, fully deterministic).
"""

from __future__ import annotations

import pytest

from datacapsule_spark.embed_client import (
    EmbedPoisonError,
    ResilientEmbedFn,
    hash_embed_fallback,
)

DIM = 4


def vec_for(text):
    return [float(len(text)), 1.0, 2.0, 3.0]


def good_kernel(texts):
    return [vec_for(t) for t in texts]


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def sleep(self, d):
        self.sleeps.append(round(d, 6))
        self.t += d

    def monotonic(self):
        self.t += 0.001  # reading the clock takes time too
        return self.t


def make(fn, **kw):
    clock = FakeClock()
    emb = ResilientEmbedFn(fn, sleep=clock.sleep, monotonic=clock.monotonic, **kw)
    return emb, clock


class TestRetry:
    def test_transient_failures_retried_with_backoff(self):
        state = {"fails": 2}

        def flaky(texts):
            if state["fails"] > 0:
                state["fails"] -= 1
                raise ConnectionError("503")
            return good_kernel(texts)

        emb, clock = make(flaky, backoff_s=0.5)
        out = emb(["ab", "cdef"])
        assert out == [vec_for("ab"), vec_for("cdef")]
        # two retries: exponential backoff 0.5 then 1.0
        assert clock.sleeps == [0.5, 1.0]
        assert emb.retries == 2 and emb.calls == 3

    def test_backoff_capped(self):
        state = {"fails": 5}

        def flaky(texts):
            if state["fails"] > 0:
                state["fails"] -= 1
                raise ConnectionError("503")
            return good_kernel(texts)

        emb, clock = make(flaky, max_retries=5, backoff_s=1.0, backoff_cap_s=3.0)
        emb(["x"])
        assert clock.sleeps == [1.0, 2.0, 3.0, 3.0, 3.0]

    def test_partial_response_is_retryable(self):
        state = {"bad": 1}

        def truncating(texts):
            if state["bad"]:
                state["bad"] = 0
                return [vec_for(texts[0])]  # dropped the rest
            return good_kernel(texts)

        emb, _ = make(truncating)
        assert emb(["a", "b", "c"]) == [vec_for(t) for t in ["a", "b", "c"]]
        assert emb.retries == 1

    def test_partial_response_transient_even_with_narrow_retry_on(self):
        """A wrong-length response retries/bisects even when retry_on
        excludes RuntimeError — transient by contract."""
        state = {"bad": 1}

        def truncating(texts):
            if state["bad"]:
                state["bad"] = 0
                return [vec_for(texts[0])]
            return good_kernel(texts)

        emb, _ = make(truncating, retry_on=(ConnectionError,))
        assert emb(["a", "b"]) == [vec_for("a"), vec_for("b")]
        assert emb.retries == 1

    def test_poison_error_pickles(self):
        import pickle

        from datacapsule_spark.embed_client import EmbedPoisonError

        err = EmbedPoisonError("bad row", ValueError("boom"))
        back = pickle.loads(pickle.dumps(err))
        assert isinstance(back, EmbedPoisonError)
        assert back.text == "bad row" and "bad row" in str(back)

    def test_non_retryable_exception_propagates(self):
        def boom(texts):
            raise KeyboardInterrupt()

        emb, _ = make(boom, retry_on=(ConnectionError,))
        with pytest.raises(KeyboardInterrupt):
            emb(["x", "y"])
        assert emb.retries == 0


class TestRateLimit:
    def test_min_interval_enforced(self):
        emb, clock = make(good_kernel, max_calls_per_s=2.0)  # 0.5s interval
        for _ in range(3):
            emb(["x"])
        # first call free, the next two each wait out the remainder of
        # the 0.5s interval (minus the tiny fake clock-read increments)
        assert len(clock.sleeps) == 2
        assert all(0.4 < s <= 0.5 for s in clock.sleeps)

    def test_no_limit_means_no_sleeps(self):
        emb, clock = make(good_kernel)
        for _ in range(3):
            emb(["x"])
        assert clock.sleeps == []


class TestPoisonBisection:
    @staticmethod
    def poison_kernel(texts):
        if any("POISON" in t for t in texts):
            raise ConnectionError("400 on poisoned row")
        return good_kernel(texts)

    def test_poison_row_isolated_with_fallback(self):
        emb, _ = make(
            self.poison_kernel,
            max_retries=1,
            row_fallback=lambda t: [9.0, 9.0, 9.0, 9.0],
        )
        texts = ["a", "bb", "POISON!", "dddd", "eeeee"]
        out = emb(texts)
        assert len(out) == 5
        assert out[2] == [9.0, 9.0, 9.0, 9.0]
        for i in (0, 1, 3, 4):  # the good rows used the real API
            assert out[i] == vec_for(texts[i])
        assert emb.fallback_rows == 1

    def test_poison_row_without_fallback_raises_named(self):
        emb, _ = make(self.poison_kernel, max_retries=0)
        with pytest.raises(EmbedPoisonError, match="POISON"):
            emb(["ok", "POISON!", "fine"])

    def test_hash_fallback_is_deterministic(self):
        emb, _ = make(
            self.poison_kernel, max_retries=0, row_fallback=hash_embed_fallback
        )
        out1 = emb(["POISON-a", "ok"])
        out2 = emb(["POISON-a", "ok"])
        assert out1[0] == out2[0]
        from datacapsule_spark.vectorize import EMBED_DIM

        assert len(out1[0]) == EMBED_DIM

    def test_empty_batch(self):
        emb, _ = make(good_kernel)
        assert emb([]) == []
        assert emb.calls == 0


class TestOutageGuard:
    """A sustained outage (every batch failing) must NOT silently
    replace the corpus with fallback vectors — max_fallback_frac caps
    the per-batch fallback fraction (ADVICE r05: embed_client.py)."""

    @staticmethod
    def outage_kernel(texts):
        raise ConnectionError("api down")

    def test_full_outage_raises_instead_of_mass_fallback(self):
        from datacapsule_spark.embed_client import EmbedOutageError

        emb, _ = make(
            self.outage_kernel,
            max_retries=0,
            row_fallback=lambda t: [9.0] * 4,
        )
        with pytest.raises(EmbedOutageError, match="outage suspected"):
            emb(["a", "b", "c", "d"])

    def test_isolated_poison_under_threshold_still_falls_back(self):
        emb, _ = make(
            TestPoisonBisection.poison_kernel,
            max_retries=0,
            row_fallback=lambda t: [9.0] * 4,
        )
        out = emb(["a", "POISON!", "c", "d", "e"])  # 1/5 = 0.2 <= 0.5
        assert out[1] == [9.0] * 4 and emb.fallback_rows == 1

    def test_single_row_batch_exempt(self):
        emb, _ = make(
            self.outage_kernel, max_retries=0, row_fallback=lambda t: [9.0] * 4
        )
        assert emb(["solo"]) == [[9.0] * 4]  # 1-row batch IS a poison row

    def test_guard_disabled_with_none(self):
        emb, _ = make(
            self.outage_kernel,
            max_retries=0,
            row_fallback=lambda t: [9.0] * 4,
            max_fallback_frac=None,
        )
        assert emb(["a", "b", "c"]) == [[9.0] * 4] * 3
        assert emb.fallback_rows == 3

    def test_outage_error_pickles(self):
        import pickle

        from datacapsule_spark.embed_client import EmbedOutageError

        err = EmbedOutageError(7, 8, 0.5)
        back = pickle.loads(pickle.dumps(err))
        assert isinstance(back, EmbedOutageError)
        assert back.n_fallback == 7 and back.n_batch == 8
        assert "7/8" in str(back)


class TestSparkIntegration:
    def test_resilient_fn_through_embed_descriptors(self, spark):
        """The wrapper drops into the embed_fn seam unchanged and
        survives a transient failure on the executor."""
        from datacapsule_spark.vectorize import (
            EMBED_DIM,
            embed_descriptors,
            node_descriptors,
        )

        # nested so cloudpickle ships it by VALUE (the test module is
        # not importable on executors); the mutable default is the
        # per-task failure state — each deserialized task copy fails
        # its first call, then succeeds on the in-task retry
        def flaky_then_good(texts, _state={"fails": 1}):
            if _state["fails"] > 0:
                _state["fails"] -= 1
                raise ConnectionError("transient 503")
            return [[float(len(t))] + [0.5] * (EMBED_DIM - 1) for t in texts]

        emb = ResilientEmbedFn(flaky_then_good, backoff_s=0.01)
        nodes = spark.createDataFrame(
            [("sym:A", "symbol", "A", {}), ("sym:B", "symbol", "B", {})],
            "node_id string, node_type string, name string, attrs map<string,string>",
        )
        out = embed_descriptors(node_descriptors(nodes), embed_fn=emb).collect()
        got = {r["id"]: r["embedding"] for r in out}
        assert set(got) == {"sym:A", "sym:B"}
        for vec in got.values():
            assert len(vec) == EMBED_DIM and vec[1] == pytest.approx(0.5)
