"""Resilient remote-embedding client wrapper (the production seam).

``embed_descriptors(..., embed_fn=...)`` (vectorize.py:92) takes any
batched ``list[str] -> list[vec]`` kernel — the reference calls its
embedding API one batch at a time with no failure handling
(react_tools.py:72-78, a single ``requests.post`` per batch).  On a
1000-executor cluster that call is the flakiest thing in the job:
transient 5xx/timeouts, provider rate limits, and the occasional
"poison" input the API permanently refuses.  A naive kernel turns any
of those into a failed task → 4 task retries → stage failure that
throws away hours of upstream work.

``ResilientEmbedFn`` wraps a raw client with the three semantics a
real deployment needs, while staying a plain picklable callable so it
drops into the existing ``embed_fn`` seam unchanged:

- **bounded exponential-backoff retry** on transient errors
  (``retry_on`` exception tuple — narrow it to your client's
  transient error types; a wrong-length response is also treated as
  transient, since partial results from a flaky gateway are a real
  failure mode);
- **per-process rate limiting** (``max_calls_per_s``) — a token
  interval enforced *on the executor*, so E executors generate at most
  ``E * max_calls_per_s`` requests/sec cluster-wide and you can size
  the limit from your provider quota;
- **bisection isolation of poison rows**: when a whole batch keeps
  failing after retries, split it and retry the halves, recursing down
  to single rows.  A lone bad row costs O(log batch) extra calls
  instead of failing the task; the surviving rows are embedded by the
  real API.  The isolated row either goes through ``row_fallback``
  (e.g. the deterministic hash embedding, keeping the pipeline moving
  and the row *flagged* by its fallback vector) or raises
  ``EmbedPoisonError`` naming the row, if you prefer the job to stop.
  A sustained outage looks like *every* row being poison — so when
  more than ``max_fallback_frac`` of a multi-row batch falls back,
  the call raises ``EmbedOutageError`` instead of silently shipping a
  corpus of degenerate fallback embeddings (set it to None to accept
  any fallback rate).

Clock injection (``sleep`` / ``monotonic``) keeps the unit tests
deterministic; defaults are the real ``time`` functions.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence


class TransientEmbedError(RuntimeError):
    """Raised internally for failures that are transient BY CONTRACT
    regardless of the user's ``retry_on`` tuple — e.g. a wrong-length
    (partial) response.  Always retried/bisected."""


class EmbedOutageError(RuntimeError):
    """More than ``max_fallback_frac`` of a batch fell back to
    ``row_fallback`` — that is an API outage, not isolated poison
    rows, and silently shipping a corpus of degenerate fallback
    embeddings would be worse than failing the task."""

    def __init__(self, n_fallback: int, n_batch: int, frac_limit: float):
        super().__init__(
            f"embedding API outage suspected: {n_fallback}/{n_batch} rows of "
            f"one batch fell back to row_fallback (limit "
            f"max_fallback_frac={frac_limit}). Failing instead of shipping "
            "degenerate embeddings; retry when the API recovers, or raise "
            "max_fallback_frac if this corpus genuinely has that many "
            "poison rows."
        )
        self.n_fallback = n_fallback
        self.n_batch = n_batch
        self.frac_limit = frac_limit

    def __reduce__(self):
        return (
            EmbedOutageError,
            (self.n_fallback, self.n_batch, self.frac_limit),
        )


class EmbedPoisonError(RuntimeError):
    """A single input row kept failing after retries and no
    ``row_fallback`` was configured."""

    def __init__(self, text: str, cause: Exception):
        snippet = text[:80] + ("…" if len(text) > 80 else "")
        super().__init__(
            f"embedding API permanently failed on row {snippet!r}: {cause!r}"
        )
        self.text = text
        self.cause = cause

    def __reduce__(self):
        # default BaseException.__reduce__ would re-call __init__ with
        # the formatted message only -> TypeError on unpickle
        return (EmbedPoisonError, (self.text, self.cause))


class ResilientEmbedFn:
    """Wrap ``fn: list[str] -> list[vec]`` with retry + rate limit +
    poison-row bisection.  Picklable (top-level class, plain-data
    attributes) — ships to executors inside the mapInPandas closure.

    Per-instance counters (``calls``, ``retries``, ``fallback_rows``)
    are *per executor process* after pickling — read them in unit
    tests or driver-side dry runs, not across a cluster.
    """

    def __init__(
        self,
        fn: Callable[[list[str]], Sequence[Sequence[float]]],
        *,
        max_retries: int = 4,
        backoff_s: float = 0.5,
        backoff_cap_s: float = 30.0,
        max_calls_per_s: float | None = None,
        retry_on: tuple[type[BaseException], ...] = (Exception,),
        row_fallback: Callable[[str], Sequence[float]] | None = None,
        max_fallback_frac: float | None = 0.5,
        sleep: Callable[[float], None] = time.sleep,
        monotonic: Callable[[], float] = time.monotonic,
    ):
        if max_retries < 0:
            raise ValueError("max_retries must be >= 0")
        if max_fallback_frac is not None and not (
            0.0 <= max_fallback_frac <= 1.0
        ):
            raise ValueError("max_fallback_frac must be in [0, 1] or None")
        self.fn = fn
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.backoff_cap_s = backoff_cap_s
        self.min_interval = (
            1.0 / max_calls_per_s if max_calls_per_s else 0.0
        )
        self.retry_on = retry_on
        self.row_fallback = row_fallback
        self.max_fallback_frac = max_fallback_frac
        self._sleep = sleep
        self._monotonic = monotonic
        self._last_call = None  # type: float | None
        self.calls = 0
        self.retries = 0
        self.fallback_rows = 0

    # ------------------------------------------------------------------
    def _rate_limited_call(self, texts: list[str]):
        if self.min_interval and self._last_call is not None:
            wait = self.min_interval - (self._monotonic() - self._last_call)
            if wait > 0:
                self._sleep(wait)
        self._last_call = self._monotonic()
        self.calls += 1
        out = self.fn(texts)
        if len(out) != len(texts):
            raise TransientEmbedError(
                f"embedding API returned {len(out)} vectors for "
                f"{len(texts)} inputs (partial response)"
            )
        return list(out)

    def _call_with_retries(self, texts: list[str]):
        # partial responses are transient by contract, independent of
        # how narrow the user made retry_on
        retry_on = tuple(self.retry_on) + (TransientEmbedError,)
        attempt = 0
        while True:
            try:
                return self._rate_limited_call(texts)
            except retry_on as exc:
                if attempt >= self.max_retries:
                    raise exc
                self.retries += 1
                self._sleep(
                    min(self.backoff_s * (2**attempt), self.backoff_cap_s)
                )
                attempt += 1

    def _embed(self, texts: list[str]):
        try:
            return self._call_with_retries(texts)
        except tuple(self.retry_on) + (TransientEmbedError,) as exc:
            if len(texts) == 1:
                if self.row_fallback is not None:
                    self.fallback_rows += 1
                    return [list(map(float, self.row_fallback(texts[0])))]
                raise EmbedPoisonError(texts[0], exc) from exc
            mid = len(texts) // 2
            # poison isolation: the good half embeds via the real API,
            # recursion narrows the bad half down to the single row
            return self._embed(texts[:mid]) + self._embed(texts[mid:])

    def __call__(self, texts: list[str]):
        if not texts:
            return []
        before = self.fallback_rows
        out = self._embed(list(texts))
        # outage guard: a sustained API failure bisects EVERY row down
        # to row_fallback — indistinguishable from isolated poison rows
        # by the per-executor counter alone, so cap the per-batch
        # fallback fraction.  Single-row batches are exempt (one poison
        # row is exactly what row_fallback is for).
        n_fb = self.fallback_rows - before
        if (
            self.max_fallback_frac is not None
            and len(texts) >= 2
            and n_fb / len(texts) > self.max_fallback_frac
        ):
            raise EmbedOutageError(n_fb, len(texts), self.max_fallback_frac)
        return out


def hash_embed_fallback(text: str, dim: int | None = None):
    """Deterministic hash-embedding row fallback (vectorize.py:73) in
    the ``row_fallback`` signature.  Poisoned rows get a reproducible
    stand-in vector instead of killing the job; rerun with the same
    corpus and the same rows fall back to the same vectors."""
    from .vectorize import EMBED_DIM, hash_embed_text

    return hash_embed_text(text, dim or EMBED_DIM).tolist()
