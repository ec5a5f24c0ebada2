"""Property-based robustness: the extractor is total and deterministic
on arbitrary text (hypothesis), and structural invariants always hold.

The raw-text fallback semantics (X7, entity_extraction.py:163-169) make
totality load-bearing: malformed source must yield triples, not raise.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datacapsule_spark.extraction_schema import ALL_PREDICATES, extract_file

LANGS = ["python", "javascript", "java"]

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=2000,
)


@settings(max_examples=200, deadline=None)
@given(content=text_strategy, lang=st.sampled_from(LANGS))
def test_extractor_total_and_deterministic(content, lang):
    ts1 = extract_file("o/r", "src/a.x", "c" * 40, lang, content)
    ts2 = extract_file("o/r", "src/a.x", "c" * 40, lang, content)
    assert ts1 == ts2
    # structural invariants
    assert ts1, "every file yields at least the taxonomy + loc triples"
    sha = ts1[0]["content_sha256"]
    for t in ts1:
        assert t["pred"] in ALL_PREDICATES
        assert t["subj"] and t["obj"]
        assert t["content_sha256"] == sha
        assert t["lang"] == lang
    keys = [(t["subj"], t["pred"], t["obj"]) for t in ts1]
    assert len(keys) == len(set(keys)), "per-file triples are unique"


@settings(max_examples=100, deadline=None)
@given(
    lines=st.lists(
        st.sampled_from(
            [
                "import os, json",
                "import ???",
                "# author: A, B，C",
                "# author: unknown",
                "# year: 1999",
                "# year: xx",
                "# size: 10-20",
                "def f(x):",
                "class K:",
                "    y = g(x)",
                "",
                "，",
            ]
        ),
        max_size=40,
    )
)
def test_extractor_on_plausible_fragments(lines):
    ts = extract_file("o/r", "p/q.py", "c" * 40, "python", "\n".join(lines))
    loc = [t for t in ts if t["pred"] == "has_loc"]
    assert len(loc) == 1
    assert loc[0]["obj"] == f"loc:{max(len(lines), 1)}"
    # sentinel authors never leak through
    assert not any(
        t["obj"] == "author:unknown" for t in ts if t["pred"] == "authored_by"
    )
