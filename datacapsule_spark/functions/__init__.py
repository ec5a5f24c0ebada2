"""Engine function library — the reusable column-expression builders.

Everything here is JVM-side (codegen-friendly); Python appears only in
clearly-marked Arrow-batched kernels elsewhere. Re-exported from the
modules where they are implemented and tested:
"""

from ..linking import normalize_name  # noqa: F401
from ..operators.curation import assign_splits, redact_pii, sample_by_hash  # noqa: F401
from ..operators.diff import skew_report, table_diff  # noqa: F401
from ..operators.merge import latest_by_key, merge_plan  # noqa: F401
from ..operators.motif import find_motif  # noqa: F401
from ..operators.text import profile_table  # noqa: F401
from ..operators.dedup import shingle_rows, simhash_pairs, with_shingles  # noqa: F401
from ..vectorize import _cosine_expr as cosine_expr  # noqa: F401
from ..vectorize import hash_embed_text  # noqa: F401

__all__ = [
    "normalize_name",
    "assign_splits",
    "redact_pii",
    "sample_by_hash",
    "table_diff",
    "skew_report",
    "merge_plan",
    "latest_by_key",
    "find_motif",
    "profile_table",
    "shingle_rows",
    "simhash_pairs",
    "with_shingles",
    "cosine_expr",
    "hash_embed_text",
]
