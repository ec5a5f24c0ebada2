"""Engine function library — the reusable column-expression builders.

Everything here is JVM-side (codegen-friendly); Python appears only in
clearly-marked Arrow-batched kernels elsewhere. Re-exported from the
modules where they are implemented and tested:
"""

from ..linking import normalize_name  # noqa: F401
from ..operators.curation import sample_by_hash  # noqa: F401
from ..operators.dedup import shingle_rows, with_shingles  # noqa: F401
from ..vectorize import _cosine_expr as cosine_expr  # noqa: F401
from ..vectorize import hash_embed_text  # noqa: F401

__all__ = [
    "normalize_name",
    "sample_by_hash",
    "shingle_rows",
    "with_shingles",
    "cosine_expr",
    "hash_embed_text",
]
