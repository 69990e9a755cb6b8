"""Engine UDFs mandated by the north_star (BASELINE.json:6, SURVEY.md
§2.11 U2): content sha256 (the per-row invariant) and language
normalization — vectorized Arrow/pandas UDFs, zero per-row Python at
the DataFrame layer.

``content_sha256`` also has a native twin (``F.sha2(col, 256)``) which
is what hot paths should use — the pandas variant exists to satisfy
the spec's UDF surface and as the pattern for invariants Spark has no
builtin for; equivalence of the two is tested.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# raw variant -> canonical language name (generator emits the variants,
# FIXTURES.md §1.1 "lang ... raw variants that the normalizer canonicalizes")
LANG_CANONICAL: dict[str, str] = {
    "python": "python", "py": "python",
    "java": "java",
    "go": "go", "golang": "go",
    "rust": "rust", "rs": "rust",
    "c++": "cpp", "cpp": "cpp",
    "javascript": "javascript", "js": "javascript",
    "typescript": "typescript", "ts": "typescript",
}


def content_sha256_native(c) -> Column:
    """Preferred: JVM-side sha2 (whole-stage codegen)."""
    return F.lower(F.sha2(F.col(c) if isinstance(c, str) else c, 256))


def content_sha256(c) -> Column:
    """Arrow pandas-UDF sha256 (north_star-specified UDF surface)."""

    @pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: hashlib.sha256(x.encode()).hexdigest() if x is not None else None
        )

    return _udf(c)


def normalize_lang(c) -> Column:
    """Canonicalize raw language tags ('PY', 'golang', 'C++') to a fixed
    vocabulary; unknown tags pass through lowercased."""

    @pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        low = s.str.lower()
        return low.map(lambda x: LANG_CANONICAL.get(x, x) if x is not None else None)

    return _udf(c)


def normalize_lang_sql(col: str) -> str:
    """DuckDB twin generated from the SAME mapping table."""
    whens = " ".join(
        f"when lower({col}) = '{k}' then '{v}'" for k, v in LANG_CANONICAL.items()
    )
    return f"case {whens} else lower({col}) end"
