"""Scale guard for the brute-force verifier operators.

The engine keeps a few intentionally-quadratic operators around as
exact test-scale baselines for their bucketed twins (all-pairs cosine
vs SRP-LSH, word-Jaccard vs MinHash-LSH, containment scan vs
tokenize-and-join). Each is safe at fixture scale and catastrophic at
corpus scale, so each counts its input first and fails loudly above a
threshold, pointing at the 100 TB-shaped twin. The count is one
metadata-cheap job (parquet footer counts) — acceptable for a
verifier, which by definition runs at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Above this many input rows, an O(N^2)-ish verifier is a mistake, not
# a verification: 200k docs is already ~2×10^10 candidate comparisons.
BRUTE_FORCE_MAX_ROWS = 200_000


class BruteForceScaleError(RuntimeError):
    """Raised when a test-scale verifier is pointed at corpus-scale
    input instead of its bucketed twin."""


def guard_brute_force(df: DataFrame, op: str, twin: str,
                      max_rows: int | None = None) -> None:
    limit = BRUTE_FORCE_MAX_ROWS if max_rows is None else max_rows
    n = df.count()
    if n > limit:
        raise BruteForceScaleError(
            f"{op} is the O(N²) test-scale verifier and refuses "
            f"{n:,} input rows (limit {limit:,}); run {twin} instead "
            f"(the bucketed scale path), or pass max_rows explicitly "
            f"if you really mean to verify at this size")
