"""Vectorized (Arrow) pandas UDFs — the sanctioned Python slow path.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the pd.Series type hints at decoration time, and postponed
evaluation turns them into unresolvable strings.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def reverse_text(s: pd.Series) -> pd.Series:
    """Reverse each string — stand-in kernel for tokenizers/scoring
    models shipped as Python; Arrow batches keep it ~10-100× faster than
    row-at-a-time UDFs."""
    return s.map(lambda x: x[::-1] if x is not None else None)


@pandas_udf("double")
def byte_entropy(s: pd.Series) -> pd.Series:
    """Shannon entropy of the UTF-8 bytes — a common quality filter
    feature for pre-training corpora."""
    import math

    def ent(x):
        if not x:
            return 0.0
        b = x.encode("utf-8")
        n = len(b)
        counts: dict[int, int] = {}
        for ch in b:
            counts[ch] = counts.get(ch, 0) + 1
        return -sum((c / n) * math.log2(c / n) for c in counts.values())

    return s.map(ent)
