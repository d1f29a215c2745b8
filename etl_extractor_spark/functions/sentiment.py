"""Sentiment scoring — fills the reference's reserved ``Sentimiento``
column (reference main.py:392, README.md:62) with a deterministic
marker heuristic.

Implemented as an Arrow-vectorized ``@pandas_udf`` deliberately: this
is the template for model-backed scoring (swap the marker counting for
an ONNX/transformers call batched over the same Arrow series). Because
the heuristic itself is simple counting, the DuckDB oracle pins the
pandas-UDF path to exact SQL semantics — proof the Python vectorized
path computes precisely what the declarative form would.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

POSITIVE = ("fast", "small", "value")
NEGATIVE = ("slow", "big", "dup")


@F.pandas_udf(T.DoubleType())
def sentiment_score_raw(texts: pd.Series) -> pd.Series:
    """(pos − neg) / tokens in [−1, 1]; UNROUNDED — pandas .round is
    banker's (half-even) while Spark/DuckDB round half-up/away, so the
    caller rounds with F.round for oracle parity."""
    norm = texts.fillna("").str.replace(r"\s+", " ", regex=True).str.strip()
    toks = norm.str.split(" ")
    n = toks.map(len).clip(lower=1)
    pos = sum(toks.map(lambda t: t.count(w)) for w in POSITIVE)
    neg = sum(toks.map(lambda t: t.count(w)) for w in NEGATIVE)
    return (pos - neg) / n


def sentiment_score(c) -> Column:
    return F.round(sentiment_score_raw(c), 4)


def sentiment_label(score: Column) -> Column:
    return (
        F.when(score > 0.02, "positive")
        .when(score < -0.02, "negative")
        .otherwise("neutral")
    )
