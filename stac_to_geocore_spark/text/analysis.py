"""Text analysis for training-data pipelines: language-ID (stopword n-gram
heuristic), quality scoring, token counting, winnowing fingerprints.

Everything that CAN be a JVM column expression IS one (quality/token
columns compile into whole-stage codegen); only langid and winnowing need
Arrow-batched numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

# minimal public stopword cores (language-ID signal, not linguistics)
_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "with", "as", "on"},
    "fr": {"le", "la", "les", "de", "des", "du", "et", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von", "auf", "für"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "un", "una", "que", "por", "con", "para"},
}


def langid(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language id; 'und' when no stopwords hit (short/garbled)."""

    @F.pandas_udf(StringType())
    def _lid(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                out.append("und")
                continue
            scores = {lang: sum(tok in sw for tok in toks) for lang, sw in _STOPWORDS.items()}
            best = max(sorted(scores), key=lambda k: scores[k])
            out.append(best if scores[best] > 0 else "und")
        return pd.Series(out)

    from stac_to_geocore_spark.partitioning import fan_out

    return fan_out(df).withColumn(out_col, _lid(F.col(text_col)))


def quality_columns(text: Column) -> dict[str, Column]:
    """Pure column-expression quality signals (JVM-side, no UDF)."""
    words = F.split(text, " ")
    n_chars = F.length(text)
    n_tokens = F.size(words)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(n_chars / n_tokens, 4),
        "alpha_ratio": F.round(n_alpha / n_chars, 4),
        "digit_ratio": F.round(n_digit / n_chars, 4),
        "punct_ratio": F.round(n_punct / n_chars, 4),
        "uniq_token_ratio": F.round(F.size(F.array_distinct(words)) / n_tokens, 4),
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    from stac_to_geocore_spark.partitioning import fan_out

    cols = quality_columns(F.col(text_col))
    out = fan_out(df)
    for name, c in cols.items():
        out = out.withColumn(name, c)
    # simple composite: penalize digit/punct-heavy, reward lexical diversity
    return out.withColumn(
        "quality",
        F.round(
            F.lit(1.0)
            * F.least(F.lit(1.0), F.col("n_tokens") / 20.0)
            * (1.0 - F.col("digit_ratio"))
            * (1.0 - F.col("punct_ratio"))
            * F.col("uniq_token_ratio"),
            4,
        ),
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Token count with a BPE-ish regex (word pieces + digits + symbols),
    JVM-side via regexp_count."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint",
    k: int = 7, window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprint: rolling k-gram hashes, per-window
    minimum selection (standard public winnowing scheme). Returns sorted
    distinct selected hashes as array<long> — robust to local edits."""

    @F.pandas_udf(ArrayType(LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            s = (t or "").lower()
            if len(s) < k:
                hs = np.array(
                    [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big") >> 1],
                    dtype=np.int64,
                )
                out.append(hs)
                continue
            n = len(s) - k + 1
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(s[i : i + k].encode(), digest_size=8).digest(), "big") >> 1
                 for i in range(n)),
                dtype=np.int64, count=n,
            )
            if n <= window:
                sel = np.array([hs.min()])
            else:
                idx = np.arange(n - window + 1)[:, None] + np.arange(window)[None, :]
                sel = hs[idx].min(axis=1)
            out.append(np.unique(sel))
        return pd.Series(out)

    from stac_to_geocore_spark.partitioning import fan_out

    return fan_out(df).withColumn(out_col, _fp(F.col(text_col)))
