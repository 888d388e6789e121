"""True byte-pair-encoding token counting over a FROZEN merge table.

Round-3 VERDICT #5: `bpe_ish_token_count` (text/analysis.py) is a regex
approximation — fine as a quality signal, but a training-data pipeline that
budgets by token count needs real BPE merges. This module is the real
algorithm (Sennrich et al. 2016; GPT-2-style byte-level variant):

- texts are pre-tokenized into words (space-prefixed word regex), each word
  mapped to a tuple of byte-symbols (latin-1, so every byte is one symbol);
- merges apply iteratively: at each step the ADJACENT PAIR with the lowest
  merge rank is fused at all its non-overlapping occurrences, until no pair
  in the word has a rank — exactly the reference BPE loop;
- the token count of a text is the sum of its words' post-merge lengths.

The merge table lives in text/bpe_vocab.py, trained ONCE on the sf0.01
documents corpus by scripts/train_bpe.py and committed (same frozen-artifact
pattern as known_answers.py); runtime never retrains.

Scale shape: the UDF is an Arrow-batched pandas UDF; within a worker the
per-WORD merge loop is memoized in a per-vocab cache (natural-language
word frequency is Zipfian, so the cache hit rate approaches 1 and the
Python loop runs ~once per distinct word, not per occurrence) — the same
trick production tokenizers use. Counting is embarrassingly parallel:
map-only, no shuffle, no driver involvement.
"""

from __future__ import annotations

import functools
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# space-prefixed words, numbers, punctuation runs, residual whitespace —
# an ASCII-range simplification of the GPT-2 pre-tokenizer (python `re`
# has no \p{L} classes; the corpus contract is byte-level anyway)
_PRETOKEN = re.compile(rb" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+$|\s+(?=\S)|\s+")


def pretokenize(data: bytes) -> list[bytes]:
    return _PRETOKEN.findall(data)


def merge_word(word: tuple[str, ...], ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Apply the frozen merge table to one word: repeatedly fuse the
    lowest-rank adjacent pair (all non-overlapping occurrences, left to
    right) until no adjacent pair has a rank."""
    while len(word) >= 2:
        best = min(zip(word[:-1], word[1:]), key=lambda p: ranks.get(p, 1 << 30))
        if best not in ranks:
            break
        first, second = best
        out: list[str] = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                out.append(first + second)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = tuple(out)
    return word


def train_bpe(texts: list[bytes], n_merges: int) -> list[tuple[str, str]]:
    """Learn a merge table: count words once, then repeatedly merge the most
    frequent adjacent pair across the word-frequency dict (ties broken by
    pair lexicographic order, so training is fully deterministic)."""
    from collections import Counter

    word_freq: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in pretokenize(t):
            word_freq[tuple(w.decode("latin-1"))] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: Counter[tuple[str, str]] = Counter()
        for word, f in word_freq.items():
            for p in zip(word[:-1], word[1:]):
                pair_freq[p] += f
        if not pair_freq:
            break
        top = max(pair_freq.values())
        best = min(p for p, f in pair_freq.items() if f == top)
        merges.append(best)
        rank = {best: 0}
        word_freq = Counter(
            {merge_word(w, rank): f for w, f in word_freq.items()}
        )
    return merges


_WORD_CACHE_MAX = 200_000


def _count_text(
    data: bytes,
    ranks: dict[tuple[str, str], int],
    cache: dict[tuple[str, ...], int] | None = None,
) -> int:
    """Token count of one text. `cache` memoizes per-WORD merge results and
    MUST be scoped to one ranks table — a shared cache across two vocabs
    would silently return counts computed under the wrong merge table
    (callers that pass no cache get correct, uncached behavior)."""
    n = 0
    for w in pretokenize(data):
        key = tuple(w.decode("latin-1"))
        c = cache.get(key) if cache is not None else None
        if c is None:
            c = len(merge_word(key, ranks))
            if cache is not None and len(cache) < _WORD_CACHE_MAX:
                cache[key] = c
        n += c
    return n


@functools.lru_cache(maxsize=1)
def _frozen_vocab() -> tuple[dict[tuple[str, str], int], dict[tuple[str, ...], int]]:
    """(ranks, word-count cache) for the COMMITTED vocab — the cache is
    created together with the ranks table it belongs to, so counts under a
    different (retrained/experimental) table can never alias into it."""
    from stac_to_geocore_spark.text.bpe_vocab import MERGES

    return {p: i for i, p in enumerate(MERGES)}, {}


def _ranks() -> dict[tuple[str, str], int]:
    return _frozen_vocab()[0]


def bpe_token_count(text: Column) -> Column:
    """Column of true-BPE token counts under the frozen vocab. Arrow-batched;
    see module docstring for the per-word memoization that keeps the Python
    merge loop off the per-row hot path."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _cnt(s: pd.Series) -> pd.Series:
        ranks, cache = _frozen_vocab()
        # nulls arrive as None or NaN depending on the Arrow path — isinstance
        # guard instead of truthiness (NaN is truthy)
        return s.map(
            lambda t: _count_text(t.encode("utf-8"), ranks, cache) if isinstance(t, str) else 0
        ).astype("int64")

    return _cnt(text)


def bpe_token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    # the merge loop is the most CPU-heavy python stage in the engine; a
    # compact documents table read as 1-2 splits would run it on 1-2 cores
    # (fan_out only ever raises parallelism — no-op on a real 100 TB scan)
    from stac_to_geocore_spark.partitioning import fan_out

    df = fan_out(df.select(id_col, text_col))
    return df.select(id_col, bpe_token_count(F.col(text_col)).alias("n_bpe_tokens"))
