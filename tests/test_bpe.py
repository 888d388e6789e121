"""True-BPE anchor tests: the engine's vectorized/memoized tokenizer must
agree with an INDEPENDENT naive implementation (merge one pair occurrence
at a time, chosen by rank then position — a different code path from
text/bpe.merge_word's all-occurrences sweep), so the frozen known-answer
oracle in the gate can't launder a wrong algorithm."""

from __future__ import annotations

import numpy as np
import pytest

from stac_to_geocore_spark.text.bpe import (
    _count_text,
    _ranks,
    merge_word,
    pretokenize,
    train_bpe,
)
from stac_to_geocore_spark.text.bpe_vocab import MERGES


def naive_bpe_len(word: tuple[str, ...], ranks) -> int:
    """Reference: repeatedly merge the single LEFTMOST occurrence of the
    best-ranked pair. Equivalent to the all-occurrences sweep because after
    merging one occurrence, the same pair is still the minimum rank until
    none of its occurrences remain."""
    word = list(word)
    while len(word) >= 2:
        pairs = [(ranks.get((word[i], word[i + 1]), 1 << 30), i) for i in range(len(word) - 1)]
        rank, i = min(pairs)
        if rank == 1 << 30:
            break
        word[i : i + 2] = [word[i] + word[i + 1]]
    return len(word)


def test_merge_word_matches_naive_on_corpus_words():
    ranks = _ranks()
    words = set()
    import duckdb

    for (t,) in duckdb.sql(
        "SELECT text FROM read_parquet('/root/testdata/sf0.01/documents.parquet') LIMIT 100"
    ).fetchall():
        words.update(tuple(w.decode("latin-1")) for w in pretokenize(t.encode()))
    assert len(words) > 10
    for w in sorted(words):
        assert len(merge_word(w, ranks)) == naive_bpe_len(w, ranks), w


def test_merge_word_matches_naive_on_random_bytes():
    ranks = _ranks()
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(0, 30))
        raw = bytes(rng.integers(32, 127, n, dtype=np.uint8).tolist())
        for w in pretokenize(raw):
            key = tuple(w.decode("latin-1"))
            assert len(merge_word(key, ranks)) == naive_bpe_len(key, ranks), w


def test_overlapping_pair_merges_left_to_right():
    # "aaa" under merge ('a','a'): positions 0-1 fuse, position 1-2 must NOT
    # reuse the consumed middle 'a' -> ('aa', 'a'), 2 tokens
    assert merge_word(("a", "a", "a"), {("a", "a"): 0}) == ("aa", "a")
    assert naive_bpe_len(("a", "a", "a"), {("a", "a"): 0}) == 2


def test_merge_rank_order_not_frequency_order():
    # rank decides which pair fuses first: ('b','c') rank 0 beats ('a','b')
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert merge_word(("a", "b", "c"), ranks) == ("a", "bc")


def test_count_text_sums_words_and_handles_empty():
    ranks = _ranks()
    assert _count_text(b"", ranks) == 0
    one = _count_text(b"table", ranks)
    assert _count_text(b"table table", ranks) == one + _count_text(b" table", ranks)


def test_train_is_deterministic_and_matches_frozen():
    """Retraining on the committed corpus reproduces the frozen table. The
    full table is 2000 merges (~25 s to train), so the test checks a 64-merge
    PREFIX: greedy BPE merges are prefix-stable — the first k merges of an
    n-merge run equal a k-merge run — so any drift in corpus, pretokenizer,
    or tie-breaking shows up in the prefix."""
    import duckdb

    from stac_to_geocore_spark.fixtures import gen_bpe_training_corpus

    texts = [
        r[0].encode()
        for r in duckdb.sql(
            "SELECT text FROM read_parquet('/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    assert len(MERGES) == 2000
    assert train_bpe(texts + gen_bpe_training_corpus(), 64) == MERGES[:64]


def test_pretokenize_covers_every_byte():
    samples = [b"hello,   world!! 123", b"  leading", b"trailing   ", b"\t\nmix  ed"]
    for s in samples:
        assert b"".join(pretokenize(s)) == s


def test_bpe_token_counts_dataframe(spark):
    from stac_to_geocore_spark.text.bpe import bpe_token_counts

    df = spark.createDataFrame(
        [(0, "key agg row"), (1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_bpe_tokens for r in bpe_token_counts(df).collect()}
    ranks = _ranks()
    assert out[0] == _count_text(b"key agg row", ranks)
    assert out[1] == 0 and out[2] == 0


def test_word_cache_is_scoped_per_vocab():
    """Two merge tables in one process must not alias counts through a
    shared word cache (the round-4 review finding): the same word counted
    under different vocabs yields different, correct results."""
    ranks_a = {("t", "a"): 0}
    ranks_b = {("t", "a"): 0, ("ta", "b"): 1, ("tab", "l"): 2, ("tabl", "e"): 3}
    cache_a: dict = {}
    cache_b: dict = {}
    a1 = _count_text(b"table", ranks_a, cache_a)
    b1 = _count_text(b"table", ranks_b, cache_b)
    assert a1 == 4  # ta|b|l|e
    assert b1 == 1  # fully merged
    # repeat from the caches — still vocab-correct
    assert _count_text(b"table", ranks_a, cache_a) == 4
    assert _count_text(b"table", ranks_b, cache_b) == 1
