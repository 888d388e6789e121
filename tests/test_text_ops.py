"""Text dedup / analysis operators: planted near-duplicates must be found,
langid must be sane on known-language text, winnowing must be edit-robust."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_to_geocore_spark.ann import brute_topk, embedding_dedup_pairs, lsh_topk
from stac_to_geocore_spark.text.analysis import doc_fingerprint, langid, quality_score
from stac_to_geocore_spark.text.dedup import minhash_lsh_pairs, ngram_jaccard_pairs, simhash64

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets over "
    "the quiet river valley and a cool wind drifts across the open fields"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                       # exact dup of 0
        (2, BASE.replace("quick", "swift")),             # near dup of 0
        (3, "le chat est sur la table et le chien dort dans la maison pres de la porte"),
        (4, "completely different content about spark query engines and shuffle partitioning strategies"),
        (5, BASE.replace("dog", "cat").replace("fox", "hare")),  # near dup
        (6, "der hund ist ein treuer freund und die katze schläft auf dem sofa mit der familie"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs or (1, 2) in pairs
    assert not any(4 in p for p in pairs)


def test_minhash_band_cap_bounds_boilerplate_blowup(spark):
    """A boilerplate cluster (one text repeated 60x) must not go quadratic:
    with max_band_size below the cluster size its buckets are dropped, while
    planted near-dups in normal-sized buckets are still found."""
    rows = [(i, "standard legal disclaimer footer repeated on every single page of the site") for i in range(60)]
    rows += [(100, BASE), (101, BASE.replace("quick", "swift"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(docs, threshold=0.5, max_band_size=10).toPandas()
    pairs = {(a, b) for a, b in zip(capped["id_a"], capped["id_b"])}
    assert (100, 101) in pairs                       # recall kept for real near-dups
    assert not any(a < 60 and b < 60 for a, b in pairs)  # boilerplate pairs suppressed

    uncapped = minhash_lsh_pairs(docs, threshold=0.5, max_band_size=None)
    assert uncapped.count() == 60 * 59 // 2 + 1      # the quadratic blob the cap avoids


def test_connected_components_multi_hop(spark):
    """Chain 1-2-3-4 (diameter 3, needs >1 propagation round), a separate
    pair, and a triangle — labels must converge to the component minimum."""
    from stac_to_geocore_spark.text.components import connected_components, dedup_keepers

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    keep = {r["node"] for r in dedup_keepers(pairs).filter("keep").collect()}
    assert keep == {1, 10, 20}


def test_minhash_exact_dup_estimate_is_one(docs):
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0


def test_ngram_jaccard_exact_verification(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert all(j <= 1.0 for j in pairs.values())
    assert not any(3 in p or 4 in p or 6 in p for p in pairs)


def test_simhash_hamming_ranks_similarity(docs):
    got = {r.doc_id: r.simhash for r in simhash64(docs).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[0], got[1]) == 0
    assert ham(got[0], got[2]) < ham(got[0], got[4])


def test_langid_on_known_languages(docs):
    got = {r.doc_id: r.lang_pred for r in langid(docs).collect()}
    assert got[0] == "en" and got[4] == "en"
    assert got[3] == "fr"
    assert got[6] == "de"


def test_quality_score_ranges(docs):
    q = quality_score(docs).toPandas()
    assert ((q.quality >= 0) & (q.quality <= 1)).all()
    assert ((q.alpha_ratio > 0) & (q.alpha_ratio <= 1)).all()


def test_winnowing_fingerprint_edit_robust(spark):
    a = BASE
    b = BASE.replace("quick", "swift")  # local edit
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    fps = {r.doc_id: set(r.fingerprint) for r in doc_fingerprint(df).collect()}
    overlap = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    assert overlap > 0.6  # most fingerprints survive a one-word edit


def test_ann_lsh_recall_vs_brute(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    exact = brute_topk(emb, q, k=10).toPandas()
    # sf0.01 embeddings are near-random (top-10 cosine ~0.3): the hard LSH
    # regime, needing low-selectivity tables for recall
    approx = lsh_topk(emb, q, k=10, dim=64, n_tables=12, n_planes=4).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5  # multi-probe 1-bit LSH recall floor


def test_ann_ivf_recall_vs_brute(spark):
    from stac_to_geocore_spark.ann import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    exact = brute_topk(emb, q, k=10).toPandas()
    approx = ivf_topk(emb, q, k=10, dim=64, n_centroids=16, n_probe=8).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    # probing half the cells of near-random vectors: recall well above the
    # 50% candidate-fraction floor means the quantizer is informative
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_embedding_dedup_self_similarity(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    # plant an exact duplicate vector pair
    dup = emb.limit(1).select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    planted = emb.unionByName(dup)
    pairs = embedding_dedup_pairs(planted, threshold=0.999).toPandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 100000)).any() or (
        (pairs.id_a % 100000) == (pairs.id_b % 100000)
    ).any()


def test_hamming_near_dup_pigeonhole_exact(spark):
    """Every pair within max_hamming must be found (pigeonhole guarantee),
    and nothing beyond it — vs numpy brute force on random 64-bit hashes."""
    import numpy as np

    from stac_to_geocore_spark.text.dedup import hamming_near_dup_pairs

    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 2**62, size=300, dtype=np.int64)
    # plant pairs at hamming exactly 1, 3 (found) and 4 (must be excluded)
    hashes[100] = hashes[0] ^ (1 << 17)
    hashes[101] = hashes[1] ^ 0b10101
    hashes[102] = hashes[2] ^ 0b1111
    df = spark.createDataFrame(
        [(int(i), int(h)) for i, h in enumerate(hashes)], "doc_id long, simhash long"
    )
    got = {(r.id_a, r.id_b): r.hamming for r in hamming_near_dup_pairs(df, max_hamming=3).collect()}

    a = hashes.astype(np.uint64)
    want = {}
    for i in range(len(a)):
        ham = np.array([bin(int(a[i] ^ a[j])).count("1") for j in range(i + 1, len(a))])
        for off in np.nonzero(ham <= 3)[0]:
            want[(i, i + 1 + int(off))] = int(ham[off])
    assert got == want
    assert got[(0, 100)] == 1 and got[(1, 101)] == 3
    assert (2, 102) not in got  # hamming 4 correctly excluded


def test_connected_components_raises_when_not_converged(spark):
    from stac_to_geocore_spark.text.components import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(5)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
