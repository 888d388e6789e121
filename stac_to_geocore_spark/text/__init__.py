from stac_to_geocore_spark.text.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from stac_to_geocore_spark.text.analysis import doc_fingerprint, langid, quality_score
from stac_to_geocore_spark.text.components import connected_components, dedup_keepers

__all__ = [
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "langid",
    "quality_score",
    "doc_fingerprint",
    "connected_components",
    "dedup_keepers",
]
