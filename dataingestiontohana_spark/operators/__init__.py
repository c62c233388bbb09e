"""DataFrame -> DataFrame operators (the engine's composite ops)."""

from dataingestiontohana_spark.operators.dedup import (  # noqa: F401
    minhash_candidates,
    minhash_signatures,
    simhash_fingerprints,
)
