from bluegraph_spark.functions.mi import (
    mutual_information_col,
    npmi_col,
    npmi_distance_col,
    ppmi_col,
)
from bluegraph_spark.functions.text import (
    fingerprint,
    hamming64,
    langid_col,
    quality_score,
    simhash64,
    simhash_signatures,
    token_count,
    tokens_col,
)

__all__ = [
    "mutual_information_col",
    "npmi_col",
    "npmi_distance_col",
    "ppmi_col",
    "fingerprint",
    "hamming64",
    "langid_col",
    "quality_score",
    "simhash64",
    "simhash_signatures",
    "token_count",
    "tokens_col",
]
