"""Text analysis for large-scale training-data pipelines.

All hot-path functions are pure Catalyst column expressions (whole-stage
codegen, no Python); simhash needs real bit manipulation and ships as an
Arrow-vectorized pandas UDF. Tokenization here is whitespace/word-regex
based (the ``documents`` test tables are space-joined tokens); the
reference-faithful code tokenizer lives in sources/corpus.py.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# tiny per-language function-word lists for the n-gram/stopword language-ID
# heuristic; deliberately literal so the DuckDB oracle can mirror them.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "und", "das", "von", "ein", "mit", "zu"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "for", "on", "with", "as", "was", "are")


def tokens_col(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    t = F.split(F.lower(col), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text)).cast("long")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens_col(text))).cast("long")


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set — the
    canonical 'bag of words' identity used for fuzzy-exact dedup."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col(text)))))


def punct_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    clean = F.regexp_replace(col, r"[^A-Za-z0-9\s]", "")
    return (
        (F.length(col) - F.length(clean)).cast("double")
        / F.greatest(F.length(col).cast("double"), F.lit(1.0))
    )


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens_col(text)
    hits = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks).cast("double"), F.lit(1.0))


def mean_token_length(text: Column | str) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.greatest(F.size(toks).cast("double"), F.lit(1.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    plausible mean token length + vocabulary diversity."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 10000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.0)
    mlen = mean_token_length(text)
    mlen_ok = F.when((mlen >= 2.0) & (mlen <= 12.0), 1.0).otherwise(0.0)
    diversity = distinct_token_count(text).cast("double") / F.greatest(
        n.cast("double"), F.lit(1.0)
    )
    return (len_ok + punct_ok + mlen_ok + F.least(diversity * 2, F.lit(1.0))) / 4.0


def langid_col(text: Column | str) -> Column:
    """Heuristic language ID: the language whose marker words occur most
    (ties -> lexicographically smallest code; no hits -> 'und')."""
    toks = tokens_col(text)
    scored = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        score = F.size(F.filter(toks, lambda x: x.isin(*markers)))
        scored.append(F.struct(score.alias("s"), F.lit(lang).alias("l")))
    # max over (score, inverted-lang) so ties pick the smallest code:
    # compare structs (s, l) with l descending is awkward; do argmax by
    # sorting ascending and taking the last of a stable ordering on
    # (s asc, l desc) => last element has max s and min l among maxima.
    arr = F.array(*scored)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("s"), F.lit("zz").alias("l")),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]) | ((x["s"] == acc["s"]) & (x["l"] < acc["l"])), x
        ).otherwise(acc),
    )
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


@F.pandas_udf(LongType())
def simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over a token array column (Arrow-vectorized).

    Per token: md5-derived 64-bit hash; per bit: +1/-1 vote; sign vector
    packed to a signed 64-bit int.
    """

    def one(toks):
        if toks is None or len(toks) == 0:
            return 0
        votes = [0] * 64
        for t in toks:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        v = 0
        for b in range(64):
            if votes[b] > 0:
                v |= 1 << b
        return v - (1 << 64) if v >= (1 << 63) else v

    return tokens.map(one)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
