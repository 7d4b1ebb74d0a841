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


def simhash_signatures(df, id_col: str, text_col: str):
    """(id, sig): 64-bit SimHash per document, as a pure Catalyst plan.

    Semantics (bit-identical to the DuckDB oracle and to :func:`simhash64`):
    per token t, h = big-endian uint64 of md5(t)[:8]; per bit b (0..63), vote
    +1 if (h >> b) & 1 else -1; signature bit b set iff the vote sum > 0;
    result is the signed-64 reinterpretation. Documents with zero tokens get
    signature 0.

    Plan: explode tokens → md5 → two 32-bit halves via ``conv`` (hex → long,
    each < 2^32 so ANSI-safe) → one groupBy with 64 conditional-sum votes
    (map-side partial aggregation: the shuffle carries one 64-column row per
    document per partition, not the token table) → bitwise-OR bit packing.
    Zero Python anywhere — this replaces a per-row/per-bit Python UDF that
    was ~13s for 500 docs and would dominate any corpus-scale run.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("_t")
    )
    m = F.md5("_t")
    # md5 hexdigest chars 1-16 are digest[:8] big-endian: chars 1-8 = bits
    # 63..32 of h, chars 9-16 = bits 31..0.
    hashed = toks.select(
        "id",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("_lo"),
    )

    def bit(b: int):
        src = F.col("_lo") if b < 32 else F.col("_hi")
        return F.shiftright(src, b % 32).bitwiseAND(F.lit(1))

    votes = hashed.groupBy("id").agg(
        *[
            F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"_v{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"_v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    sigs = votes.select("id", sig.alias("sig"))
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(sigs, "id", "left").select(
        "id", F.coalesce("sig", F.lit(0).cast("long")).alias("sig")
    )


@F.pandas_udf(LongType())
def simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over a token array column (Arrow + numpy batch kernel).

    Column-expression convenience twin of :func:`simhash_signatures` (same
    values). The batch's tokens are hashed once, then the bit votes are one
    ``np.unpackbits`` + ``np.add.reduceat`` over the whole batch — no
    per-bit Python. Prefer ``simhash_signatures`` in pipelines: it is pure
    Catalyst and keeps the whole stage in codegen.
    """
    import numpy as np

    counts = np.fromiter(
        (0 if t is None else len(t) for t in tokens), dtype=np.int64, count=len(tokens)
    )
    buf = b"".join(
        hashlib.md5(tok.encode()).digest()[:8]
        for t in tokens
        if t is not None
        for tok in t
    )
    out = np.zeros(len(tokens), dtype=np.uint64)
    nonempty = counts > 0
    if buf:
        # (n_tokens, 64) bit matrix; column j = bit (63 - j) of h (big-endian)
        bits = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8).reshape(-1, 8), axis=1
        ).astype(np.int64)
        pm = 2 * bits - 1
        offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(counts[nonempty][:-1], out=offsets[1:])
        votes = np.add.reduceat(pm, offsets, axis=0)
        weights = np.left_shift(
            np.uint64(1), np.arange(63, -1, -1, dtype=np.uint64)
        )
        out[nonempty] = ((votes > 0).astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64
        )
    return pd.Series(out.view(np.int64))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
