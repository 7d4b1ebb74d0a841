"""Repo-corpus ingest: scan, sha256 invariant, tokenize, occurrence table.

input_hint contract: the engine's source is an Iceberg table
``(repo string, path string, commit string, lang string, content string)``;
in the sandbox a parquet directory stands in (``fmt="parquet"``). Per-row
``sha256(content)`` is computed at scan time and must survive every ingest
transformation (north rule; asserted by ``verify_sha256`` and the test
suite).

Tokenization: the default fast path is pure Catalyst
(``split(lower(content), ...)`` — whole-stage codegen, no Python); the
reference-faithful path mirrors the reference's nltk word-tokenize +
lowercase + punctuation strip + stopword drop
(/root/reference/bluegraph/preprocess/utils.py:61-77) as a **vectorized
pandas UDF** (Arrow batches, no per-row Python — input_hint).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# A small english stopword list (reference uses nltk's; fixed here so the
# engine has no runtime download dependency).
STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")


def ingest_repo_corpus(
    spark: SparkSession,
    source: str | DataFrame,
    fmt: str = "parquet",
) -> DataFrame:
    """Scan the corpus and stamp the per-row content sha256.

    ``source`` is a path (read with ``fmt`` — pass ``"iceberg"`` on a
    cluster with an Iceberg catalog) or an already-loaded DataFrame.
    Returns the input columns plus ``file_id`` (repo/path@commit) and
    ``content_sha256``.
    """
    df = source if isinstance(source, DataFrame) else spark.read.format(fmt).load(source)
    return df.select(
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.concat_ws("@", F.concat_ws("/", "repo", "path"), "commit").alias("file_id"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )


def verify_sha256(df: DataFrame, content_col: str = "content",
                  sha_col: str = "content_sha256") -> int:
    """Number of rows whose content no longer matches its ingest-time sha.

    Zero means the invariant holds through whatever plan produced ``df``.
    """
    return df.filter(F.sha2(F.col(content_col), 256) != F.col(sha_col)).count()


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(content: pd.Series) -> pd.Series:
    """Reference-faithful tokenizer as an Arrow-vectorized pandas UDF.

    Lowercase, word tokens, punctuation stripped, stopwords dropped
    (semantics of /root/reference/bluegraph/preprocess/utils.py:61-77).
    """
    return content.map(
        lambda s: [
            t for t in _TOKEN_RE.findall(s.lower()) if t not in STOPWORDS
        ]
        if s is not None
        else []
    )


def tokenize_fast(content: F.Column | str) -> F.Column:
    """Pure-Catalyst tokenizer: lowercase split on non-word runs, stopwords
    dropped. Whole-stage-codegen'd; the default hot path."""
    col = F.col(content) if isinstance(content, str) else content
    toks = F.split(F.lower(col), r"[^a-z0-9_]+")
    toks = F.filter(toks, lambda t: (t != "") & ~t.isin(*STOPWORDS))
    return toks


def token_occurrences(
    corpus: DataFrame,
    use_pandas_udf: bool = False,
    min_token_len: int = 1,
) -> DataFrame:
    """(node=token, factor=file_id) occurrence table from the corpus.

    The co-occurrence edge builder consumes this directly: tokens co-occur
    when they appear in the same file (terms-in-papers semantics,
    SURVEY.md §2.4).
    """
    toks = tokenize_udf(F.col("content")) if use_pandas_udf else tokenize_fast("content")
    occ = corpus.select(
        F.col("file_id").alias("factor"), F.explode(toks).alias("node")
    )
    if min_token_len > 1:
        occ = occ.filter(F.length("node") >= min_token_len)
    return occ.select("node", "factor").distinct()


def file_occurrences(corpus: DataFrame, use_pandas_udf: bool = False) -> DataFrame:
    """(node=file_id, factor=token): files co-occur when they share tokens —
    the north star's file/repo co-occurrence graph direction."""
    toks = tokenize_udf(F.col("content")) if use_pandas_udf else tokenize_fast("content")
    return (
        corpus.select(F.col("file_id").alias("node"), F.explode(toks).alias("factor"))
        .distinct()
    )
