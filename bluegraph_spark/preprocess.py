"""Property-graph feature encoder, Spark-native.

Reference: ``ScikitLearnPGEncoder``
(/root/reference/bluegraph/preprocess/encoders.py:412-572 over the
``SemanticPGEncoder`` driver :46-409) — per-property encoders producing
one concatenated numeric vector per node/edge:

- categorical → MultiLabelBinarizer  (here: sorted-vocabulary multi-hot)
- text        → TfIdf                (here: top-df vocabulary, sklearn's
  smooth-idf ``ln((1+n)/(1+df)) + 1`` weighting and L2 row normalization;
  the word2vec text mode stays out — stochastic single-node training)
- numeric     → StandardScaler (+ mean imputation)

Spark shape: ``fit`` runs one aggregation per property (distinct values /
document frequencies / moments) and keeps only the tiny fitted state on
the driver (vocabulary, idf weights, mean, std) — exactly what sklearn's
fitted objects hold; ``transform`` is pure codegen column expressions
(no UDF): multi-hot and tf counts are ``transform``/``filter``/``size``
over a literal vocabulary array, scaling is arithmetic. Everything is
deterministic (vocabularies sorted, ties broken lexicographically), so
encoded features hash-compare across engines and partitionings.

Vocabulary size is driver-resident by design (as in the reference);
``text_encoding_max_dimension`` caps it. For corpus-scale vocabularies
use the hashing-trick tokenizers in ``functions/text.py`` instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tokens = non-empty runs of [a-z0-9] after lowercasing — replicable in
#: DuckDB as regexp_split_to_array(lower(x), '[^a-z0-9]+') + non-empty
TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(col.cast("string")), TOKEN_SPLIT), lambda t: t != ""
    )


@dataclass
class _PropEncoder:
    kind: str  # category | text | numeric
    vocab: list[str] = field(default_factory=list)
    idf: list[float] = field(default_factory=list)
    mean: float = 0.0
    std: float = 1.0

    @property
    def dim(self) -> int:
        return 1 if self.kind == "numeric" else len(self.vocab)


class SparkPGEncoder:
    """fit / transform / fit_transform over a :class:`SparkPGFrame`.

    ``node_properties`` / ``edge_properties``: the properties to encode
    (default: all properties with a known type). Property kinds come from
    the frame's type metadata (category/text/numeric — reference §1.2).
    ``transform`` returns a new frame whose nodes (and edges, if edge
    properties were requested) carry a ``features array<double>`` column —
    the reference's concatenated feature vector, in sorted property order.
    """

    def __init__(
        self,
        node_properties: list[str] | None = None,
        edge_properties: list[str] | None = None,
        text_encoding_max_dimension: int = 128,
        standardize_numeric: bool = True,
        category_max_dimension: int = 10_000,
    ):
        self.node_properties = node_properties
        self.edge_properties = edge_properties
        self.max_dim = int(text_encoding_max_dimension)
        # hard cap on a category property's driver-resident vocabulary
        # (the fit would otherwise collect() an unbounded distinct set)
        self.category_max_dimension = int(category_max_dimension)
        self.standardize_numeric = standardize_numeric
        self._node_encoders: dict[str, _PropEncoder] = {}
        self._edge_encoders: dict[str, _PropEncoder] = {}

    # ------------------------------------------------------------- fit

    def _fit_prop(self, df: DataFrame, prop: str, kind: str) -> _PropEncoder:
        if kind == "category":
            is_arr = dict(df.dtypes)[prop].startswith("array")
            vals = (
                df.select(F.explode(prop).alias("_v"))
                if is_arr
                else df.select(F.col(prop).cast("string").alias("_v"))
            )
            # Loud gate (engine contract — same shape as the centrality
            # bridge): a category property with an unbounded value domain
            # (user ids, URLs) would otherwise collect an arbitrarily large
            # vocabulary to the driver. limit(cap+1) bounds the job AND the
            # transfer before anything melts.
            cap = self.category_max_dimension
            rows = (
                vals.filter(F.col("_v").isNotNull())
                .distinct()
                .limit(cap + 1)
                .collect()
            )
            if len(rows) > cap:
                raise ValueError(
                    f"category property {prop!r} has more than "
                    f"{cap} distinct values; category encoding is "
                    "one-hot over a driver-resident vocabulary — raise "
                    "category_max_dimension explicitly, or encode the "
                    "property as text (capped TF-IDF) instead"
                )
            vocab = sorted(r["_v"] for r in rows)
            return _PropEncoder("category", vocab=vocab)
        if kind == "text":
            toks = df.select(
                F.monotonically_increasing_id().alias("_doc"),
                F.array_distinct(_tokens(F.col(prop))).alias("_t"),
            )
            n_docs = df.count()
            dfreq = (
                toks.select(F.explode("_t").alias("_v"))
                .groupBy("_v")
                .agg(F.count("*").alias("_df"))
                .orderBy(F.col("_df").desc(), F.col("_v"))
                .limit(self.max_dim)
                .collect()
            )
            # vocabulary order: sorted terms (sklearn's convention);
            # selection: top max_dim by (document frequency desc, term)
            chosen = sorted((r["_v"], r["_df"]) for r in dfreq)
            vocab = [t for t, _ in chosen]
            idf = [
                round(math.log((1.0 + n_docs) / (1.0 + d)) + 1.0, 12)
                for _, d in chosen
            ]
            return _PropEncoder("text", vocab=vocab, idf=idf)
        if kind == "numeric":
            row = df.agg(
                F.avg(F.col(prop).cast("double")).alias("m"),
                F.avg(
                    F.col(prop).cast("double") * F.col(prop).cast("double")
                ).alias("q"),
            ).first()
            m = float(row["m"] or 0.0)
            var = float(row["q"] or 0.0) - m * m
            s = round(math.sqrt(var), 12) if var > 0 else 1.0
            return _PropEncoder(
                "numeric", mean=round(m, 12), std=s if s > 0 else 1.0
            )
        raise ValueError(f"unknown property kind {kind!r}")

    def fit(self, pg) -> "SparkPGEncoder":
        nprops = self.node_properties or [
            p for p in pg.node_properties() if p in pg._node_prop_types
        ]
        for p in nprops:
            self._node_encoders[p] = self._fit_prop(
                pg._nodes, p, pg._node_prop_types[p]
            )
        eprops = self.edge_properties or []
        for p in eprops:
            self._edge_encoders[p] = self._fit_prop(
                pg._edges, p, pg._edge_prop_types[p]
            )
        return self

    # ------------------------------------------------------- transform

    @staticmethod
    def _encode_col(df_dtypes: dict, prop: str, enc: _PropEncoder) -> Column:
        col = F.col(prop)
        if enc.kind == "category":
            vocab = F.array(*[F.lit(v) for v in enc.vocab])
            if df_dtypes[prop].startswith("array"):
                member = lambda v: F.array_contains(
                    F.coalesce(col, F.array()), v
                )
            else:
                member = lambda v: col.cast("string") == v
            return F.transform(
                vocab,
                lambda v: F.when(member(v), F.lit(1.0)).otherwise(F.lit(0.0)),
            )
        if enc.kind == "text":
            toks = _tokens(F.coalesce(col, F.lit("")))
            vocab = F.array(*[F.lit(v) for v in enc.vocab])
            idf = F.array(*[F.lit(w) for w in enc.idf])
            tf = F.transform(
                vocab,
                lambda v: F.size(F.filter(toks, lambda t: t == v)).cast(
                    "double"
                ),
            )
            raw = F.zip_with(tf, idf, lambda a, b: a * b)
            norm = F.sqrt(
                F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
            )
            return F.when(
                norm > 0.0,
                F.transform(raw, lambda x: F.round(x / norm, 12)),
            ).otherwise(raw)
        # numeric: impute missing with the fitted mean, then standardize
        x = F.coalesce(col.cast("double"), F.lit(enc.mean))
        return F.array(
            F.round((x - F.lit(enc.mean)) / F.lit(enc.std), 12)
        )

    def _transform_df(
        self, df: DataFrame, encoders: dict[str, _PropEncoder]
    ) -> DataFrame:
        dtypes = dict(df.dtypes)
        feats = [
            self._encode_col(dtypes, p, encoders[p])
            for p in sorted(encoders)
        ]
        out = feats[0]
        for f in feats[1:]:
            out = F.concat(out, f)
        return df.withColumn("features", out)

    def transform(self, pg):
        from bluegraph_spark.pgframe import SparkPGFrame

        nodes = (
            self._transform_df(pg._nodes, self._node_encoders)
            if self._node_encoders
            else pg._nodes
        )
        edges = (
            self._transform_df(pg._edges, self._edge_encoders)
            if self._edge_encoders
            else pg._edges
        )
        return SparkPGFrame(nodes, edges, directed=pg.directed)

    def fit_transform(self, pg):
        return self.fit(pg).transform(pg)

    @property
    def feature_dim(self) -> int:
        return sum(e.dim for e in self._node_encoders.values())
