"""Dedup + similarity operators: exact small-case semantics and oracles."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from bluegraph_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    simhash_pairs,
)
from bluegraph_spark.operators.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    ivf_fit_centroids,
    lsh_cosine_topk,
)


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (4, "completely different words entirely here now folks"),
    (5, "the quick brown fox leaps over the lazy dog"),
]


def py_shingles(text, n=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_jaccard(a, b, n=3):
    sa, sb = py_shingles(a, n), py_shingles(b, n)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    groups = {r.keep_id: r for r in exact_duplicates(docs, "doc_id", "text").collect()}
    dup = [r for r in groups.values() if r.n_copies > 1]
    assert len(dup) == 1 and dup[0].ids == [1, 3]


def test_jaccard_pairs_exact(spark, docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        want = py_jaccard(ta, tb)
        if want > 0:
            assert got[(ia, ib)] == pytest.approx(want, abs=1e-12)
        else:
            assert (ia, ib) not in got


def test_minhash_finds_exact_dup_and_verifies(spark, docs):
    cands = {
        (r.id_a, r.id_b) for r in minhash_lsh_candidates(docs, "doc_id", "text").collect()
    }
    assert (1, 3) in cands  # identical docs always collide in every band
    verified = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert verified[(1, 3)] == pytest.approx(1.0)
    for (a, b), j in verified.items():
        assert j == pytest.approx(py_jaccard(DOCS[a - 1][1], DOCS[b - 1][1]), abs=1e-12)


def test_simhash_near_dups(spark, docs):
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=16, chunks=17
        ).collect()
    }
    assert got.get((1, 3)) == 0  # identical => identical signatures
    assert (1, 4) not in got or got[(1, 4)] > 12  # unrelated docs are far


def test_simhash_rejects_incomplete_banding(spark, docs):
    """chunks <= max_hamming can silently miss valid near-dup pairs
    (pigeonhole no longer guarantees a shared block) — must refuse."""
    with pytest.raises(ValueError, match="must exceed max_hamming"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=4, chunks=4)


def test_simhash_plan_is_pure_catalyst(spark, docs):
    """Engine UDF policy regression guard: the simhash pipeline must contain
    no Python evaluation nodes (the round-1 kernel was a per-row Python
    loop dressed as a pandas UDF)."""
    plan = (
        simhash_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_simhash_banding_equivalence(spark, docs):
    """Every pigeonhole-complete banding (chunks > max_hamming) verifies the
    same pair set — the Manku combination keys change bucket geometry only."""
    base = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3, chunks=4).collect()
    }
    for chunks in (5, 6, 8):
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_pairs(
                docs, "doc_id", "text", max_hamming=3, chunks=chunks
            ).collect()
        }
        assert got == base, chunks


def rng_vectors(n, dim=16, seed=7):
    """Clustered vectors: LSH recall is only meaningful when true neighbors
    are actually close (random gaussians are near-orthogonal by design)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, dim))
    out = []
    for i in range(n):
        c = centers[i % 8]
        out.append((i, (c + 0.15 * rng.normal(size=dim)).astype("float32").tolist()))
    return out


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.createDataFrame(
        rng_vectors(40), "vec_id long, embedding array<float>"
    )


def py_topk(vecs, k):
    arr = {i: np.array(v, dtype=np.float64) for i, v in vecs}
    out = {}
    for i in arr:
        sims = sorted(
            (
                (-float(arr[i] @ arr[j] / (np.linalg.norm(arr[i]) * np.linalg.norm(arr[j]))), j)
                for j in arr
                if j != i
            ),
        )[:k]
        out[i] = [(j, -s) for s, j in sims]
    return out


def test_cosine_topk_exact(spark, vectors):
    got = {}
    for r in cosine_topk(vectors, vectors, 3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    want = py_topk(rng_vectors(40), 3)
    for q, rows in got.items():
        rows.sort()
        for (rank, nid, cos), (wnid, wcos) in zip(rows, want[q]):
            assert nid == wnid
            assert cos == pytest.approx(wcos, abs=1e-9)


def test_lsh_recall_floor_at_defaults(spark, vectors):
    """recall@5 ≥ 0.8 at the DEFAULT planes/tables/multiprobe on clustered
    vectors (the regime LSH is for: true neighbors actually close)."""
    exact = py_topk(rng_vectors(40), 5)
    approx = {}
    for r in lsh_cosine_topk(vectors, vectors, 5, dim=16).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(approx.get(q, set()) & {j for j, _ in exact[q]}) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.8


def test_ivf_recall_floor(spark, vectors):
    """IVF probe of 2/8 cells on clustered vectors: recall@5 ≥ 0.8, exact
    cosines inside probed cells, deterministic codebook."""
    exact = py_topk(rng_vectors(40), 5)
    cents = ivf_fit_centroids(vectors, n_centroids=8, dim=16)
    assert cents == ivf_fit_centroids(vectors, n_centroids=8, dim=16)
    approx = {}
    cos = {}
    for r in ivf_cosine_topk(vectors, vectors, 5, centroids=cents, nprobe=2, dim=16).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        cos[(r.query_id, r.neighbor_id)] = r.cosine
    hits = sum(len(approx.get(q, set()) & {j for j, _ in exact[q]}) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.8
    # returned cosines are exact (verified in-cell), not approximations
    truth = dict()
    for q2, lst in exact.items():
        for j, c in lst:
            truth[(q2, j)] = c
    for pair, c in cos.items():
        if pair in truth:
            assert c == pytest.approx(truth[pair], abs=1e-9)


def test_duplicate_groups_composition(spark):
    """Pair→group resolution via connected components: chains collapse to
    one group labeled by the min id; singletons keep themselves."""
    from bluegraph_spark.operators.dedup import duplicate_groups

    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    got = {r.id: r.keep_id for r in duplicate_groups(pairs, ids=ids).collect()}
    assert got == {1: 1, 3: 1, 5: 1, 2: 2, 4: 2, 6: 6}


def test_embedding_dedup_pairs_exact_verify_and_recall(spark, vectors):
    """Embedding-cosine near-dup: every returned pair is a true near-dup
    with the exact cosine, and recall ≥ 0.8 on clustered vectors at a
    bucket-friendly configuration."""
    from bluegraph_spark.operators.dedup import embedding_dedup_pairs

    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dedup_pairs(
            vectors, threshold=0.8, planes=6, tables=4, dim=16
        ).collect()
    }
    arr = {i: np.array(v, dtype=np.float64) for i, v in rng_vectors(40)}

    def cos(i, j):
        return float(
            arr[i] @ arr[j] / (np.linalg.norm(arr[i]) * np.linalg.norm(arr[j]))
        )

    truth = {
        (i, j): cos(i, j)
        for i in arr
        for j in arr
        if i < j and cos(i, j) >= 0.8
    }
    assert truth, "fixture must contain near-dup pairs"
    for (i, j), c in got.items():
        assert (i, j) in truth
        assert c == pytest.approx(truth[(i, j)], abs=1e-9)
    assert len(got) / len(truth) >= 0.8


def test_multiprobe_distance_honored(spark):
    """multiprobe=d must probe every bucket within Hamming distance d, not
    just distance 1 (ADVICE r2: the knob silently bought nothing above 1)."""
    from math import comb

    from bluegraph_spark.operators.similarity import _probe_buckets

    planes = 5
    sig = spark.createDataFrame([("x", "10110")], "id string, bucket string")
    for mp in (1, 2, 3):
        got = {r.bucket for r in _probe_buckets(sig, planes, mp).collect()}
        assert len(got) == sum(comb(planes, d) for d in range(mp + 1))
        assert all(
            sum(a != b for a, b in zip(bk, "10110")) <= mp for bk in got
        )


def test_lsh_candidate_starvation_warnings(spark, vectors):
    """The flat-spectrum footgun must announce itself: both the analytic
    (corpus_size) check and the measured lsh_candidate_report warn when a
    configuration cannot feed top-k ranking enough candidates."""
    from math import comb

    from bluegraph_spark.operators.similarity import (
        lsh_candidate_report,
        lsh_expected_candidate_fraction,
    )

    # expected-fraction math: (1 + sum C(p,d)) * tables / 2^p, capped at 1
    assert lsh_expected_candidate_fraction(8, 2, 1) == pytest.approx(
        2 * (1 + 8) / 256
    )
    assert lsh_expected_candidate_fraction(2, 9, 2) == 1.0
    assert lsh_expected_candidate_fraction(12, 3, 2) == pytest.approx(
        3 * (1 + 12 + comb(12, 2)) / 4096
    )

    # analytic warning: 16 planes / 1 table / no probes over a 40-vec corpus
    with pytest.warns(UserWarning, match="candidate-starved"):
        lsh_cosine_topk(
            vectors, vectors, 5, dim=16, planes=16, tables=1, multiprobe=0,
            corpus_size=40,
        )
    # measured warning + report fields
    with pytest.warns(UserWarning, match="candidate-starved"):
        rep = lsh_candidate_report(
            vectors, vectors, 5, dim=16, planes=16, tables=1, multiprobe=0
        )
    assert not rep["ok"] and rep["n_corpus"] == 40
    # a healthy configuration neither warns nor flags
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        rep = lsh_candidate_report(
            vectors, vectors, 5, dim=16, planes=4, tables=4, multiprobe=1
        )
    assert rep["ok"] and rep["candidate_fraction"] >= rep["floor_fraction"]


def test_lsh_recall_reasonable(spark, vectors):
    exact = py_topk(rng_vectors(40), 3)
    approx = {}
    for r in lsh_cosine_topk(vectors, vectors, 3, planes=8, tables=4).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(approx.get(q, set()) & {j for j, _ in exact[q]}) for q in exact
    )
    total = sum(len(exact[q]) for q in exact)
    assert hits / total > 0.5  # approximate path finds most true neighbors
    # and every returned cosine is exact (verified in-bucket)
    for r in lsh_cosine_topk(vectors, vectors, 1, planes=8, tables=4).collect():
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_incremental_equals_batch_subset_of_full_run(spark, docs):
    """The incremental contract: minhash_dedup_incremental(batch vs indexed
    corpus) must equal the batch-involving subset of the one-shot
    minhash_dedup_pairs over corpus ∪ batch — same knobs, same verified
    jaccard values. This is what makes index reuse trustworthy."""
    from bluegraph_spark.operators.dedup import (
        minhash_band_index,
        minhash_dedup_incremental,
        minhash_dedup_pairs,
    )

    split = docs.agg(F.expr("percentile(doc_id, 0.6)").cast("long")).collect()[0][0]
    corpus = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split)
    knobs = dict(n=3, num_hashes=8, bands=4)

    full = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.2, **knobs)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10))
        for r in full.collect()
        if r["id_a"] in batch_ids or r["id_b"] in batch_ids
    }

    index = minhash_band_index(corpus, "doc_id", "text", **knobs)
    inc = minhash_dedup_incremental(
        batch, corpus, index, "doc_id", "text", threshold=0.2, **knobs
    )
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10)) for r in inc.collect()
    }
    assert got == want
    assert want, "fixture must produce at least one batch-involving pair"


def test_incremental_index_reuse_no_corpus_pairs(spark, docs):
    """corpus-vs-corpus pairs never appear (they were resolved when the
    index was built)."""
    from bluegraph_spark.operators.dedup import (
        minhash_band_index,
        minhash_dedup_incremental,
    )

    split = docs.agg(F.expr("percentile(doc_id, 0.6)").cast("long")).collect()[0][0]
    corpus = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split)
    index = minhash_band_index(corpus, "doc_id", "text")
    inc = minhash_dedup_incremental(
        batch, corpus, index, "doc_id", "text", threshold=0.0
    )
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    for r in inc.collect():
        assert r["id_a"] in batch_ids or r["id_b"] in batch_ids


class TestVectorMetrics:
    """Poincaré / Wasserstein / KL column kernels (reference
    downstream/similarity.py:41-66) vs pure-Python replicas."""

    def test_metrics_match_pure_python(self, spark):
        import math

        from pyspark.sql import functions as F

        from bluegraph_spark.functions.vector import (
            kl_divergence_col,
            poincare_distance_col,
            wasserstein_1d_col,
        )

        cases = [
            ([0.1, 0.2, 0.05, 0.3], [0.2, 0.1, 0.15, 0.25]),
            ([0.4, 0.1], [0.1, 0.4]),
            ([0.25, 0.25, 0.25], [0.25, 0.25, 0.25]),  # identical: all 0
        ]
        df = spark.createDataFrame(cases, "u array<double>, v array<double>")
        rows = df.select(
            "u", "v",
            poincare_distance_col(F.col("u"), F.col("v")).alias("p"),
            wasserstein_1d_col(F.col("u"), F.col("v")).alias("w"),
            kl_divergence_col(F.col("u"), F.col("v")).alias("k"),
        ).collect()
        for r in rows:
            u, v = list(r.u), list(r.v)
            nu = sum(x * x for x in u)
            nv = sum(x * x for x in v)
            d2 = sum((a - b) ** 2 for a, b in zip(u, v))
            p_want = math.acosh(1 + 2 * d2 / ((1 - nu) * (1 - nv)))
            su, sv = sum(u), sum(v)
            cu = cv = w_want = 0.0
            for a, b in zip(u, v):
                cu += a / su
                cv += b / sv
                w_want += abs(cu - cv)
            k_want = sum(
                (a / su) * math.log((a / su) / (b / sv))
                for a, b in zip(u, v)
                if a > 0
            )
            assert r.p == pytest.approx(p_want, abs=1e-12)
            assert r.w == pytest.approx(w_want, abs=1e-12)
            assert r.k == pytest.approx(k_want, abs=1e-12)

    def test_kl_conventions(self, spark):
        from pyspark.sql import functions as F

        from bluegraph_spark.functions.vector import kl_divergence_col

        df = spark.createDataFrame(
            [
                ([0.5, 0.5], [1.0, 0.0]),  # u>0 where v=0 -> inf
                ([1.0, 0.0], [0.5, 0.5]),  # u=0 term contributes 0
            ],
            "u array<double>, v array<double>",
        )
        got = [r.k for r in df.select(
            kl_divergence_col(F.col("u"), F.col("v")).alias("k")).collect()]
        import math
        assert got[0] == float("inf")
        assert got[1] == pytest.approx(1.0 * math.log(1.0 / 0.5), abs=1e-12)
