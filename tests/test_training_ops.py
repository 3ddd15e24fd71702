"""Unit tests for the training-data operators added on top of the
extraction engine: chunkers, multimodal plumbing, candidate-confined
jaccard, simhash banding guarantees, and ANN bucket recall."""

import pytest
from pyspark.sql import functions as F

from docling_spark.operators.chunker import (
    fixed_token_chunks,
    heading_contextual_chunks,
)
from docling_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_pairs,
)
from docling_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
    synth_media_df,
)
from docling_spark.operators.similarity import (
    ann_topk_lsh,
    ivf_assign,
    ivf_topk,
    topk_cosine,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),
        (2, "one two three"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fixed_token_chunks(docs):
    out = fixed_token_chunks(docs, chunk_tokens=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [c.chunk_text for c in sorted(by_doc[0], key=lambda r: r.chunk_idx)] == [
        "alpha beta gamma", "delta epsilon zeta", "eta theta",
    ]
    assert [c.n_tokens for c in sorted(by_doc[0], key=lambda r: r.chunk_idx)] == [3, 3, 2]
    assert by_doc[2][0].chunk_text == "one two three"
    assert 3 not in by_doc  # empty text -> no chunks


def test_fixed_token_chunks_overlap(docs):
    out = fixed_token_chunks(docs.filter("doc_id = 0"), chunk_tokens=4,
                             overlap=2).collect()
    texts = [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_idx)]
    assert texts[0] == "alpha beta gamma delta"
    assert texts[1] == "gamma delta epsilon zeta"
    # windows advance by 2 until tokens are exhausted
    assert all(t for t in texts)


def test_heading_contextual_chunks(spark):
    items = spark.createDataFrame(
        [
            (1, 0, "unspecified", "_root_", "body"),
            (1, 1, "title", "Intro", "body"),
            (1, 2, "text", "first para", "body"),
            (1, 3, "section_header", "Methods", "body"),
            (1, 4, "text", "second para", "body"),
            (1, 5, "text", "footer junk", "furniture"),
        ],
        "doc_id long, item_idx int, label string, text string, content_layer string",
    )
    out = heading_contextual_chunks(items).collect()
    got = [(r.chunk_idx, r.heading, r.chunk_text) for r in
           sorted(out, key=lambda r: r.chunk_idx)]
    assert got == [(0, "Intro", "first para"), (1, "Methods", "second para")]


def test_jaccard_candidate_path_matches_full(spark):
    # docs 0/1: 11 of 13 shingles shared (J = 0.846) — under the fixed
    # mh_consts seed family they agree on band 1, so the LSH path must
    # surface the pair (deterministic: data and seeds are both fixed)
    near = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu omega"),
            (2, "one two three"),
        ],
        "doc_id long, text string",
    )
    sh = shingles(near)
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(sh, threshold=0.1).collect()
    }
    cands = lsh_candidate_pairs(minhash_signatures(sh, 8), 8, band_size=2)
    confined = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(sh, threshold=0.1, candidates=cands).collect()
    }
    # candidate path must agree with the full path on every pair it emits,
    # and the near-identical docs 0/1 must be found
    assert (0, 1) in confined
    for pair, j in confined.items():
        assert full[pair] == j


def test_lsh_bucket_cap_bounds_mega_bucket(spark):
    """A planted mega-bucket (60 docs with IDENTICAL text → identical
    signatures → same bucket in every band) must produce a bounded pair
    count under the cap — max_bucket² per bucket instead of 60² — and the
    overflow companion must surface exactly what was dropped."""
    from docling_spark.operators.dedup import lsh_bucket_overflow

    n = 60
    rows = [(i, "the same boilerplate template text repeated verbatim "
                "across the whole scraped mirror set") for i in range(n)]
    rows.append((1000, "a genuinely different document about other things"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(shingles(docs), 8)

    capped = lsh_candidate_pairs(sigs, 8, band_size=2, max_bucket=8)
    pairs = capped.collect()
    # 4 bands, every band is the same 8 representatives (smallest doc_ids,
    # deterministic) → distinct pairs = C(8,2) = 28, never C(60,2) = 1770
    assert len(pairs) == 28
    assert {p.doc_a for p in pairs} | {p.doc_b for p in pairs} == set(range(8))

    uncapped = lsh_candidate_pairs(sigs, 8, band_size=2, max_bucket=None)
    assert uncapped.count() == n * (n - 1) // 2

    over = lsh_bucket_overflow(sigs, 8, band_size=2, max_bucket=8).collect()
    # every one of the 4 bands has exactly one overflowing bucket
    assert len(over) == 4
    assert all(r.n_docs == n and r.n_dropped == n - 8 for r in over)


def test_connected_components_chain_and_island(spark):
    from docling_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3) + island 10-11
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_simhash_near_pairs_guard(docs):
    sim = simhash(docs)
    with pytest.raises(ValueError):
        simhash_near_pairs(sim, max_hamming=4, chunks=4)


def test_simhash_banding_exact(spark):
    # identical docs -> hamming 0 pair must be found by the banded join
    rows = [(i, "the quick brown fox jumps") for i in range(2)] + [
        (2, "totally different content here now")
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_near_pairs(simhash(d), max_hamming=3, chunks=4).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    assert pairs.get((0, 1)) == 0


def test_media_features_schema_and_determinism(spark):
    media = synth_media_df(spark, n=12)
    out = extract_media_features(media, feature_dim=4)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 12
    img = next(r for r in rows.values() if r.kind == "image")
    assert 64 <= img.width < 64 + 1920
    assert len(img.feature) == 4
    aud = next(r for r in rows.values() if r.kind == "audio")
    assert aud.width is None
    # deterministic: second run identical
    again = {r.media_id: r for r in out.collect()}
    assert all(rows[k].digest == again[k].digest for k in rows)


def test_frame_sample_plan(spark):
    media = synth_media_df(spark, n=9).withColumn(
        "meta", F.create_map(F.lit("duration_s"), F.lit("8"))
    )
    out = frame_sample_plan(media, fps=0.5).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_ts)
    # videos are ids 2,5,8; 8s at 0.5fps -> frames at 0.0 and 2.0... int(8*0.5)=4
    assert set(by_id) == {2, 5, 8}
    assert sorted(by_id[2]) == [0.0, 2.0, 4.0, 6.0]


def test_ivf_assign_and_topk_recall(spark):
    import math
    import random

    rng = random.Random(11)
    dim = 16

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # two well-separated clusters; centroids (ids 0..1) are one from each
    a = unit([rng.gauss(0, 1) for _ in range(dim)])
    b = unit([-x for x in a])  # antipodal

    def jitter(base, eps=0.05):
        return unit([x + rng.gauss(0, eps) for x in base])

    rows = [(0, jitter(a)), (1, jitter(b))] + [
        (10 + i, jitter(a)) for i in range(20)
    ] + [(100 + i, jitter(b)) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    assigned = {r.vec_id: r.centroid_id
                for r in ivf_assign(emb, n_centroids=2).collect()}
    for vid, cid in assigned.items():
        expect = 0 if (vid == 0 or 10 <= vid < 100) else 1
        assert cid == expect, (vid, cid)

    exact = [r.vec_id for r in topk_cosine(emb, a, k=5).collect()]
    approx = [r.vec_id for r in
              ivf_topk(emb, a, k=5, n_centroids=2, n_probe=1).collect()]
    assert len(set(exact) & set(approx)) >= 4


def test_ann_lsh_recall_vs_bruteforce(spark):
    import math
    import random

    rng = random.Random(7)
    dim = 16
    base = [rng.gauss(0, 1) for _ in range(dim)]

    def jitter(eps):
        v = [b + rng.gauss(0, eps) for b in base]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [(i, jitter(0.05)) for i in range(20)] + [
        (100 + i, jitter(10.0)) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = jitter(0.0)
    exact = [r.vec_id for r in topk_cosine(emb, q, k=5).collect()]
    approx = [r.vec_id for r in
              ann_topk_lsh(emb, q, k=5, n_planes=6, dim=dim,
                           multiprobe_hamming=2).collect()]
    # near-cluster ids dominate both; require >= 4/5 agreement
    assert len(set(exact) & set(approx)) >= 4


def test_ann_topk_batch_recall_and_plan(spark):
    """Batch serving path: per-query top-k agrees with brute force on a
    separable corpus, the self-match ranks first, and the probe join is
    a hash equi-join (never a nested-loop bit_count theta-join)."""
    import math
    import random

    from docling_spark.operators.similarity import ann_topk_batch, topk_cosine

    rng = random.Random(11)
    dim = 16
    base = [rng.gauss(0, 1) for _ in range(dim)]

    def jitter(eps):
        v = [b + rng.gauss(0, eps) for b in base]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [(i, jitter(0.05)) for i in range(20)] + [
        (100 + i, jitter(10.0)) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[1][1])],
        "query_id long, embedding array<double>")
    out = ann_topk_batch(emb, queries, k=5, n_planes=6, dim=dim)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    for qid, vec in ((0, rows[0][1]), (1, rows[1][1])):
        approx = [v for _, v in sorted(got[qid])]
        assert approx[0] == qid  # self-match at rank 1
        exact = [r.vec_id for r in topk_cosine(emb, vec, k=5).collect()]
        assert len(set(exact) & set(approx)) >= 4
    from tests.planutils import formatted_plan

    plan = formatted_plan(spark, out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cosine_fast_null_embedding(spark):
    """A null embedding must yield a null score (like the JVM cosine
    expression), not crash the Arrow batch — and null, not NaN, so it
    can't win a descending rank (Spark orders NaN above all numbers)."""
    from docling_spark.operators.similarity import cosine_fast

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], [1.0, 0.0]),
         (1, None, [1.0, 0.0]),
         (2, [0.0, 1.0], None)],
        "i int, a array<double>, b array<double>",
    )
    got = {r.i: r.c for r in
           df.select("i", cosine_fast(F.col("a"), F.col("b"))
                     .alias("c")).collect()}
    assert got[0] == 1.0 and got[1] is None and got[2] is None


def test_linear_quality_score_custom_weights(spark):
    """The trained-model path: a caller-supplied weight vector changes
    scores deterministically; the whole plan stays JVM-side (no
    BatchEvalPython / ArrowEvalPython nodes)."""
    from docling_spark.operators.textstats import linear_quality_score

    df = spark.createDataFrame(
        [(1, "good good good"), (2, ""), (3, "mixed bag here")],
        "doc_id int, text string",
    )
    all_pos = linear_quality_score(df, dim=16, weights=[5.0] * 16)
    got = {r.doc_id: r for r in all_pos.collect()}
    assert got[1].score > 0.99 and got[1].keep == 1
    assert got[2].score == 0.5 and got[2].n_tokens == 0
    plan = all_pos._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_kmeans_codebook_separated_clusters(spark):
    """Two well-separated direction clusters, k=2: members split exactly
    and each trained centroid is the 6-dp per-dim mean of its members."""
    from docling_spark.operators.similarity import kmeans_codebook

    rows = [
        # ids 0,1 seed the two clusters (id-prefix init)
        (0, [10.0, 0.0, 0.1]), (1, [0.0, 10.0, 0.1]),
        (2, [9.0, 1.0, 0.0]), (3, [11.0, 0.5, 0.2]),
        (4, [1.0, 9.0, 0.0]), (5, [0.5, 11.0, 0.3]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["centroid_id"]: r for r in
           kmeans_codebook(emb, k=2, iters=2).collect()}
    assert out[0]["n_members"] == 3 and out[1]["n_members"] == 3
    c0 = [round(v, 6) for v in
          [(10.0 + 9.0 + 11.0) / 3, (0.0 + 1.0 + 0.5) / 3,
           (0.1 + 0.0 + 0.2) / 3]]
    c1 = [round(v, 6) for v in
          [(0.0 + 1.0 + 0.5) / 3, (10.0 + 9.0 + 11.0) / 3,
           (0.1 + 0.0 + 0.3) / 3]]
    assert [round(v, 6) for v in out[0]["cvec"]] == c0
    assert [round(v, 6) for v in out[1]["cvec"]] == c1


def test_kmeans_codebook_counts_cover_corpus(spark, sf_dir):
    """n_members across centroids partitions the corpus (every vector
    assigned exactly once)."""
    from docling_spark.operators.similarity import kmeans_codebook

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = kmeans_codebook(emb, k=4, iters=1).collect()
    assert sum(r["n_members"] for r in cb) == emb.count()
    assert len(cb) == 4


def test_ivf_topk_with_trained_codebook(spark, sf_dir):
    """train -> index -> serve loop: probing with the kmeans codebook
    returns k hits whose top result matches brute-force top-1 on this
    corpus (the query IS a corpus vector, so its own cluster holds it)."""
    from docling_spark.operators.similarity import (
        ivf_topk,
        kmeans_codebook,
        topk_cosine,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = kmeans_codebook(emb, k=4, iters=2).select("centroid_id", "cvec")
    qvec = [float(v) for v in emb.filter("vec_id = 42").collect()[0]["embedding"]]
    served = ivf_topk(emb, qvec, k=5, n_probe=2, codebook=cb).collect()
    brute = topk_cosine(emb, qvec, k=1).collect()
    assert len(served) == 5
    assert served[0]["vec_id"] == brute[0]["vec_id"] == 42


def test_pq_adc_recall_and_plan(spark, sf_dir):
    """PQ ADC top-10 must overlap the exact-L2 top-10 (compression, not
    nonsense) and the serving query must end in a distributed TakeOrdered,
    not a single-partition global sort."""
    from docling_spark.operators.similarity import _sq_l2, pq_adc_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    approx = pq_adc_topk(emb, query_id=0, m=8, dim=64, k=16, topk=10)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    got = [r["vec_id"] for r in approx.collect()]
    assert len(got) == 10
    assert got[0] == 0  # the query vector is its own nearest code word

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv"))
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", _sq_l2(
            F.col("embedding").cast("array<double>"), F.col("qv")).alias("d"))
        .orderBy("d", "vec_id").limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    # ADC is approximate, and the synthetic embeddings are near-random
    # (distance gaps at noise level, the hardest case for any quantizer —
    # measured overlap is 4/10 and k-invariant). Deterministic data +
    # deterministic operator, so a >=3 floor is stable, and the self-match
    # above is the hard guarantee.
    assert len(exact_ids & set(got)) >= 3


def test_pq_codes_shape(spark, sf_dir):
    from docling_spark.operators.similarity import pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    codes = pq_encode(emb, m=8, dim=64, k=16)
    assert codes.count() == n * 8  # one code per (vector, subspace)
    assert codes.filter((F.col("code") < 0) | (F.col("code") >= 16)).count() == 0
    # a codebook vector encodes to itself with zero distance
    self_rows = codes.filter(F.col("vec_id") == 3)
    assert all(r["code"] == 3 and r["dist2"] == 0.0
               for r in self_rows.collect())


class TestSimilarityRobustness:
    """Degenerate-embedding regression tests for the similarity review
    findings: a zero-norm, NULL, or ragged embedding must degrade (NULL
    score, dropped row) — never abort the job or corrupt the index."""

    def _emb(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_zero_norm_vector_does_not_abort_topk(self, spark):
        from docling_spark.operators.similarity import topk_cosine

        emb = self._emb(spark, [
            (0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.6, 0.8])])
        out = topk_cosine(emb, [1.0, 0.0], k=3).collect()
        ids = [r["vec_id"] for r in out]
        assert 0 in ids and 2 in ids  # real vectors rank

    def test_zero_norm_vector_does_not_abort_assign(self, spark):
        from docling_spark.operators.similarity import ivf_assign

        emb = self._emb(spark, [
            (0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0]),
            (3, [0.5, 0.5])])
        ivf_assign(emb, n_centroids=2).collect()  # must not raise

    def test_null_codebook_embedding_does_not_corrupt_pq(self, spark):
        from docling_spark.operators.similarity import pq_encode

        emb = self._emb(spark, [
            (0, [1.0, 0.0, 0.0, 1.0]), (1, None),
            (2, [0.0, 1.0, 1.0, 0.0]), (3, [1.0, 1.0, 0.0, 0.0])])
        codes = pq_encode(emb, m=2, dim=4, k=2).collect()
        # no vector may be assigned the null codebook entry (code 1 has
        # NULL centroid) with a NULL distance
        for r in codes:
            if r["dist2"] is None:
                raise AssertionError(f"null-dist assignment: {r}")

    def test_adc_requires_complete_lut(self, spark):
        from docling_spark.operators.similarity import pq_adc_topk

        emb = self._emb(spark, [
            (0, [1.0, 0.0, 0.0, 1.0]), (1, None),
            (2, [0.0, 1.0, 1.0, 0.0]), (3, [1.0, 1.0, 0.0, 0.0])])
        out = pq_adc_topk(emb, query_id=0, m=2, dim=4, k=2, topk=4).collect()
        assert all(r["adc_dist"] is not None for r in out)

    def test_ragged_embedding_does_not_crash_pair_kernel(self, spark):
        from pyspark.sql import functions as F

        from docling_spark.operators.similarity import cosine_fast

        df = spark.createDataFrame(
            [([1.0, 0.0], [1.0, 0.0]),
             ([1.0, 0.0, 5.0], [1.0, 0.0]),   # ragged left
             ([0.0, 0.0], [1.0, 0.0])],       # zero norm
            "a array<double>, b array<double>")
        rows = df.select(cosine_fast(F.col("a"), F.col("b"))
                         .alias("s")).collect()
        assert rows[0]["s"] == 1.0
        assert rows[1]["s"] is None
        assert rows[2]["s"] is None
