"""Round-4 fixes, pinned:

- the embedding sign-LSH bucket cap (r3 verdict "What's wrong #1": the
  minhash hot-bucket bound extended to cosine_pairs_lsh / ann_bucket_pairs
  — the last uncapped m² joins in the dedup surface), with its overflow
  visibility companion;
- the simhash chunk-bucket cap and the widened default chunk space
  (r3 verdict "What's wrong #2").
"""

from __future__ import annotations


def _mega_emb(spark, n=60, dim=64):
    """n vectors with IDENTICAL embeddings (→ same bucket in EVERY band —
    the population LSH cannot spread) plus one negated outlier (all sign
    bits flip → complement bucket, never equal for any band width)."""
    vec = [1.0 if i % 2 == 0 else -1.0 for i in range(dim)]
    rows = [(i, vec) for i in range(n)]
    rows.append((1000, [-v for v in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_pairs_lsh_cap_bounds_mega_bucket(spark):
    from docling_spark.operators.similarity import cosine_pairs_lsh

    n = 60
    emb = _mega_emb(spark, n)
    capped = cosine_pairs_lsh(emb, threshold=0.9, max_bucket=8).collect()
    # 6 bands, every band keeps the same 8 smallest-id representatives →
    # distinct pairs = C(8,2) = 28, never C(60,2) = 1770
    assert len(capped) == 28
    assert {r.id_a for r in capped} | {r.id_b for r in capped} \
        == set(range(8))
    assert all(r.cos == 1.0 for r in capped)

    uncapped = cosine_pairs_lsh(emb, threshold=0.9, max_bucket=None)
    assert uncapped.count() == n * (n - 1) // 2


def test_embedding_bucket_overflow_surfaces_drops(spark):
    from docling_spark.operators.similarity import embedding_bucket_overflow

    n = 60
    over = embedding_bucket_overflow(_mega_emb(spark, n),
                                     max_bucket=8).collect()
    # exactly one overflowing bucket per band (the 60 identical vectors);
    # the lone negated outlier never overflows
    assert len(over) == 6
    assert sorted(r.band for r in over) == list(range(6))
    assert all(r.n_vecs == n and r.n_dropped == n - 8 for r in over)


def test_ann_bucket_pairs_cap_bounds_mega_bucket(spark):
    from docling_spark.operators.similarity import ann_bucket_pairs

    n = 60
    emb = _mega_emb(spark, n)
    capped = ann_bucket_pairs(emb, threshold=0.5, max_bucket=8).collect()
    assert len(capped) == 28
    assert {r.id_a for r in capped} | {r.id_b for r in capped} \
        == set(range(8))

    uncapped = ann_bucket_pairs(emb, threshold=0.5, max_bucket=None)
    assert uncapped.count() == n * (n - 1) // 2


def test_capped_lsh_pairs_subset_of_uncapped_on_real_corpus(spark, sf_dir):
    """On the sf corpus the cap must only ever REMOVE pairs (members
    65+ of hot buckets) — identical scores for every surviving pair."""
    from docling_spark.operators.similarity import cosine_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    capped = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_pairs_lsh(emb, threshold=0.45, max_bucket=64).collect()
    }
    uncapped = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_pairs_lsh(emb, threshold=0.45,
                                  max_bucket=None).collect()
    }
    assert set(capped) <= set(uncapped)
    for k, v in capped.items():
        assert v == uncapped[k]


# ------------------------------------------------------- simhash bounds

def _mega_docs(spark, n=60):
    """n byte-identical docs (identical simhash → same chunk value in
    every chunk — the bucket population pigeonholing cannot spread) plus
    one genuinely different doc."""
    rows = [(i, "the same boilerplate template text repeated verbatim "
                "across the whole scraped mirror set") for i in range(n)]
    rows.append((1000, "a genuinely different document about other things"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_chunk_cap_bounds_mega_bucket(spark):
    from docling_spark.operators.dedup import simhash, simhash_near_pairs

    n = 60
    sim = simhash(_mega_docs(spark, n))
    capped = simhash_near_pairs(sim, max_hamming=3, chunks=4,
                                max_bucket=8).collect()
    # 4 chunks, every chunk keeps the same 8 smallest-doc_id
    # representatives → distinct pairs = C(8,2) = 28, never C(60,2) = 1770
    assert len(capped) == 28
    assert {r.doc_a for r in capped} | {r.doc_b for r in capped} \
        == set(range(8))
    assert all(r.hamming == 0 for r in capped)

    uncapped = simhash_near_pairs(sim, max_hamming=3, chunks=4,
                                  max_bucket=None)
    assert uncapped.count() == n * (n - 1) // 2


def test_simhash_chunk_overflow_surfaces_drops(spark):
    from docling_spark.operators.dedup import simhash, simhash_chunk_overflow

    n = 60
    sim = simhash(_mega_docs(spark, n))
    over = simhash_chunk_overflow(sim, chunks=4, max_bucket=8).collect()
    # exactly one overflowing bucket per chunk (the identical docs); the
    # lone different doc never overflows
    assert len(over) == 4
    assert sorted(r.chunk_id for r in over) == list(range(4))
    assert all(r.n_docs == n and r.n_dropped == n - 8 for r in over)


def test_simhash_width_guard():
    import pytest

    from docling_spark.operators.dedup import simhash

    with pytest.raises(ValueError):
        simhash(None, bits=61)  # hash60 has no bit 60


# ------------------------------------------- r4 curation operators

def test_bloom_no_false_negatives_and_low_fp(spark):
    from docling_spark.operators.dedup import bloom_build, bloom_check

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some words {i * 7}")
         for i in range(200)],
        "doc_id long, text string")
    corpus = docs.filter("doc_id < 100")
    bloom = bloom_build(corpus, m_bits=1 << 16, k=4)
    got = {r.doc_id: r.maybe_dup
           for r in bloom_check(docs, bloom, m_bits=1 << 16, k=4).collect()}
    # members are ALWAYS flagged (no false negatives)
    assert all(got[i] for i in range(100))
    # non-members: false-positive rate far under the load factor's bound
    fps = sum(1 for i in range(100, 200) if got[i])
    assert fps <= 5


def test_bloom_filter_is_constant_size(spark):
    from docling_spark.operators.dedup import bloom_build

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id long, text string")
    assert bloom_build(docs, m_bits=1 << 16, k=4).count() <= (1 << 16) / 32


def test_ccnet_buckets_terciles(spark):
    from docling_spark.operators.textstats import ccnet_buckets

    docs = spark.createDataFrame(
        [(i, ("common words repeated " * 5) if i % 3 == 0
          else f"rare{i} unusual{i} singleton{i} tokens{i}")
         for i in range(90)] + [(1000, None)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in ccnet_buckets(docs).collect()}
    assert len(rows) == 91
    # the empty doc has NULL ppl and lands in tail
    assert rows[1000].ppl is None and rows[1000].bucket == "tail"
    # common-word docs are low-perplexity → head
    assert all(rows[i].bucket == "head" for i in range(0, 90, 3))
    counts = {}
    for r in rows.values():
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    assert counts["head"] == 30


def test_line_perplexity_totality(spark):
    from docling_spark.operators.textstats import line_perplexity

    docs = spark.createDataFrame(
        [(1, "first line\n\nthird line here"), (2, None)],
        "doc_id long, text string")
    rows = {(r.doc_id, r.line_no): r for r in line_perplexity(docs).collect()}
    # every physical line present, including the empty and the null doc
    assert set(rows) == {(1, 0), (1, 1), (1, 2), (2, 0)}
    assert rows[(1, 1)].ppl is None and rows[(1, 1)].n_tokens == 0
    assert rows[(2, 0)].ppl is None
    assert rows[(1, 2)].n_tokens == 3 and rows[(1, 2)].ppl is not None
