"""Curation operators: decontamination, PII scrub, repetition stats,
deterministic stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_spark.operators.curation import (
    decontaminate,
    dup_line_fraction,
    scrub_pii,
    strat_key,
    stratified_sample,
    top_bigram_stats,
)


def test_decontaminate_removes_overlapping_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "totally unrelated words here now ok"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "x alpha beta gamma delta y z")],
        "doc_id long, text string",
    )
    kept = decontaminate(docs, bench, n=4).select("doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [2, 3]


def test_decontaminate_ngram_shorter_docs_survive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "doc_id long, text string")
    # docs shorter than n produce no grams -> never contaminated
    kept = decontaminate(docs, bench, n=4).count()
    assert kept == 2


def test_decontaminate_plan_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9, "a b c d")], "doc_id long, text string")
    plan = decontaminate(docs, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [("write bob@example.com or 10.0.0.1 or 555-123-4567 ok",),
         ("no pii at all",),
         ("edge a@b.co plus 1.2.3.4.5 partial",)],
        "text string",
    )
    out = [r[0] for r in df.select(scrub_pii(F.col("text"))).collect()]
    assert out[0] == "write <EMAIL> or <IP> or <PHONE> ok"
    assert out[1] == "no pii at all"
    # 1.2.3.4.5: the first 4 octets match; trailing .5 remains
    assert "<EMAIL>" in out[2] and "<IP>" in out[2]


def test_dup_line_fraction(spark):
    df = spark.createDataFrame(
        [("a\nb\na\n",), ("x\ny\nz",), ("",)], "text string")
    vals = [r[0] for r in df.select(dup_line_fraction(F.col("text"))).collect()]
    assert abs(vals[0] - (1 - 2 / 3)) < 1e-6
    assert vals[1] == 0.0 and vals[2] == 0.0


def test_top_bigram_stats(spark):
    docs = spark.createDataFrame(
        [(1, "go go go go stop here"), (2, "a b")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in top_bigram_stats(docs).collect()}
    assert rows[1].top_gram == "go go" and rows[1].top_count == 3
    # chars covered: 3 occurrences x 4 non-space gram chars / 16 non-space
    assert abs(rows[1].top_2gram_char_frac - 3 * 4 / 16) < 1e-6
    assert rows[2].top_gram == "a b" and rows[2].top_count == 1


def test_top_bigram_stats_totality(spark):
    # docs with < 2 tokens have no bigrams but must keep an accounting
    # row (regression: explode silently dropped them)
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in top_bigram_stats(docs).collect()}
    assert set(rows) == {1, 2, 3}
    for short in (1, 2):
        assert rows[short].top_gram == ""
        assert rows[short].top_count == 0
        assert rows[short].top_2gram_char_frac == 0.0
    assert rows[3].top_gram == "two words"


def test_strat_key_salt_decorrelates(spark):
    # composing sample → shard must not leave shards empty: the shard
    # hash is salted away from the sampling hash
    docs = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    kept = docs.where(strat_key(F.col("doc_id")) < 500)  # 5% sample
    shards = {
        r.s for r in kept.select(
            (strat_key(F.col("doc_id"), "shard") % 16).alias("s")
        ).distinct().collect()
    }
    assert shards == set(range(16))


def test_stratified_sample_deterministic_and_rate(spark):
    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1})
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in out.collect())
    assert a == b  # deterministic
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 800 < by_lang["en"] < 1200  # ~1000 of 2000
    assert 120 < by_lang["de"] < 280  # ~200 of 2000


def test_strat_key_range(spark):
    df = spark.range(0, 500).select(strat_key(F.col("id")).alias("k"))
    mn, mx = df.agg(F.min("k"), F.max("k")).first()
    assert 0 <= mn and mx < 10000


def test_paragraph_dedup(spark):
    from docling_spark.operators.curation import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\n\nshared para\n\nunique two"),
            (2, "shared para\n\nother text"),
            (3, "SHARED   para\n\nmore"),  # normalized dup of "shared para"
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert rows[1].clean_text == "unique one\n\nshared para\n\nunique two"
    assert rows[1].n_paras == 3 and rows[1].n_kept == 3
    assert rows[2].clean_text == "other text"
    assert rows[2].n_paras == 2 and rows[2].n_kept == 1
    assert rows[3].clean_text == "more"
    assert rows[3].n_kept == 1


def test_paragraph_dedup_stable_under_repartition(spark):
    from docling_spark.operators.curation import paragraph_dedup

    docs = spark.createDataFrame(
        [(i, f"body {i % 3}\n\ntail {i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, paragraph_dedup(docs).collect()))
    b = sorted(map(tuple, paragraph_dedup(docs.repartition(7)).collect()))
    assert a == b


def test_unigram_logprob(spark):
    import math

    from docling_spark.operators.curation import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the the the"), (2, "rare")], "doc_id long, text string")
    rows = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    # P(the)=3/4, P(rare)=1/4
    assert abs(rows[1].mean_surprisal - round(-math.log10(3 / 4), 6)) < 1e-6
    assert abs(rows[2].mean_surprisal - round(-math.log10(1 / 4), 6)) < 1e-6
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 1


def test_pack_sequences_cumulative_bucketing(spark):
    from docling_spark.operators.curation import pack_sequences

    # shard_mod=1 → one shard; budget 5; token counts 3,3,4,1 in id order
    # cum-before: 0,3,6,10 → seq 0,0,1,2 (seq 0 overflows by one doc)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f"), (3, "g h i j"), (4, "k")],
        "doc_id long, text string",
    )
    rows = {(r.shard, r.seq_idx): r
            for r in pack_sequences(docs, budget_tokens=5, shard_mod=1).collect()}
    assert rows[(0, 0)].n_docs == 2 and rows[(0, 0)].total_tokens == 6
    assert rows[(0, 0)].first_doc == 1 and rows[(0, 0)].last_doc == 2
    assert rows[(0, 1)].n_docs == 1 and rows[(0, 1)].total_tokens == 4
    assert rows[(0, 2)].n_docs == 1 and rows[(0, 2)].total_tokens == 1


def test_pack_sequences_stable_under_repartition(spark):
    from docling_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 9 + 1)) for i in range(120)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, 32, 8).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(11), 32, 8).collect()))
    assert a == b
    # every doc lands in exactly one sequence
    assert sum(r[2] for r in a) == 120


def test_tfidf_topk(spark):
    import math

    from docling_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "durian")],
        "doc_id long, text string",
    )
    rows = sorted(
        ((r.doc_id, r.rank, r.token, r.score) for r in tfidf_topk(docs, k=3).collect())
    )
    log3 = round(math.log10(3.0), 6)
    log15 = round(math.log10(1.5), 6)
    assert rows == [
        (1, 1, "apple", round(2 * math.log10(3.0), 6)),
        (1, 2, "banana", log15),
        (2, 1, "cherry", log3),
        (2, 2, "banana", log15),
        (3, 1, "durian", log3),
    ]


def test_domain_cap_matches_global_rank(spark):
    from docling_spark.operators.curation import domain_cap

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(90)] + [(100 + i, "big") for i in range(60)],
        "doc_id long, source string",
    )
    got = {(r.doc_id, r.source): r.domain_rank
           for r in domain_cap(docs, cap=5, salt_mod=4).collect()}
    # exactly cap smallest ids per source, ranked 1..cap
    import collections
    per_src = collections.defaultdict(list)
    for (d, s), rk in got.items():
        per_src[s].append((rk, d))
    assert set(per_src) == {"src0", "src1", "src2", "big"}
    for s, entries in per_src.items():
        entries.sort()
        assert [rk for rk, _ in entries] == [1, 2, 3, 4, 5]
        ids = [d for _, d in entries]
        assert ids == sorted(ids)
    assert [d for _, d in sorted(per_src["big"])] == [100, 101, 102, 103, 104]
    assert [d for _, d in sorted(per_src["src0"])] == [0, 3, 6, 9, 12]


def test_keep_canonical(spark):
    from docling_spark.operators.dedup import keep_canonical

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4), (5, 4)], "doc_id long, component long")
    got = {r.doc_id: (r.canonical_id, r.is_canonical)
           for r in keep_canonical(docs, comps).collect()}
    assert got == {0: (0, 1), 1: (1, 1), 2: (1, 0),
                   3: (3, 1), 4: (4, 1), 5: (4, 0)}


def test_dup_span_removal_semantics(spark):
    from docling_spark.operators.curation import dup_span_removal

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h unique one tail"),
            (2, "x a b c d e f g h y z w q r"),
            (3, "p q a b c d e f g h i j k l m n o a b c d e f g h z"),
            (4, "short doc"),
            (5, "a b c d e f g h unique one tail"),  # full dup of 1
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in dup_span_removal(df, k=8).collect()}
    # keeper (smallest id) is untouched
    assert got[1].clean_text == "a b c d e f g h unique one tail"
    assert got[1].n_removed == 0
    # one duplicated window cut mid-doc
    assert got[2].clean_text == "x y z w q r" and got[2].n_removed == 8
    # BOTH occurrences within a non-keeper doc cut; overlap merge intact
    assert got[3].clean_text == "p q i j k l m n o z"
    assert got[3].n_removed == 16
    # short docs pass through
    assert got[4].clean_text == "short doc" and got[4].n_removed == 0
    # a fully-duplicated doc loses every token but KEEPS its accounting
    # row — the cleaned corpus never silently drops documents
    assert got[5].clean_text == ""
    assert got[5].n_tokens == 11 and got[5].n_removed == 11


def test_dup_span_removal_plan(spark):
    """No cartesian/nested-loop join; span-merge windows are partitioned
    by doc (never a global single-partition window)."""
    from docling_spark.operators.curation import dup_span_removal

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")],
        "doc_id int, text string",
    )
    plan = dup_span_removal(df, k=8)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re as _re
    for m in _re.finditer(r"Window .*?windowspecdefinition\(([^,]*),", plan):
        assert "doc_id" in m.group(1)


def test_dsir_weights_semantics_and_plan(spark):
    from docling_spark.operators.curation import dsir_weights

    src = spark.createDataFrame(
        [(1, "common words common words"), (2, "common words rare thing"),
         (3, "target style phrase entirely")],
        "doc_id int, text string",
    )
    tgt = spark.createDataFrame(
        [(100, "target style phrase entirely"),
         (101, "target style phrase again")],
        "doc_id int, text string",
    )
    out = dsir_weights(src, tgt, dim=64)
    got = {r.doc_id: r for r in out.collect()}
    # doc 3 IS target-like → positive log weight, kept; doc 1 is pure
    # source-side vocabulary → negative, dropped
    assert got[3].log_weight > 0 and got[3].keep == 1
    assert got[1].log_weight < 0 and got[1].keep == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # no global rank — threshold keep only


def test_mixture_plan_binding_source_and_shares(spark):
    """The binding source (scarcest relative to its target share) keeps
    everything; planned tokens realize the target proportions exactly."""
    from docling_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        [  # web: 100 tokens avail; code: 20; books: 40
            (1, "w " * 100, "web"),
            (2, "c " * 20, "code"),
            (3, "b " * 40, "books"),
            (4, "x " * 999, "ignored-source"),
        ],
        "doc_id long, text string, source string",
    )
    plan = {r["source"]: r for r in mixture_plan(
        docs, {"web": 0.5, "code": 0.25, "books": 0.25}).collect()}
    assert set(plan) == {"web", "code", "books"}
    # N = min(100/.5, 20/.25, 40/.25) = 80, bound by code
    assert plan["code"]["keep_fraction"] == 1.0
    assert plan["web"]["tokens_planned"] == 40
    assert plan["code"]["tokens_planned"] == 20
    assert plan["books"]["tokens_planned"] == 20
    assert abs(plan["books"]["keep_fraction"] - 0.5) < 1e-9


def test_mixture_plan_single_source_degenerate(spark):
    from docling_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a b c", "only")], "doc_id long, text string, source string")
    row = mixture_plan(docs, {"only": 7.0}).collect()[0]
    assert row["target_share"] == 1.0
    assert row["keep_fraction"] == 1.0
    assert row["tokens_planned"] == 3


def test_bm25_scores_hand_computed(spark):
    import math

    from docling_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "durian")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            bm25_scores(docs, ["apple", "cherry"]).collect()}
    # doc 3 matches no term -> absent
    assert set(rows) == {1, 2}
    avgdl = (3 + 2 + 1) / 3.0

    def bm25(tf, df, dl, n=3, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        part = idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * dl / avgdl))
        return round(round(part, 8), 6)

    assert rows[1].n_hit_terms == 1
    assert rows[1].score == bm25(tf=2, df=1, dl=3)
    assert rows[2].n_hit_terms == 1
    assert rows[2].score == bm25(tf=1, df=1, dl=2)


def test_bm25_query_terms_case_folded(spark):
    from docling_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [(1, "Apple pie"), (2, "no match")], "doc_id long, text string")
    rows = bm25_scores(docs, ["APPLE"]).collect()
    assert [r.doc_id for r in rows] == [1]


def test_train_quality_lr_learns_separable_labels(spark):
    """Full-batch GD actually learns: on a corpus where the label is a
    clean threshold on one feature, training must beat the 50% prior and
    move the weights off zero in the discriminative direction."""
    from docling_spark.operators.textstats import train_quality_lr

    rows = [(i, ("word " * (5 if i % 2 else 61)).strip()) for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # label y = (n_tok + doc_id) % 2: 61 tokens on even ids -> y=1,
    # 5 tokens on odd ids -> y=0 — i.e. exactly the long documents
    scored, w = train_quality_lr(docs, iters=8, lr=1.0)
    got = scored.collect()
    acc = sum(1 for r in got if r["pred"] == r["label"]) / len(got)
    assert acc > 0.9
    assert w[1] > 0  # token-count feature must carry positive weight


def test_train_quality_lr_deterministic_across_partitionings(spark):
    """Integer-quantized gradient sums make the trained weights invariant
    to partitioning/summation order."""
    from docling_spark.operators.textstats import train_quality_lr

    rows = [(i, f"alpha beta {'x ' * (i % 7)}gamma") for i in range(50)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
    _, wa = train_quality_lr(a, iters=3)
    _, wb = train_quality_lr(b, iters=3)
    assert wa == wb


def test_mixture_plan_absent_target_source_zeroes_the_plan(spark):
    # a targeted source missing from the corpus (typo'd name) must
    # surface as a tokens_avail=0 row driving nmax to 0 — never a
    # silently-satisfied plan that violates the requested mixture
    from docling_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        [(1, "some web words here", "web")],
        "doc_id long, text string, source string")
    rows = {r["source"]: r for r in
            mixture_plan(docs, {"web": 0.5, "code": 0.5}).collect()}
    assert set(rows) == {"web", "code"}
    assert rows["code"]["tokens_avail"] == 0
    assert rows["code"]["keep_fraction"] == 1.0  # all of nothing
    assert rows["web"]["tokens_planned"] == 0    # nmax = min(..., 0) = 0


def test_train_quality_lr_total_on_empty_corpus(spark):
    from docling_spark.operators.textstats import train_quality_lr

    scored, w = train_quality_lr(
        spark.createDataFrame([], "doc_id long, text string"), iters=2)
    assert scored.count() == 0
    assert w == [0.0, 0.0, 0.0, 0.0]


def test_pq_rejects_indivisible_dim(spark):
    import pytest as _pytest

    from docling_spark.operators.similarity import pq_adc_topk, pq_encode

    emb = spark.createDataFrame(
        [(0, [0.0] * 60)], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        pq_encode(emb, m=8, dim=60)
    with _pytest.raises(ValueError):
        pq_adc_topk(emb, m=8, dim=60)


def test_edit_distance_threshold_band_matches_unbounded(spark):
    from docling_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fx"),
         (3, "completely different words entirely")],
        "doc_id long, text string")
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long")
    capped = {(r["doc_a"], r["doc_b"]): r["edit_dist"]
              for r in edit_distance_pairs(docs, cands, max_dist=5).collect()}
    full = {(r["doc_a"], r["doc_b"]): r["edit_dist"]
            for r in edit_distance_pairs(docs, cands).collect()}
    # the banded kernel keeps exactly the pairs within the cap, with
    # identical distances; over-cap pairs (reported -1) are dropped
    assert capped == {(1, 2): 1}
    assert full[(1, 2)] == 1 and full[(1, 3)] > 5


class TestCurationReviewFixes:
    def test_mixture_plan_never_oversamples_at_trillion_scale(self, spark):
        """The binding source's tokens_planned must never exceed
        tokens_avail — the old relative 1e-12 nudge crossed the next
        integer at >= 1e12 planned tokens."""
        from docling_spark.operators.curation import mixture_plan

        # synthesize sources whose token counts are exact and huge via a
        # tiny frame with a fake token column? mixture_plan counts real
        # tokens, so emulate scale by checking the formula through the
        # operator at modest counts AND asserting the clamp columnwise.
        docs = spark.createDataFrame(
            [(i, "w " * 100, "a") for i in range(10)]
            + [(100 + i, "w " * 10, "b") for i in range(10)],
            "doc_id long, text string, source string")
        out = {r["source"]: r for r in mixture_plan(
            docs, {"a": 0.5, "b": 0.5}).collect()}
        for r in out.values():
            assert r["tokens_planned"] <= r["tokens_avail"]

    def test_mixture_plan_rejects_zero_weights(self, spark):
        import pytest

        from docling_spark.operators.curation import mixture_plan

        docs = spark.createDataFrame([(1, "x", "a")],
                                     "doc_id long, text string, source string")
        with pytest.raises(ValueError, match="positive total weight"):
            mixture_plan(docs, {"a": 0.0, "b": 0.0})

    def test_stratified_sample_rejects_sub_resolution_fraction(self, spark):
        import pytest

        from docling_spark.operators.curation import stratified_sample

        docs = spark.createDataFrame([(i, "a") for i in range(10)],
                                     "doc_id long, source string")
        with pytest.raises(ValueError, match="resolution"):
            stratified_sample(docs, "source", {"a": 3e-5})
        # the documented escape hatch works
        out = stratified_sample(docs, "source", {"a": 3e-5},
                                resolution=10**8)
        assert out.count() <= 10

    def test_stratified_sample_salt_decorrelates_passes(self, spark):
        """Two composed 50% passes with distinct salts must land near
        25%, not the 50% a shared hash gives."""
        from docling_spark.operators.curation import stratified_sample

        docs = spark.createDataFrame([(i, "a") for i in range(4000)],
                                     "doc_id long, source string")
        first = stratified_sample(docs, "source", {"a": 0.5})
        nested = stratified_sample(first, "source", {"a": 0.5})
        assert nested.count() == first.count()  # unsalted: nested prefix
        indep = stratified_sample(first, "source", {"a": 0.5}, salt="p2")
        frac = indep.count() / 4000
        assert 0.2 < frac < 0.3

    def test_pack_sequences_shard_key_uniform_power_of_two(self, spark):
        """10000 % 64 != 0 made the old strat_key%64 chain put ~0.64%
        extra mass on shards 0-15; the 60-bit key mod 64 is exactly
        uniform in expectation — check no shard deviates grossly."""
        from docling_spark.operators.curation import pack_sequences

        docs = spark.createDataFrame(
            [(i, "tok ") for i in range(6400)], "doc_id long, text string")
        shards = (pack_sequences(docs, budget_tokens=50, shard_mod=64)
                  .groupBy("shard").sum("n_docs").collect())
        counts = [r["sum(n_docs)"] for r in shards]
        assert len(counts) == 64
        assert max(counts) - min(counts) < 100 * 3  # ~100/shard expected

    def test_unigram_logprob_total_over_empty_docs(self, spark):
        from docling_spark.operators.curation import unigram_logprob

        docs = spark.createDataFrame(
            [(1, "hello world"), (2, "   "), (3, "")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[2]["n_tokens"] == 0 and rows[2]["mean_surprisal"] is None

    def test_dsir_weights_total_over_empty_docs(self, spark):
        from docling_spark.operators.curation import dsir_weights_total

        src = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "")],
            "doc_id long, text string")
        tgt = spark.createDataFrame([(9, "alpha beta")],
                                    "doc_id long, text string")
        rows = {r["doc_id"]: r for r in dsir_weights_total(src, tgt).collect()}
        assert set(rows) == {1, 2}
        assert rows[2]["n_tokens"] == 0 and rows[2]["keep"] == 0


class TestTextstatsReviewFixes:
    def test_tokens_no_phantom_empty_token(self, spark):
        """F.trim strips ASCII spaces only: a leading tab/newline used to
        split into a phantom '' token, inflating every count."""
        from pyspark.sql import functions as F

        from docling_spark.operators.textstats import (
            avg_token_len,
            token_count,
        )

        df = spark.createDataFrame(
            [("\tHello world",), ("\n",), ("  a b  ",), ("",)], "t string")
        rows = df.select(
            token_count(F.col("t")).alias("n"),
            F.round(avg_token_len(F.col("t")), 3).alias("atl"),
        ).collect()
        assert [r["n"] for r in rows] == [2, 0, 2, 0]
        assert rows[0]["atl"] == 5.0

    def test_quality_score_null_text_is_null(self, spark):
        from pyspark.sql import functions as F

        from docling_spark.operators.textstats import quality_score

        df = spark.createDataFrame([(None,), ("",)], "t string")
        rows = df.select(quality_score(F.col("t")).alias("q")).collect()
        assert rows[0]["q"] is None       # NULL text -> NULL, not 0.333
        assert rows[1]["q"] == 0.0

    def test_score_to_grade_null_passthrough(self, spark):
        from pyspark.sql import functions as F

        from docling_spark.operators.textstats import score_to_grade

        df = spark.createDataFrame([(None,), (0.95,)], "s double")
        rows = df.select(score_to_grade(F.col("s")).alias("g")).collect()
        assert rows[0]["g"] is None       # was 'excellent'
        assert rows[1]["g"] == "excellent"

    def test_linear_quality_score_validates_weights(self, spark):
        import pytest

        from docling_spark.operators.textstats import linear_quality_score

        docs = spark.createDataFrame([(1, "hello")],
                                     "doc_id long, text string")
        with pytest.raises(ValueError, match="dim"):
            linear_quality_score(docs, dim=256, weights=[0.1] * 16)
        # trained vector with matching dim works
        out = linear_quality_score(docs, dim=16, weights=[0.1] * 16)
        assert out.count() == 1

    def test_funnel_stage_label_tracks_lang(self, spark):
        from docling_spark.operators.textstats import curation_funnel

        docs = spark.createDataFrame(
            [(1, "the quick brown fox and the lazy dog in a big field "
                 "that is full of green grass and it is a nice day")],
            "doc_id long, text string")
        out = curation_funnel(docs, lang="de").collect()[0]
        assert out["stage"] == "non_de"
