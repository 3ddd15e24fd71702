"""Edge-case tests for operators/webquality.py (Gopher rules, URL
canonicalization) and extract_ops.conversation_stats — the cases the
sf-corpus oracle can't reach (empty text, single-turn conversations,
URL corner shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_spark.operators.webquality import (
    canonical_url,
    gopher_quality,
    url_dedup,
)


def _canon(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(canonical_url(F.lit(url)).alias("u"))
        .collect()[0]["u"]
    )


class TestCanonicalUrl:
    def test_lowercases_scheme_and_host_only(self, spark):
        assert _canon(spark, "HTTP://Example.COM/Path/File") == \
            "http://example.com/Path/File"

    def test_strips_fragment(self, spark):
        assert _canon(spark, "http://a.com/x#section-2") == "http://a.com/x"

    def test_strips_default_port_http(self, spark):
        assert _canon(spark, "http://a.com:80/x") == "http://a.com/x"
        assert _canon(spark, "http://a.com:80") == "http://a.com"
        assert _canon(spark, "http://a.com:80?q=1") == "http://a.com?q=1"

    def test_keeps_non_default_port(self, spark):
        assert _canon(spark, "http://a.com:8080/x") == "http://a.com:8080/x"
        # :443 is default only for https
        assert _canon(spark, "http://a.com:443/x") == "http://a.com:443/x"

    def test_strips_tracking_params(self, spark):
        assert _canon(spark, "http://a.com/x?utm_source=tw&id=3&utm_medium=s") \
            == "http://a.com/x?id=3"

    def test_tracking_only_query_drops_question_mark(self, spark):
        assert _canon(spark, "http://a.com/x?utm_source=tw") == "http://a.com/x"

    def test_tracking_strip_is_param_anchored(self, spark):
        # 'ref=' inside a PATH segment must survive (Amazon-style URLs)
        assert _canon(spark, "https://ex.com/shop/ref=sr_1/item?a=1") == \
            "https://ex.com/shop/ref=sr_1/item?a=1"
        # longer param names containing a tracking name must survive
        assert _canon(spark, "http://a.com/x?href=y&a=1") == \
            "http://a.com/x?a=1&href=y"
        assert _canon(spark, "http://a.com/x?jsessionid=z&a=1") == \
            "http://a.com/x?a=1&jsessionid=z"
        # consecutive tracking params all stripped
        assert _canon(spark, "http://a.com/x?utm_a=1&utm_b=2&c=3") == \
            "http://a.com/x?c=3"

    def test_sorts_query_params(self, spark):
        assert _canon(spark, "http://a.com/x?b=2&a=1&c=3") == \
            "http://a.com/x?a=1&b=2&c=3"

    def test_strips_trailing_slash_nonroot(self, spark):
        assert _canon(spark, "http://a.com/x/y/") == "http://a.com/x/y"
        assert _canon(spark, "http://a.com/x/?a=1") == "http://a.com/x?a=1"

    def test_keeps_root_slash(self, spark):
        assert _canon(spark, "http://a.com/") == "http://a.com/"

    def test_idempotent(self, spark):
        """canonical_url(canonical_url(x)) == canonical_url(x) — the
        canonical form is a fixed point, so re-normalizing an already-
        deduped URL table never reshuffles groups."""
        urls = [
            "HTTP://Example.COM:80/path/3/?utm_source=x&b=2&a=1#frag",
            "https://CDN.site.org:443/assets/img1?gclid=abc&z=9",
            "http://a.com/x?b=2&a=1&c=3",
            "http://a.com/",
            "http://a.com:8080/x/",
            "https://news.site.org/story-7/",
            "http://a.com/x?utm_source=tw&utm_medium=s",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            canonical_url(F.col("url")).alias("once"),
            canonical_url(canonical_url(F.col("url"))).alias("twice"),
        ).collect()
        for r in rows:
            assert r["once"] == r["twice"]

    def test_fuzz_idempotent_and_total(self, spark):
        """Deterministic URL-ish fuzz corpus (md5-derived hosts/paths/
        params, junk characters, missing schemes, empty strings): the
        canonicalizer must never raise, never return null for non-null
        input, and stay idempotent on every row."""
        import hashlib

        def h(i, tag):
            return hashlib.md5(f"{i}:{tag}".encode()).hexdigest()

        urls = []
        for i in range(300):
            host = f"{h(i,'h')[:6]}.com"
            path = "/".join(h(i, "p")[j:j + 4] for j in range(0, 12, 4))
            q = f"{h(i,'q')[:3]}={h(i,'v')[:3]}&utm_source={h(i,'u')[:4]}"
            shape = i % 6
            if shape == 0:
                urls.append(f"HTTP://{host.upper()}:80/{path}/?{q}#x")
            elif shape == 1:
                urls.append(f"https://{host}:443/{path}?{q}&{q}")
            elif shape == 2:
                urls.append(f"ftp://{host}/{path}")
            elif shape == 3:
                urls.append(f"{host}/{path}?{q}")  # no scheme
            elif shape == 4:
                urls.append(f"http://{host}/???##{q}")
            else:
                urls.append("")
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            "url",
            canonical_url(F.col("url")).alias("once"),
            canonical_url(canonical_url(F.col("url"))).alias("twice"),
        ).collect()
        assert len(rows) == 300
        for r in rows:
            assert r["once"] is not None
            assert r["once"] == r["twice"], r["url"]

    def test_url_dedup_groups_collisions(self, spark):
        df = spark.createDataFrame(
            [(1, "HTTP://A.com:80/x?b=2&a=1#f"),
             (2, "http://a.com/x?a=1&b=2"),
             (3, "http://a.com/other")],
            "doc_id long, url string",
        )
        out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
        assert out["http://a.com/x?a=1&b=2"]["n_dups"] == 2
        assert out["http://a.com/x?a=1&b=2"]["canonical_id"] == 1
        assert out["http://a.com/other"]["n_dups"] == 1


class TestSqlRegistryParity:
    def test_canonical_url_sql_matches_column(self, spark):
        """The SQL scalar function registered by register_sql_udfs must be
        bit-identical to the Column chain on every URL shape."""
        from docling_spark.functions.register import register_sql_udfs

        register_sql_udfs(spark)
        urls = [
            "HTTP://Example.COM:80/path/3/?utm_source=x&b=2&a=1#frag",
            "https://CDN.site.org:443/assets/img1?gclid=abc&z=9",
            "http://a.com/x?b=2&a=1&c=3",
            "http://a.com/",
            "http://a.com:8080/x/",
            "https://news.site.org/story-7/",
            "http://a.com/x?utm_source=tw",
            "http://a.com/x#frag",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            canonical_url(F.col("url")).alias("col_fn"),
            F.expr("canonical_url(url)").alias("sql_fn"),
        ).collect()
        for r in rows:
            assert r["col_fn"] == r["sql_fn"]


class TestGopherQuality:
    def _row(self, spark, text: str):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return gopher_quality(df).collect()[0]

    def test_empty_text_rejected_not_crashed(self, spark):
        r = self._row(spark, "")
        assert r["n_words"] == 0 and r["keep"] is False

    def test_good_document_kept(self, spark):
        text = ("the quick brown fox jumps over that lazy dog and it will "
                "have been seen to run with great speed across the field "
                "and the hills of the countryside every single morning "
                "before the sun rises over the distant mountain tops there "
                "and everyone watches with quiet wonder at the sight")
        r = self._row(spark, text)
        assert r["n_words"] == 51 and r["keep"] is True
        assert r["stopword_hits"] >= 2 and r["alpha_word_frac"] == 1.0

    def test_bullet_heavy_rejected(self, spark):
        # 10 lines, all bullets -> frac 1.0 > 0.9 (pad words to pass the
        # other gates so the bullet rule is what rejects)
        lines = "\n".join("• the point of and that have with be to item %d"
                          % i for i in range(10))
        r = self._row(spark, lines)
        assert r["bullet_line_frac"] == 1.0 and r["keep"] is False

    def test_ellipsis_fraction_counts_both_forms(self, spark):
        r = self._row(spark, "first line...\nsecond line…\nthird line")
        assert abs(r["ellipsis_line_frac"] - 2 / 3) < 1e-6

    def test_symbol_ratio(self, spark):
        r = self._row(spark, "# heading with more words here...")
        # 6 words, 1 hash + 1 ellipsis -> 2/6
        assert abs(r["symbol_word_ratio"] - 2 / 6) < 1e-6

    def test_nonalpha_words_rejected(self, spark):
        r = self._row(spark, " ".join(["123 456 789 0"] * 20))
        assert r["alpha_word_frac"] == 0.0 and r["keep"] is False


class TestScriptProfile:
    def _row(self, spark, text: str):
        from docling_spark.operators.webquality import script_profile

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return script_profile(df).collect()[0]

    def test_cyrillic_dominant(self, spark):
        r = self._row(spark, "Привет мир ok")
        assert r["dominant_script"] == "cyrillic"
        assert r["n_cyrillic"] == 9 and r["n_latin"] == 2
        assert abs(r["dominant_frac"] - 9 / 11) < 1e-6

    def test_cjk_and_kana(self, spark):
        r = self._row(spark, "日本語のテスト")
        assert r["n_cjk"] == 3 and r["n_kana"] == 4
        assert r["dominant_script"] == "kana"

    def test_tie_prefers_earlier_script(self, spark):
        # 2 latin vs 2 greek — latin comes first in SCRIPT_ORDER
        r = self._row(spark, "ab αβ")
        assert r["n_latin"] == 2 and r["n_greek"] == 2
        assert r["dominant_script"] == "latin"

    def test_no_letters(self, spark):
        r = self._row(spark, "123 456 !!!")
        assert r["dominant_script"] == "none"
        assert r["dominant_frac"] == 0.0


class TestFleschReadability:
    def test_known_sentence(self, spark):
        from docling_spark.operators.webquality import flesch_reading_ease

        # "The cat sat on the mat." -> 6 words, 1 sentence, 6 vowel groups
        df = spark.createDataFrame([("The cat sat on the mat.",)], "t string")
        v = df.select(flesch_reading_ease(F.col("t")).alias("f")).collect()[0]["f"]
        expected = round(206.835 - 1.015 * 6 - 84.6 * (6 / 6), 4)
        assert abs(v - expected) < 1e-9

    def test_empty_is_zero(self, spark):
        from docling_spark.operators.webquality import flesch_reading_ease

        df = spark.createDataFrame([("",)], "t string")
        assert df.select(flesch_reading_ease(F.col("t")).alias("f")) \
                 .collect()[0]["f"] == 0.0


class TestConversationStats:
    def test_single_turn_conversation(self, spark):
        from docling_spark.operators.extract_ops import conversation_stats

        df = spark.createDataFrame(
            [("c1", 0, "user", "hi", "", "2026-01-01 00:00:00")],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        r = conversation_stats(df).collect()[0]
        assert r["n_turns"] == 1
        assert r["alternation"] == 0.0 and r["mean_gap_s"] == 0.0

    def test_alternation_and_gaps(self, spark):
        from docling_spark.operators.extract_ops import conversation_stats

        rows = [
            ("c1", 0, "user", "aaaa", "", "2026-01-01 00:00:00"),
            ("c1", 1, "assistant", "bb", "", "2026-01-01 00:00:10"),
            ("c1", 2, "assistant", "cc", "code", "2026-01-01 00:00:14"),
            ("c1", 3, "user", "d", "", "2026-01-01 00:00:20"),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        r = conversation_stats(df).collect()[0]
        assert r["n_turns"] == 4 and r["n_user"] == 2 and r["n_assistant"] == 2
        assert r["n_tool_calls"] == 1
        # switches: u->a yes, a->a no, a->u yes = 2/3
        assert abs(r["alternation"] - 2 / 3) < 1e-6
        # gaps 10, 4, 6 -> mean 20/3
        assert abs(r["mean_gap_s"] - 20 / 3) < 1e-6
        assert r["total_chars"] == 9

    def test_order_independence_under_repartition(self, spark):
        """Shuffled input order must not change any stat (the lag window
        orders on turn_idx, never physical order)."""
        from docling_spark.operators.extract_ops import conversation_stats

        rows = [("c1", i, "user" if i % 2 == 0 else "assistant",
                 "x" * (i + 1), "", f"2026-01-01 00:00:{i:02d}")
                for i in range(20)]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        a = conversation_stats(df.orderBy(F.desc("turn_idx"))
                               .repartition(7)).collect()[0]
        b = conversation_stats(df).collect()[0]
        assert a.asDict() == b.asDict()
        assert a["alternation"] == 1.0
