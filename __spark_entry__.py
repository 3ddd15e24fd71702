"""Driver contract for the docling_spark engine.

``entry``      — flagship: full extraction pipeline over transcripts
                 synthesized deterministically from the sf0.001 tables.
``queries``    — one entry per implemented operator family (SURVEY.md §2 +
                 the training-data ops), each runnable at any sf dir.
``oracle_sql`` — exact DuckDB twins. Where extraction runs through the real
                 engine, the payloads are template-built from ``documents``
                 so the expected output is derivable in pure SQL — the
                 oracle validates the engine end-to-end, not a re-port of it.

Column names are aliased identically on both sides; doubles are rounded to
6 (or fewer) decimals before output so cross-engine float noise can't flip
the driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NBSP = " "
EMDASH = "—"
ELLIPSIS = "…"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a transcripts table from sf0.001 documents
    (each document becomes a short conversation whose turns carry html /
    plain / code payloads built from the document text), run the full
    extraction pipeline, and return the ranked per-turn output."""
    sf_dir = "/root/testdata/sf0.001"
    from docling_spark.operators.extract_ops import extract_turns, with_turn_rank

    tr = _synth_transcripts(spark, sf_dir)
    out = with_turn_rank(extract_turns(tr))
    return out.select(
        "conv_id", "turn_idx", "turn_rank", "role", "status", "format",
        "extracted_text",
    )


def _synth_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → transcripts (conv_id, turn_idx, role, text, tool, ts):
    3 turns per document — user asks (plain), assistant answers (html),
    tool returns (code). Deterministic, derivable in SQL."""
    d = _docs(spark, sf_dir)
    base = d.select(
        F.concat(F.lit("conv"), F.lpad(F.col("doc_id").cast("string"), 8, "0")
                 ).alias("conv_id"),
        F.col("doc_id"),
        F.col("text"),
    )
    user = base.select(
        "conv_id", F.lit(0).alias("turn_idx"), F.lit("user").alias("role"),
        F.col("text"), F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    asst = base.select(
        "conv_id", F.lit(1).alias("turn_idx"), F.lit("assistant").alias("role"),
        F.concat(
            F.lit("<html><body><div>boilerplate nav</div><h1>Document "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"), F.col("text"),
            F.lit("</p><footer>fine print</footer></body></html>"),
        ).alias("text"),
        F.lit("html").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:07")).alias("ts"),
    )
    tool = base.select(
        "conv_id", F.lit(2).alias("turn_idx"), F.lit("tool").alias("role"),
        F.concat(F.lit('{"doc": '), F.col("doc_id").cast("string"),
                 F.lit(', "status": "ok"}')).alias("text"),
        F.lit("code").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:14")).alias("ts"),
    )
    return user.unionByName(asst).unionByName(tool)


# ---------------------------------------------------------------------------
# extraction family (engine end-to-end, SQL-derivable expected output)
# ---------------------------------------------------------------------------

def _extract_docs(spark, sf_dir, payload_col, tool: str) -> DataFrame:
    """Build a one-turn transcript per document with the given payload
    expression and run the real extraction operator."""
    from docling_spark.operators.extract_ops import extract_turns

    d = _docs(spark, sf_dir).select(
        F.col("doc_id"),
        payload_col.alias("text"),
    )
    tr = d.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("text"),
        F.lit(tool).alias("tool"),
    )
    out = extract_turns(tr)
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        "status",
        "extracted_text",
    )


def q_extract_html_heading(spark, sf_dir):
    payload = F.concat(
        F.lit("<html><body><div>boilerplate nav</div><h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><footer>fine print</footer></body></html>"),
    )
    return _extract_docs(spark, sf_dir, payload, "html")


ORACLE_HTML_HEADING = """
select doc_id, 'success' as status,
       '# Document ' || doc_id || chr(10) || chr(10)
        || trim(regexp_replace(text, '\\s+', ' ', 'g')) as extracted_text
from documents
"""


def q_extract_html_list_table(spark, sf_dir):
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = lambda i: F.element_at(toks, i)  # noqa: E731
    payload = F.concat(
        F.lit("<h1>Doc "), F.col("doc_id").cast("string"), F.lit("</h1>"),
        F.lit("<ul><li>"), w(1), F.lit("</li><li>"), w(2), F.lit("</li></ul>"),
        F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>"), w(3),
        F.lit("</td><td>"), w(4), F.lit("</td></tr></table>"),
    )
    return _extract_docs(spark, sf_dir, payload, "html")


ORACLE_HTML_LIST_TABLE = """
with t as (
  select doc_id, string_split_regex(trim(text), '\\s+') toks from documents
)
select doc_id, 'success' as status,
       '# Doc ' || doc_id || chr(10) || chr(10)
        || '- ' || toks[1] || chr(10) || '- ' || toks[2] || chr(10) || chr(10)
        || '| k | v |' || chr(10) || '| - | - |' || chr(10)
        || '| ' || toks[3] || ' | ' || toks[4] || ' |' as extracted_text
from t
"""


def q_extract_plain_dirty(spark, sf_dir):
    # every space → NBSP, em-dash + ellipsis appended: the normalization
    # table must map it all back (clean_unicode targets)
    payload = F.concat(
        F.translate(F.col("text"), " ", NBSP), F.lit(EMDASH + ELLIPSIS)
    )
    return _extract_docs(spark, sf_dir, payload, "")


ORACLE_PLAIN_DIRTY = """
select doc_id, 'success' as status,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) || '-...' as extracted_text
from documents
"""


def q_extract_code_passthrough(spark, sf_dir):
    payload = F.concat(F.lit("result = "), F.col("doc_id").cast("string"),
                       F.lit("\nprint(result)"))
    return _extract_docs(spark, sf_dir, payload, "code")


ORACLE_CODE = """
select doc_id, 'success' as status,
       '```' || chr(10) || 'result = ' || doc_id || chr(10) || 'print(result)'
       || chr(10) || '```' as extracted_text
from documents
"""


def q_extract_csv_table(spark, sf_dir):
    toks = F.split(F.trim(F.col("text")), r"\s+")
    payload = F.concat(
        F.lit("k;v\n"),
        F.element_at(toks, 1), F.lit(";"), F.element_at(toks, 2), F.lit("\n"),
        F.element_at(toks, 3), F.lit(";"), F.element_at(toks, 4),
    )
    return _extract_docs(spark, sf_dir, payload, "csv")


ORACLE_CSV = """
with t as (
  select doc_id, string_split_regex(trim(text), '\\s+') toks from documents
)
select doc_id, 'success' as status,
       '| k | v |' || chr(10) || '| - | - |' || chr(10)
        || '| ' || toks[1] || ' | ' || toks[2] || ' |' || chr(10)
        || '| ' || toks[3] || ' | ' || toks[4] || ' |' as extracted_text
from t
"""


def q_extract_md_doc(spark, sf_dir):
    toks = F.split(F.trim(F.col("text")), r"\s+")
    payload = F.concat(
        F.lit("# Doc "), F.col("doc_id").cast("string"), F.lit("\n\n"),
        F.col("text"), F.lit("\n\n- "), F.element_at(toks, 1),
        F.lit("\n- "), F.element_at(toks, 2), F.lit("\n"),
    )
    return _extract_docs(spark, sf_dir, payload, "md")


ORACLE_MD = """
with t as (
  select doc_id, text, string_split_regex(trim(text), '\\s+') toks from documents
)
select doc_id, 'success' as status,
       '# Doc ' || doc_id || chr(10) || chr(10)
        || trim(regexp_replace(text, '\\s+', ' ', 'g')) || chr(10) || chr(10)
        || '- ' || toks[1] || chr(10) || '- ' || toks[2] as extracted_text
from t
"""


def q_extract_status_counts(spark, sf_dir):
    """Failure containment end-to-end: every 20th document carries a broken
    pdfish payload → failure rows, everything else succeeds."""
    payload = F.when(
        F.col("doc_id") % 20 == 0, F.lit('{"page_no": 1, "bbox": [broken')
    ).otherwise(F.concat(F.lit("<h1>T</h1><p>"), F.col("text"), F.lit("</p>")))
    tool = F.when(F.col("doc_id") % 20 == 0, F.lit("pdfish")).otherwise(F.lit("html"))
    from docling_spark.operators.extract_ops import extract_turns

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"), F.lit("user").alias("role"),
        F.lit(None).cast("timestamp").alias("ts"),
        payload.alias("text"), tool.alias("tool"),
    )
    return (
        extract_turns(d).groupBy("status")
        .agg(F.count("*").alias("n"))
    )


ORACLE_STATUS_COUNTS = """
select case when doc_id % 20 = 0 then 'failure' else 'success' end as status,
       count(*) as n
from documents group by 1
"""


def q_turn_ordering(spark, sf_dir):
    """Stable (conv_id, turn_idx) ordering via window rank after an
    adversarial shuffle — the north rule's ordering invariant."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 50).cast("string").alias("conv_id"),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
    ).repartition(23)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return d.select(
        "conv_id", "turn_idx",
        (F.row_number().over(w) - 1).alias("turn_rank"),
    )


ORACLE_TURN_ORDERING = """
select cast(doc_id % 50 as varchar) as conv_id,
       cast(doc_id // 50 as int) as turn_idx,
       cast(row_number() over (partition by doc_id % 50 order by doc_id // 50) - 1
            as int) as turn_rank
from documents
"""


# ---------------------------------------------------------------------------
# text analysis family
# ---------------------------------------------------------------------------

def q_doc_stats(spark, sf_dir):
    from docling_spark.operators.textstats import doc_stats

    return doc_stats(_docs(spark, sf_dir)).drop("n_chars2")


ORACLE_DOC_STATS = """
with t as (
  select doc_id, text,
         string_split_regex(trim(text), '\\s+') toks,
         string_split_regex(trim(lower(text)), '\\s+') ltoks
  from documents
),
s as (
  select doc_id, text, toks,
    case when trim(text) = '' then 0 else len(toks) end as n_tokens,
    length(regexp_replace(trim(text), '\\s+', '', 'g')) as n_nospace,
    len(list_filter(ltoks, x -> x in ('the','and','of','to','a','in','is','it','that'))) as hits_en,
    len(list_filter(ltoks, x -> x in ('der','die','und','das','ist','nicht','ein','zu'))) as hits_de,
    len(list_filter(ltoks, x -> x in ('le','la','et','les','des','est','un','une'))) as hits_fr,
    len(list_filter(ltoks, x -> x in ('el','la','los','las','es','un','una','que'))) as hits_es
  from t
)
select doc_id,
  n_tokens,
  round(case when n_tokens > 0 then n_nospace::double / n_tokens else 0.0 end, 6)
    as avg_token_len,
  round(case when n_tokens > 0 then hits_en::double / n_tokens else 0.0 end, 6)
    as stopword_ratio,
  round((
      least(n_tokens / 20.0, 1.0)
      + least(case when n_tokens > 0 then hits_en::double / n_tokens else 0.0 end * 5.0, 1.0)
      + case when (case when n_tokens > 0 then n_nospace::double / n_tokens else 0.0 end)
              between 2.0 and 12.0 then 1.0 else 0.0 end
    ) / 3.0, 6) as quality,
  case
    when hits_en > 0 and hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) then 'en'
    when hits_de > 0 and hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) then 'de'
    when hits_fr > 0 and hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) then 'fr'
    when hits_es > 0 and hits_es = greatest(hits_en, hits_de, hits_fr, hits_es) then 'es'
    else 'und' end as lang_pred,
  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as fingerprint
from s
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from docling_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


ORACLE_DEDUP_EXACT = """
select md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as fp,
       min(doc_id) as keep_doc_id, count(*) as n_dupes
from documents group by 1
"""

_SHINGLE_SQL = """
  select doc_id,
         unnest(list_distinct(case when len(toks) >= 3
           then list_transform(generate_series(1, len(toks) - 2),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           else [array_to_string(toks, ' ')] end)) as shingle
  from (select doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') toks
        from documents)
"""


def q_minhash_signatures(spark, sf_dir):
    from docling_spark.operators.dedup import minhash_signatures, shingles

    return minhash_signatures(shingles(_docs(spark, sf_dir)), num_hashes=8)


ORACLE_MINHASH = f"""
with sh as ({_SHINGLE_SQL})
select doc_id,
  {", ".join(
    f"min(('0x' || substr(md5('{j}:' || shingle), 1, 15))::bigint) as mh_{j}"
    for j in range(8)
  )}
from sh group by doc_id
"""


def q_dedup_jaccard(spark, sf_dir):
    from docling_spark.operators.dedup import jaccard_pairs, shingles

    return jaccard_pairs(shingles(_docs(spark, sf_dir)), threshold=0.2)


ORACLE_JACCARD = f"""
with sh as ({_SHINGLE_SQL}),
sizes as (select doc_id, count(*) sz from sh group by 1),
inter as (
  select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as inter
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2
)
select doc_a, doc_b,
       round(inter::double / (sa.sz + sb.sz - inter), 6) as jaccard
from inter
join sizes sa on sa.doc_id = doc_a
join sizes sb on sb.doc_id = doc_b
where inter::double / (sa.sz + sb.sz - inter) >= 0.2
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    from docling_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sh = shingles(_docs(spark, sf_dir))
    cands = lsh_candidate_pairs(minhash_signatures(sh, 8), 8, band_size=2)
    return jaccard_pairs(sh, threshold=0.1, candidates=cands)


ORACLE_MINHASH_LSH = f"""
with sh as ({_SHINGLE_SQL}),
sigs as (
  select doc_id,
    {", ".join(
      f"min(('0x' || substr(md5('{j}:' || shingle), 1, 15))::bigint) as mh_{j}"
      for j in range(8)
    )}
  from sh group by doc_id
),
bands as (
  {" union all ".join(
    f"select doc_id, {b} as band_id, md5(mh_{2*b} || ',' || mh_{2*b+1}) as bucket from sigs"
    for b in range(4)
  )}
),
cands as (
  select distinct a.doc_id as doc_a, b.doc_id as doc_b
  from bands a join bands b
    on a.band_id = b.band_id and a.bucket = b.bucket and a.doc_id < b.doc_id
),
sizes as (select doc_id, count(*) sz from sh group by 1),
inter as (
  select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as inter
  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
  group by 1, 2
)
select i.doc_a, i.doc_b,
       round(inter::double / (sa.sz + sb.sz - inter), 6) as jaccard
from inter i
join cands c on c.doc_a = i.doc_a and c.doc_b = i.doc_b
join sizes sa on sa.doc_id = i.doc_a
join sizes sb on sb.doc_id = i.doc_b
where inter::double / (sa.sz + sb.sz - inter) >= 0.1
"""


def q_simhash(spark, sf_dir):
    from docling_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir), bits=32)


ORACLE_SIMHASH = """
with toks as (
  select doc_id,
         unnest(list_distinct(
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
         )) as tok
  from documents
),
h as (select doc_id, ('0x' || substr(md5(tok), 1, 15))::bigint as h from toks),
votes as (
  select doc_id, b,
         sum(case when (h >> b) & 1 = 1 then 1 else -1 end) as v
  from h, generate_series(0, 31) t(b)
  group by 1, 2
)
select doc_id,
       sum(case when v > 0 then (1::bigint << b) else 0 end)::bigint as simhash
from votes group by 1
"""


# ---------------------------------------------------------------------------
# embedding similarity family
# ---------------------------------------------------------------------------

def q_embed_cosine_pairs(spark, sf_dir):
    from docling_spark.operators.similarity import cosine_pairs

    return cosine_pairs(_emb(spark, sf_dir), threshold=0.45)


ORACLE_COSINE_PAIRS = """
select a.vec_id as id_a, b.vec_id as id_b,
       round(list_cosine_similarity(a.embedding::double[], b.embedding::double[]), 6) as cos
from embeddings a join embeddings b on a.vec_id < b.vec_id
where list_cosine_similarity(a.embedding::double[], b.embedding::double[]) >= 0.45
"""


def q_embed_knn_of_zero(spark, sf_dir):
    """Neighbors of vec_id 0 above a margin-safe threshold (set semantics —
    no top-k boundary ties across engines)."""
    from docling_spark.operators.similarity import cosine

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding").cast("array<double>"),
                           F.col("qv")), 6).alias("score"),
        )
        .filter(F.col("score") >= 0.28)
    )


ORACLE_KNN_ZERO = """
select b.vec_id,
       round(list_cosine_similarity(b.embedding::double[], a.embedding::double[]), 6) as score
from embeddings b, (select embedding from embeddings where vec_id = 0) a
where b.vec_id != 0
  and round(list_cosine_similarity(b.embedding::double[], a.embedding::double[]), 6) >= 0.28
"""


# ---------------------------------------------------------------------------
# relational family (SURVEY §2.c/d/e/f operator classes)
# ---------------------------------------------------------------------------

def q_agg_pricing_summary(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) as sum_qty,
       round(sum(l_extendedprice), 4) as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) as sum_disc_price,
       round(avg(l_quantity), 4) as avg_qty,
       count(*) as count_order
from lineitem
where l_shipdate <= '1998-09-02'
group by l_returnflag, l_linestatus
"""


def q_window_order_rank(spark, sf_dir):
    from pyspark.sql.window import Window

    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
    )


ORACLE_WINDOW_RANK = """
select o_custkey, o_orderkey,
       cast(row_number() over (partition by o_custkey
                               order by o_orderdate, o_orderkey) as int) as order_seq
from orders
"""


def q_anti_join_no_orders(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


ORACLE_ANTI_JOIN = """
select c_custkey, c_mktsegment from customer
where c_custkey not in (select o_custkey from orders where o_totalprice > 300000)
"""


def q_broadcast_brand_revenue(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    p = _read(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_BRAND_REVENUE = """
select p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue,
       count(*) as n_items
from lineitem join part on l_partkey = p_partkey
group by p_brand
"""


def q_percentile_confidence(spark, sf_dir):
    """Confidence-aggregation analog: mean + exact 10% quantile per group
    (standard_pdf_pipeline.py:1101-1129 nanmean/nanquantile)."""
    o = _read(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.1)), 4).alias("p10_price"),
        F.count("*").alias("n"),
    )


ORACLE_PERCENTILE = """
select o_orderpriority,
       round(avg(o_totalprice), 4) as avg_price,
       round(quantile_cont(o_totalprice, 0.1), 4) as p10_price,
       count(*) as n
from orders group by 1
"""


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30 min): the tabular form of the
    reference's run-length list grouping (readingorder_model.py:538-587) —
    lag + cumulative sum over the per-user window."""
    from pyspark.sql.window import Window

    _utc(spark)
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w)
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_timestamp(F.min("ts")).alias("t_start"),
            F.unix_timestamp(F.max("ts")).alias("t_end"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


ORACLE_SESSIONIZE = """
with g as (
  select user_id, event_id, ts, value,
         case when lag(ts) over w is null
                or floor(epoch(ts))::bigint - floor(epoch(lag(ts) over w))::bigint > 1800
              then 1 else 0 end as brk
  from events
  window w as (partition by user_id order by ts, event_id)
),
s as (
  select *, sum(brk) over (partition by user_id order by ts, event_id
                           rows unbounded preceding) as session_id
  from g
)
select user_id, cast(session_id as bigint) as session_id,
       count(*) as n_events,
       floor(epoch(min(ts)))::bigint as t_start,
       floor(epoch(max(ts)))::bigint as t_end,
       round(sum(value), 4) as total_value
from s group by 1, 2
"""


def q_events_hourly(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the streaming groupBy
    window — identical results under availableNow triggers)."""
    _utc(spark)
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


ORACLE_EVENTS_HOURLY = """
select floor(epoch(date_trunc('hour', ts)))::bigint as hour_start, event_type,
       count(*) as n, round(sum(value), 4) as total_value
from events group by 1, 2
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # extraction engine end-to-end
        "extract_html_heading": q_extract_html_heading,
        "extract_html_list_table": q_extract_html_list_table,
        "extract_plain_dirty": q_extract_plain_dirty,
        "extract_code_passthrough": q_extract_code_passthrough,
        "extract_csv_table": q_extract_csv_table,
        "extract_md_doc": q_extract_md_doc,
        "extract_status_counts": q_extract_status_counts,
        "turn_ordering": q_turn_ordering,
        # text analysis
        "doc_stats": q_doc_stats,
        # dedup
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "simhash": q_simhash,
        # similarity
        "embed_cosine_pairs": q_embed_cosine_pairs,
        "embed_knn_of_zero": q_embed_knn_of_zero,
        # relational operator classes
        "agg_pricing_summary": q_agg_pricing_summary,
        "window_order_rank": q_window_order_rank,
        "anti_join_no_orders": q_anti_join_no_orders,
        "broadcast_brand_revenue": q_broadcast_brand_revenue,
        "percentile_confidence": q_percentile_confidence,
        "sessionize_events": q_sessionize_events,
        "events_hourly": q_events_hourly,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_html_heading": ORACLE_HTML_HEADING,
        "extract_html_list_table": ORACLE_HTML_LIST_TABLE,
        "extract_plain_dirty": ORACLE_PLAIN_DIRTY,
        "extract_code_passthrough": ORACLE_CODE,
        "extract_csv_table": ORACLE_CSV,
        "extract_md_doc": ORACLE_MD,
        "extract_status_counts": ORACLE_STATUS_COUNTS,
        "turn_ordering": ORACLE_TURN_ORDERING,
        "doc_stats": ORACLE_DOC_STATS,
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "minhash_signatures": ORACLE_MINHASH,
        "dedup_jaccard": ORACLE_JACCARD,
        "dedup_minhash_lsh": ORACLE_MINHASH_LSH,
        "simhash": ORACLE_SIMHASH,
        "embed_cosine_pairs": ORACLE_COSINE_PAIRS,
        "embed_knn_of_zero": ORACLE_KNN_ZERO,
        "agg_pricing_summary": ORACLE_PRICING,
        "window_order_rank": ORACLE_WINDOW_RANK,
        "anti_join_no_orders": ORACLE_ANTI_JOIN,
        "broadcast_brand_revenue": ORACLE_BRAND_REVENUE,
        "percentile_confidence": ORACLE_PERCENTILE,
        "sessionize_events": ORACLE_SESSIONIZE,
        "events_hourly": ORACLE_EVENTS_HOURLY,
    }
