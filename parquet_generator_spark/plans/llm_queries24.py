"""LLM-pipeline twenty-fourth tranche: IVF-PQ ADC search.

``ann_ivfpq`` — the memory-bounded ANN shape a real 100 TB corpus
runs (the FAISS IVFPQ index): candidates come from probing the
query's nearest IVF cells, and scoring never touches the full
vectors — each candidate is represented by its 8-byte PQ code and
scored with ASYMMETRIC DISTANCE (ADC, Jegou et al. 2011): the query
precomputes one M x K table of subspace distances to every codeword
(driver-side, 8 x 16 doubles), and a candidate's distance is the sum
of 8 table lookups selected by its code.

Spark-first shape:
- coarse quantizer + PQ codebooks are the smallest-id corpus rows
  (the reproducible-quantizer trick shared by ann_ivf/embedding_pq —
  a k-means codebook swaps in at scale without changing the plan);
- the query's probe cells AND its ADC table are computed on the
  driver at plan time (one vector x tiny matrices, no Spark job);
- executors do one narrow mapInPandas over the probe-filtered
  corpus: PQ-encode the candidate (per-subspace argmin, the proven
  engine-identical decomposed-dot order from embedding_pq) and sum
  its 8 ADC table entries SEQUENTIALLY — then TakeOrderedAndProject
  for the top-k. No join, no shuffle of anything data-sized.
- at ingest-time-encoded scale the codes are a stored 8-byte column
  and this query never reads `embedding` at all; here encoding fuses
  into the scoring pass because the synthetic table stores only raw
  vectors.

The DuckDB oracle rebuilds EVERYTHING from the same literals —
centroids, probe ranking, per-subspace codebooks, encoding argmin,
ADC table, sequential sum — so the driver hash-checks the whole
index path like any exact query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from parquet_generator_spark.plans.llm_queries15 import (
    PQ_DIM,
    PQ_K,
    PQ_M,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

IVFPQ_CELLS = 16
IVFPQ_PROBE = 4
IVFPQ_TOPK = 10

# fixed literal query vector (shared by plan and oracle; rounded so
# the SQL literal round-trips the exact double)
IVFPQ_QUERY = [round(math.sin(i + 1), 6) for i in range(PQ_DIM)]


def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by IVF-probe + PQ-ADC for one literal query vector:
    (rank, vec_id, adc) ordered by ascending asymmetric L2. The
    headline uses the smallest-id quantizers so the oracle can
    rebuild both codebooks in SQL; the production k-means codebook
    (similarity.make_pq_codebooks_kmeans) swaps in without changing
    the plan and is recall-tested in tests/test_llm_queries24.py."""
    import numpy as np

    from parquet_generator_spark.operators.similarity import (
        ivfpq_topk,
        make_centroids_from_corpus,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    d = PQ_DIM // PQ_M
    cents = make_centroids_from_corpus(emb, IVFPQ_CELLS)
    base = (emb.orderBy("vec_id").limit(PQ_K)
            .select("embedding").collect())
    books = np.array([r["embedding"] for r in base], dtype=np.float64)
    sub_books = books.reshape(PQ_K, PQ_M, d).transpose(1, 0, 2)
    return ivfpq_topk(emb, IVFPQ_QUERY, IVFPQ_TOPK, cents, sub_books,
                      n_probe=IVFPQ_PROBE)


def _ivfpq_oracle() -> str:
    d = PQ_DIM // PQ_M
    qlit = "[" + ", ".join(f"{x!r}" for x in IVFPQ_QUERY) + "]::DOUBLE[]"
    sub_sel = ", ".join(
        f"e[{m * d + 1}:{(m + 1) * d}] AS s{m}" for m in range(PQ_M))
    qsub_sel = ", ".join(
        f"q[{m * d + 1}:{(m + 1) * d}] AS q{m}" for m in range(PQ_M))
    # per-subspace: ADC table from the query literal, encoding
    # argmin over candidates (embedding_pq's proven pattern,
    # restricted to the probe-filtered corpus), table lookup by code
    per_sub = []
    for m in range(PQ_M):
        per_sub.append(f"""
t{m} AS (
  SELECT c.k,
         list_dot_product(qs.q{m}, qs.q{m})
         - 2.0 * list_dot_product(qs.q{m}, c.s{m})
         + list_dot_product(c.s{m}, c.s{m}) AS dist
  FROM books c, qs),
d{m} AS (
  SELECT v.vec_id, c.k,
         list_dot_product(v.s{m}, v.s{m})
         - 2.0 * list_dot_product(v.s{m}, c.s{m})
         + list_dot_product(c.s{m}, c.s{m}) AS dist
  FROM cand v JOIN books c ON TRUE),
b{m} AS (
  SELECT vec_id, k AS code,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, k ASC) AS rn
  FROM d{m}),
a{m} AS (
  SELECT b.vec_id, t.dist
  FROM b{m} b JOIN t{m} t ON t.k = b.code
  WHERE b.rn = 1)""")
    adc_sum = " + ".join(f"a{m}.dist" for m in range(PQ_M))
    adc_joins = " ".join(f"JOIN a{m} USING (vec_id)"
                         for m in range(1, PQ_M))
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
qs AS (SELECT {qsub_sel} FROM (SELECT {qlit} AS q)),
cent AS (
  SELECT rn - 1 AS cell,
         list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS ce
  FROM (SELECT e, row_number() OVER (ORDER BY vec_id) AS rn FROM v)
  WHERE rn <= {IVFPQ_CELLS}),
probe AS (
  SELECT cell FROM (
    SELECT cell,
           row_number() OVER (
             ORDER BY list_dot_product({qlit}, ce) DESC, cell ASC)
             AS pr
    FROM cent)
  WHERE pr <= {IVFPQ_PROBE}),
assign AS (
  SELECT vec_id, e, cell FROM (
    SELECT v.vec_id, v.e, cent.cell,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, cent.ce)
                      / sqrt(list_dot_product(v.e, v.e)) DESC,
                      cent.cell ASC) AS pr
    FROM v CROSS JOIN cent)
  WHERE pr = 1),
cand AS (
  SELECT vec_id, {sub_sel}
  FROM assign WHERE cell IN (SELECT cell FROM probe)),
books AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, {sub_sel}
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {PQ_K})),
{",".join(per_sub)},
scored AS (
  SELECT a0.vec_id, round({adc_sum}, 4) AS adc
  FROM a0 {adc_joins})
SELECT CAST(row_number() OVER (ORDER BY adc ASC, vec_id ASC) AS INT)
         AS rank,
       vec_id, adc
FROM (SELECT * FROM scored ORDER BY adc ASC, vec_id ASC
      LIMIT {IVFPQ_TOPK})
ORDER BY rank
"""


QUERIES.update({"ann_ivfpq": ann_ivfpq})
ORACLES.update({"ann_ivfpq": _ivfpq_oracle()})


# -------------------------------------------------- text_tokens_cjk

# the synthetic corpus is ASCII-only, so the zh documents get a
# deterministic planted Chinese payload (literal constants shared by
# plan and oracle) — the honest simulation of a multilingual crawl
_CJK_SNIPPETS = ["数据处理引擎分析", "分散式数据流计算", "向量检索与排序"]


def text_tokens_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CJK-aware token accounting (the bigram fallback every text op
    can opt into): zh documents carry planted Chinese payloads; the
    tokenizer (operators/text.toks_cjk_spark) emits Latin alnum runs
    as-is and character BIGRAMS for CJK runs (Lucene CJKAnalyzer
    semantics), so token counts stop silently dropping non-Latin
    scripts. Per language: docs, total tokens, CJK-bigram tokens,
    Latin tokens — the zh rows are the proof the fallback engages
    (the plain analyzer counts 0 of the planted payload).

    Scale: one narrow projection + one grouped aggregate, identical
    shape to text_tokens."""
    from pyspark.sql import functions as F

    from parquet_generator_spark.operators import text as tx

    docs = load_table(spark, "documents", sf_dir)
    snip = ("CASE CAST(doc_id % 3 AS INT) "
            + " ".join(f"WHEN {i} THEN '{s}'"
                       for i, s in enumerate(_CJK_SNIPPETS))
            + " END")
    mixed = (f"CASE WHEN lang = 'zh' THEN "
             f"concat({snip}, ' ', substr(text, 1, 60)) "
             f"ELSE substr(text, 1, 60) END")
    toks = tx.toks_cjk_spark("mixed")
    cjk_pat = f"^[{tx.CJK_RANGES}]"
    return (docs.select("lang", F.expr(mixed).alias("mixed"))
            .select(
                "lang",
                F.expr(f"size({toks})").alias("n_toks"),
                F.expr(f"size(filter({toks}, "
                       f"t -> t rlike '{cjk_pat}'))").alias("n_cjk"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_toks").cast("long").alias("total_tokens"),
                 F.sum("n_cjk").cast("long").alias("cjk_tokens"),
                 (F.sum("n_toks") - F.sum("n_cjk")).cast("long")
                 .alias("latin_tokens"))
            .orderBy("lang"))


def _cjk_oracle() -> str:
    from parquet_generator_spark.operators import text as tx

    snip = ("CASE CAST(doc_id % 3 AS INT) "
            + " ".join(f"WHEN {i} THEN '{s}'"
                       for i, s in enumerate(_CJK_SNIPPETS))
            + " END")
    mixed = (f"CASE WHEN lang = 'zh' THEN "
             f"concat({snip}, ' ', substr(text, 1, 60)) "
             f"ELSE substr(text, 1, 60) END")
    toks = tx.toks_cjk_duck("mixed")
    cjk_pat = f"^[{tx.CJK_RANGES}]"
    return f"""
WITH m AS (SELECT lang, {mixed} AS mixed FROM documents),
t AS (SELECT lang, len({toks}) AS n_toks,
             len(list_filter({toks},
                 t -> regexp_matches(t, '{cjk_pat}'))) AS n_cjk
      FROM m)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(sum(n_cjk) AS BIGINT) AS cjk_tokens,
       CAST(sum(n_toks) - sum(n_cjk) AS BIGINT) AS latin_tokens
FROM t GROUP BY lang ORDER BY lang
"""


QUERIES.update({"text_tokens_cjk": text_tokens_cjk})
ORACLES.update({"text_tokens_cjk": _cjk_oracle()})


# --------------------------------------------------- langid_margin

# confidence-margin cutoffs on the (top1 - top2) marker-hit ratio
_MARGIN_HI = 0.05
_MARGIN_LO = 0.02


def langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFIDENCE accounting (the CCNet-style gate: docs
    whose language call is ambiguous get quarantined, not mislabeled):
    per doc the four marker-hit counts, margin = (top1 - top2) /
    tokens, bucketed high/medium/low. Per (pred_lang, bucket):
    doc count + mean margin. Pure codegen — the sorted-hits trick
    (sort_array / list_sort) gives top-2 without branching."""
    from pyspark.sql import functions as F

    from parquet_generator_spark.operators import text as tx

    docs = load_table(spark, "documents", sf_dir)
    hits = {lg: tx.lang_hits_spark("text", lg)
            for lg in ("en", "de", "fr", "es")}
    arr = "array(" + ", ".join(
        f"CAST({hits[lg]} AS DOUBLE)" for lg in
        ("en", "de", "fr", "es")) + ")"
    ntok = f"greatest(size({tx.toks_spark('text')}), 1)"
    margin = (f"round((sort_array({arr})[3] - sort_array({arr})[2])"
              f" / {ntok}, 6)")
    bucket = (f"CASE WHEN {margin} >= {_MARGIN_HI} THEN 'high' "
              f"WHEN {margin} >= {_MARGIN_LO} THEN 'medium' "
              f"ELSE 'low' END")
    return (docs.select(
        tx.langid_spark("text").alias("pred_lang"),
        F.expr(margin).alias("margin"),
        F.expr(bucket).alias("confidence"))
        .groupBy("pred_lang", "confidence")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("margin"), 6).alias("avg_margin"))
        .orderBy("pred_lang", "confidence"))


def _langid_margin_oracle() -> str:
    from parquet_generator_spark.operators import text as tx

    hits = {lg: tx.lang_hits_duck("text", lg)
            for lg in ("en", "de", "fr", "es")}
    arr = "[" + ", ".join(
        f"CAST({hits[lg]} AS DOUBLE)" for lg in
        ("en", "de", "fr", "es")) + "]"
    ntok = f"greatest(len({tx.toks_duck('text')}), 1)"
    margin = (f"round((list_sort({arr})[4] - list_sort({arr})[3])"
              f" / {ntok}, 6)")
    bucket = (f"CASE WHEN {margin} >= {_MARGIN_HI} THEN 'high' "
              f"WHEN {margin} >= {_MARGIN_LO} THEN 'medium' "
              f"ELSE 'low' END")
    return f"""
WITH d AS (
  SELECT {tx.langid_duck('text')} AS pred_lang,
         {margin} AS margin, {bucket} AS confidence
  FROM documents)
SELECT pred_lang, confidence, count(*) AS n_docs,
       round(avg(margin), 6) AS avg_margin
FROM d GROUP BY pred_lang, confidence
ORDER BY pred_lang, confidence
"""


QUERIES.update({"langid_margin": langid_margin})
ORACLES.update({"langid_margin": _langid_margin_oracle()})


# ----------------------------------------------- domain_cap_sample

DOMAIN_CAP = 10  # max docs kept per source (domain rate limiting)


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs-per-domain cap (the crawl-balance op every web pipeline
    runs so one hub domain cannot dominate the mix): keep at most
    DOMAIN_CAP docs per source, deterministically the LONGEST first
    (doc_id tie-break). Per-source report: available, kept, kept
    characters, and the kept-id sum (proves the exact same docs were
    selected in any engine). The rank window partitions on source —
    parallel across domains, frame bounded by the domain's own
    docs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.desc(F.length("text")), F.asc("doc_id"))
    ranked = docs.select(
        "source", "doc_id", F.length("text").alias("chars"),
        F.row_number().over(w).alias("rk"))
    return (ranked.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_available"),
                 F.sum(F.when(F.col("rk") <= DOMAIN_CAP, 1)
                       .otherwise(0)).cast("long").alias("n_kept"),
                 F.sum(F.when(F.col("rk") <= DOMAIN_CAP,
                              F.col("chars")).otherwise(0))
                 .cast("long").alias("kept_chars"),
                 F.sum(F.when(F.col("rk") <= DOMAIN_CAP,
                              F.col("doc_id")).otherwise(0))
                 .cast("long").alias("kept_id_sum"))
            .orderBy("source"))


DOMAIN_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT source, doc_id, length(text) AS chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY length(text) DESC, doc_id ASC)
           AS rk
  FROM documents)
SELECT source, count(*) AS n_available,
       CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN chars ELSE 0 END)
            AS BIGINT) AS kept_chars,
       CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN doc_id ELSE 0 END)
            AS BIGINT) AS kept_id_sum
FROM ranked GROUP BY source ORDER BY source
"""

QUERIES.update({"domain_cap_sample": domain_cap_sample})
ORACLES.update({"domain_cap_sample": DOMAIN_CAP_ORACLE})


# -------------------------------------------------------- epoch_plan

EPOCH_BUDGET = 1_000_000  # target training tokens
EPOCH_ALPHA = 0.6         # mixture temperature (<1 upweights small)


def epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epochs-per-source plan (the data-mixture table a training run
    is configured from): source s holds c_s tokens and receives a
    temperature share w_s = c_s^alpha / sum(c^alpha) of the token
    budget; epochs_s = alloc_s / c_s says how many times the source
    repeats (>1 = upsampled). One grouped pass + a one-row scalar
    aggregate attached as plan literals (broadcast_scalars — no
    unpartitioned window)."""
    from pyspark.sql import functions as F

    from parquet_generator_spark.operators import text as tx
    from parquet_generator_spark.operators.util import broadcast_scalars

    docs = load_table(spark, "documents", sf_dir)
    per = (docs.groupBy("source")
           .agg(F.sum(F.expr(f"size({tx.toks_spark('text')})"))
                .cast("long").alias("n_tokens")))
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(EPOCH_ALPHA))
    tot = per.agg(F.sum(w).alias("w_sum"))
    return (broadcast_scalars(per, tot)
            .select(
                "source", "n_tokens",
                F.round(w / F.col("w_sum"), 6).alias("share"),
                F.floor(F.lit(EPOCH_BUDGET) * w / F.col("w_sum"))
                .cast("long").alias("alloc_tokens"),
                F.round(F.floor(F.lit(EPOCH_BUDGET) * w
                                / F.col("w_sum"))
                        / F.col("n_tokens"), 4).alias("epochs"))
            .orderBy("source"))


def _epoch_plan_oracle() -> str:
    from parquet_generator_spark.operators import text as tx

    return f"""
WITH per AS (
  SELECT source,
         CAST(sum(len({tx.toks_duck('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(pow(CAST(n_tokens AS DOUBLE), {EPOCH_ALPHA}))
          AS w_sum FROM per)
SELECT source, n_tokens,
       round(pow(CAST(n_tokens AS DOUBLE), {EPOCH_ALPHA}) / w_sum, 6)
         AS share,
       CAST(floor({EPOCH_BUDGET} * pow(CAST(n_tokens AS DOUBLE),
            {EPOCH_ALPHA}) / w_sum) AS BIGINT) AS alloc_tokens,
       round(floor({EPOCH_BUDGET} * pow(CAST(n_tokens AS DOUBLE),
            {EPOCH_ALPHA}) / w_sum) / n_tokens, 4) AS epochs
FROM per, tot ORDER BY source
"""


QUERIES.update({"epoch_plan": epoch_plan})
ORACLES.update({"epoch_plan": _epoch_plan_oracle()})


# ------------------------------------------------ decontaminate_bloom

BLOOM_M = 1 << 16          # bits (1024 packed longs as plan literals)
BLOOM_K = 4                # double-hashed probes per shingle
_BLOOM_WORDS = BLOOM_M // 64


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memory-bounded benchmark decontamination — the 100 TB shape:
    instead of broadcasting the full benchmark shingle SET (the
    decontaminate query), the bench shingles insert into a FIXED
    m-bit Bloom filter (double hashing, Kirsch-Mitzenmacher: probe j
    hits (a + j*b) mod m with a, b the two md5 halves), shipped as
    1024 packed-long PLAN LITERALS — constant memory no matter how
    the eval suite grows. Per source: corpus docs, exact-flagged
    docs, bloom-flagged docs, and the false-positive overcount
    (bloom - exact >= 0 always; the filter never misses).

    The oracle rebuilds the SAME filter in SQL as the distinct
    inserted-position set (a Bloom bitset IS that union, so
    membership = all k probe positions present) — no Spark value
    leaks into it. Size m to the deployed eval suite: at the gate
    SFs the FP term is ~0; headroom shrinks as n/m grows
    (documented, not hidden)."""
    import hashlib

    from pyspark.sql import functions as F

    from parquet_generator_spark.operators.text import shingles_spark
    from parquet_generator_spark.plans.llm_queries3 import (
        BENCH_SOURCE,
        DECON_K,
    )

    docs = load_table(spark, "documents", sf_dir)
    sh = F.expr(shingles_spark("text", DECON_K))
    bench = (docs.filter(F.col("source") == BENCH_SOURCE)
             .select(F.explode(sh).alias("s")).distinct())

    # build the filter driver-side from the (bounded) eval suite
    words = [0] * _BLOOM_WORDS
    for row in bench.collect():
        h = hashlib.md5(row["s"].encode()).hexdigest()
        a, b = int(h[:8], 16), int(h[8:16], 16)
        for j in range(BLOOM_K):
            pos = (a + j * b) % BLOOM_M
            words[pos // 64] |= 1 << (pos % 64)
    # Spark longs are signed 64-bit: wrap to two's complement
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    corpus = (docs.filter(F.col("source") != BENCH_SOURCE)
              .select("doc_id", "source", F.explode(sh).alias("s")))
    # the words array and the (a, b) hash pair each bind ONCE via
    # single-element transform; F.shiftright only takes literal
    # shift counts, so the bit test renders as SQL
    warr_sql = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    hit_body = " AND ".join(
        f"((shiftright(element_at(W, CAST(((h.a + {j} * h.b) "
        f"% {BLOOM_M}) / 64 AS INT) + 1), "
        f"CAST((h.a + {j} * h.b) % 64 AS INT)) & 1) = 1)"
        for j in range(BLOOM_K))
    hit = F.expr(
        f"element_at(transform(array({warr_sql}), W -> "
        f"element_at(transform(array(named_struct("
        f"'a', CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT), "
        f"'b', CAST(conv(substr(md5(s), 9, 8), 16, 10) AS BIGINT)"
        f")), h -> {hit_body}), 1)), 1)")
    # ONE corpus explode pass carries BOTH probes (round 13: the
    # before-plan ran the corpus explode+md5 chain twice — once
    # under the bloom projection, once under the exact-match join —
    # guide §1.2): the bloom test is a projection on the shingle
    # stream, the exact test a broadcast LEFT join against the
    # bench-bounded shingle set, and one per-doc rollup folds both
    # flags. The bench subtree still evaluates twice (driver filter
    # build + broadcast) but it is the eval suite, never the corpus.
    per_doc = (corpus.withColumn("bloom_hit", hit.cast("int"))
               .join(F.broadcast(bench.withColumn("exact_s",
                                                  F.lit(1))),
                     "s", "left")
               .groupBy("doc_id", "source")
               .agg(F.max("bloom_hit").alias("bloom"),
                    F.max(F.coalesce("exact_s", F.lit(0)))
                    .alias("exact_hit")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("exact_hit").cast("long").alias("n_exact"),
                 F.sum("bloom").cast("long").alias("n_bloom"),
                 (F.sum("bloom") - F.sum("exact_hit")).cast("long")
                 .alias("n_false_pos"))
            .orderBy("source"))


def _bloom_oracle() -> str:
    from parquet_generator_spark.operators.text import shingles_duck
    from parquet_generator_spark.plans.llm_queries3 import (
        BENCH_SOURCE,
        DECON_K,
    )

    probes = ", ".join(str(j) for j in range(BLOOM_K))
    return f"""
WITH sh AS (
  SELECT doc_id, source, {shingles_duck('text', DECON_K)} AS shs
  FROM documents),
bench AS (
  SELECT DISTINCT unnest(shs) AS s FROM sh
  WHERE source = '{BENCH_SOURCE}'),
bh AS (
  SELECT CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS a,
         CAST(concat('0x', substr(md5(s), 9, 8)) AS BIGINT) AS b
  FROM bench),
bits AS (
  SELECT DISTINCT (a + j * b) % {BLOOM_M} AS pos
  FROM bh CROSS JOIN (SELECT unnest([{probes}]) AS j)),
corpus AS (
  SELECT doc_id, source, unnest(shs) AS s FROM sh
  WHERE source <> '{BENCH_SOURCE}'),
ch AS (
  SELECT doc_id, source, s,
         CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS a,
         CAST(concat('0x', substr(md5(s), 9, 8)) AS BIGINT) AS b
  FROM corpus),
cprobe AS (
  SELECT doc_id, source, s, (a + j * b) % {BLOOM_M} AS pos
  FROM ch CROSS JOIN (SELECT unnest([{probes}]) AS j)),
cpos AS (
  SELECT doc_id, source, s,
         count(*) FILTER (pos IN (SELECT pos FROM bits)) AS n_in
  FROM cprobe GROUP BY doc_id, source, s),
per_doc AS (
  SELECT c.doc_id, any_value(c.source) AS source,
         max(CASE WHEN c.n_in = {BLOOM_K} THEN 1 ELSE 0 END)
           AS bloom,
         max(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
           AS exact_hit
  FROM cpos c LEFT JOIN bench b ON c.s = b.s
  GROUP BY c.doc_id)
SELECT source, count(*) AS n_docs,
       CAST(sum(exact_hit) AS BIGINT) AS n_exact,
       CAST(sum(bloom) AS BIGINT) AS n_bloom,
       CAST(sum(bloom) - sum(exact_hit) AS BIGINT) AS n_false_pos
FROM per_doc GROUP BY source ORDER BY source
"""


QUERIES.update({"decontaminate_bloom": decontaminate_bloom})
ORACLES.update({"decontaminate_bloom": _bloom_oracle()})
