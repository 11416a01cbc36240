"""LLM-pipeline wave 18: provenance-grade corpus hygiene.

Four passes a web-scale training pipeline runs between crawl and
tokenizer, none expressible by the earlier waves:

- ``dedup_edit_distance``: blocked near-dup detection by EDIT
  distance — the verification tier behind minhash (Jaccard is
  order-blind; Levenshtein catches the in-place edits Jaccard
  under-counts). Candidates come from a (length-bucket, 24-char
  prefix) blocking key, so the quadratic kernel runs only inside
  tiny blocks — the classic record-linkage blocking design.
- ``url_dedup_normalized``: canonical-URL dedup — the FIRST dedup
  any crawl pipeline runs (far cheaper than content dedup). Strips
  tracking params / fragments / trailing slashes, lowercases
  scheme+host, groups variants.
- ``pii_density``: PII surface profiling per source (emails, dial
  strings, private IPv4s per 10k chars) — the go/no-go audit before
  a source enters the training mix.
- ``url_blocklist_filter``: domain blocklist filtering with
  subdomain-suffix semantics ('gamma.dev' also blocks
  'mirror.gamma.dev') — CommonCrawl-style URL filtering, counted
  per source.

The word-salad corpus carries no URLs/PII, so both are planted
in-query as deterministic functions of doc_id (house convention of
the media/url waves: llm_queries17.py) and then extracted with the
REAL production regexes, end-to-end.

Scale posture: dedup_edit_distance joins on the blocking key (an
equi-join; block sizes are data-bounded, and the distance evaluates
on 200-char prefixes so the per-pair cost is constant);
url_dedup / pii / blocklist are one-scan regex projections plus one
bounded groupBy each. No UDFs anywhere — levenshtein, regex and list
lambdas are all JVM built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.plans.llm_queries17 import (
    _URL_DOMAINS,
    _URL_RE,
    _url_page,
)
from parquet_generator_spark.operators.util import widen_if_narrow
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ----------------------------------------------- dedup_edit_distance

_ED_PREFIX = 24      # blocking: first 24 chars must agree exactly
_ED_LEN_BUCKET = 64  # ... and length within the same 64-char bucket
_ED_CMP = 200        # distance evaluated on 200-char prefixes
_ED_MAX = 24         # near-dup threshold


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by Levenshtein distance within blocking
    groups. Block key = (floor(n_chars/64), first 24 chars): near
    dups by edit distance almost always agree on both (a diverging
    prefix already costs its length in edits), so the O(n^2) kernel
    runs per-block, not per-corpus. Distance compares 200-char
    prefixes (constant per-pair cost; a prefix distance <= t lower-
    bounds nothing but IS the standard cheap screen — full-text
    confirmation would run on the surviving pairs). The join is a
    plain equi-join on the block key (AQE broadcasts at test SFs,
    shuffle-hash on blk at corpus scale): at 100 TB it
    hash-partitions by block and never materializes cross-block
    pairs. widen_if_narrow spreads the small-file scan across cores
    (a no-op at real scale); the sf1 checkpoint measured 34s -> ~2s
    from this alone."""
    docs = widen_if_narrow(load_table(spark, "documents", sf_dir))
    d = docs.select(
        "doc_id",
        F.substring("text", 1, _ED_CMP).alias("head"),
        F.concat_ws(
            ":",
            F.floor(F.col("n_chars") / _ED_LEN_BUCKET).cast("string"),
            F.substring("text", 1, _ED_PREFIX)).alias("blk"))
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("a_id"),
                    F.col("b.doc_id").alias("b_id"),
                    dist.alias("edit_dist"))
            .filter(F.col("edit_dist") <= _ED_MAX)
            .orderBy("a_id", "b_id"))


DEDUP_EDIT_DISTANCE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         substr(text, 1, {_ED_CMP}) AS head,
         CAST(n_chars // {_ED_LEN_BUCKET} AS VARCHAR) || ':' ||
           substr(text, 1, {_ED_PREFIX}) AS blk
  FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(a.head, b.head) AS edit_dist
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= {_ED_MAX}
ORDER BY a_id, b_id
"""


# --------------------------------------------- url_dedup_normalized

_N_SITES = 40


def _raw_url():
    """Four deterministic variants of one canonical URL per group of
    four docs: clean, Case+trailing-slash, utm-tracking, ref+fragment
    — the exact noise URL canonicalization exists to remove."""
    g = (F.col("doc_id") / 4).cast("long")
    k = (g % _N_SITES).cast("string")
    base = F.concat(F.lit("https://site"), k, F.lit(".example/page/"),
                    g.cast("string"))
    cased = F.concat(F.lit("https://Site"), k, F.lit(".Example/page/"),
                     g.cast("string"), F.lit("/"))
    utm = F.concat(base, F.lit("?utm_source=feed&utm_medium=rss"))
    ref = F.concat(base, F.lit("?ref=tw#frag"))
    v = F.col("doc_id") % 4
    return (F.when(v == 0, base).when(v == 1, cased)
            .when(v == 2, utm).otherwise(ref))


def url_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: lowercase scheme+host, strip the
    fragment, drop tracking params (utm_*, ref), strip the trailing
    slash — then group raw variants by canonical form. Everything is
    regex/string arithmetic in one projection; the only shuffle is
    the groupBy on the canonical key (exactly the dedup shuffle a
    100-TB crawl runs first, before any content hashing)."""
    docs = load_table(spark, "documents", sf_dir)
    raw = docs.select("doc_id", _raw_url().alias("raw"))
    host = F.lower(F.regexp_extract("raw", r"^https?://([^/?#]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract("raw", r"^https?://[^/?#]+([^?#]*)", 1),
        r"/$", "")
    q = F.regexp_extract("raw", r"\?([^#]*)", 1)
    cq = F.regexp_replace(
        F.regexp_replace(q, r"(^|&)(utm_[a-z]+|ref)=[^&]*", ""),
        r"^&", "")
    canon = F.concat(
        F.lit("https://"), host, path,
        F.when(cq != "", F.concat(F.lit("?"), cq)).otherwise(F.lit("")))
    return (raw.select("raw", canon.alias("canonical"))
            .groupBy("canonical")
            .agg(F.count(F.lit(1)).alias("n_variants"),
                 F.countDistinct("raw").alias("n_distinct_raw"))
            .orderBy("canonical"))


URL_DEDUP_ORACLE = f"""
WITH raw AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'https://site' || CAST((doc_id // 4) % {_N_SITES}
                AS VARCHAR) || '.example/page/'
                || CAST(doc_id // 4 AS VARCHAR)
           WHEN 1 THEN 'https://Site' || CAST((doc_id // 4) % {_N_SITES}
                AS VARCHAR) || '.Example/page/'
                || CAST(doc_id // 4 AS VARCHAR) || '/'
           WHEN 2 THEN 'https://site' || CAST((doc_id // 4) % {_N_SITES}
                AS VARCHAR) || '.example/page/'
                || CAST(doc_id // 4 AS VARCHAR)
                || '?utm_source=feed&utm_medium=rss'
           ELSE 'https://site' || CAST((doc_id // 4) % {_N_SITES}
                AS VARCHAR) || '.example/page/'
                || CAST(doc_id // 4 AS VARCHAR) || '?ref=tw#frag'
         END AS raw
  FROM documents),
norm AS (
  SELECT raw,
         'https://'
         || lower(regexp_extract(raw, '^https?://([^/?#]+)', 1))
         || regexp_replace(
              regexp_extract(raw, '^https?://[^/?#]+([^?#]*)', 1),
              '/$', '')
         || CASE WHEN regexp_replace(regexp_replace(
                   regexp_extract(raw, '\\?([^#]*)', 1),
                   '(^|&)(utm_[a-z]+|ref)=[^&]*', '', 'g'), '^&', '')
                 <> ''
            THEN '?' || regexp_replace(regexp_replace(
                   regexp_extract(raw, '\\?([^#]*)', 1),
                   '(^|&)(utm_[a-z]+|ref)=[^&]*', '', 'g'), '^&', '')
            ELSE '' END AS canonical
  FROM raw)
SELECT canonical,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(count(DISTINCT raw) AS BIGINT) AS n_distinct_raw
FROM norm GROUP BY canonical ORDER BY canonical
"""


# ----------------------------------------------------- pii_density

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_PRIVIP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def _pii_page():
    """Plant PII deterministically: an email on every 3rd doc, a
    dial string on every 5th, a private IPv4 on every 4th."""
    did = F.col("doc_id")
    page = F.col("text")
    email = F.concat(F.lit(" contact user"), did.cast("string"),
                     F.lit("@mail"), (did % 7).cast("string"),
                     F.lit(".example"))
    phone = F.concat(F.lit(" call +1-555-"),
                     (did % 9000 + 1000).cast("string"))
    ip = F.concat(F.lit(" from 10."), (did % 256).cast("string"),
                  F.lit("."), ((did / 7).cast("long") % 256)
                  .cast("string"),
                  F.lit("."), (did % 250).cast("string"))
    page = F.when(did % 3 == 0, F.concat(page, email)).otherwise(page)
    page = F.when(did % 5 == 0, F.concat(page, phone)).otherwise(page)
    page = F.when(did % 4 == 0, F.concat(page, ip)).otherwise(page)
    return page


def pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII density audit per source: email / dial-string / private-
    IPv4 hits per 10k chars, over planted PII extracted with the
    production regexes. One narrow scan, one 20-bucket groupBy."""
    docs = load_table(spark, "documents", sf_dir)
    page = docs.select("doc_id", "source", _pii_page().alias("page"))
    counted = page.select(
        "source",
        F.length("page").alias("chars"),
        F.regexp_count("page", F.lit(_EMAIL_RE)).alias("emails"),
        F.regexp_count("page", F.lit(_PHONE_RE)).alias("phones"),
        F.regexp_count("page", F.lit(_PRIVIP_RE)).alias("ips"))
    per10k = [
        F.round(F.sum(c) * 10000.0 / F.sum("chars"), 4)
        .alias(f"{c}_per_10k")
        for c in ("emails", "phones", "ips")]
    return (counted.groupBy("source")
            .agg(F.sum("chars").alias("chars"),
                 F.sum("emails").cast("long").alias("emails"),
                 F.sum("phones").cast("long").alias("phones"),
                 F.sum("ips").cast("long").alias("ips"),
                 *per10k)
            .orderBy("source"))


PII_DENSITY_ORACLE = f"""
WITH page AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                      || '.example' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call +1-555-'
                      || CAST(doc_id % 9000 + 1000 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id // 7) % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END AS page
  FROM documents),
counted AS (
  SELECT source, length(page) AS chars,
         len(regexp_extract_all(page, '{_EMAIL_RE}')) AS emails,
         len(regexp_extract_all(page, '{_PHONE_RE}')) AS phones,
         len(regexp_extract_all(page, '{_PRIVIP_RE}')) AS ips
  FROM page)
SELECT source,
       CAST(sum(chars) AS BIGINT) AS chars,
       CAST(sum(emails) AS BIGINT) AS emails,
       CAST(sum(phones) AS BIGINT) AS phones,
       CAST(sum(ips) AS BIGINT) AS ips,
       round(sum(emails) * 10000.0 / sum(chars), 4)
         AS emails_per_10k,
       round(sum(phones) * 10000.0 / sum(chars), 4)
         AS phones_per_10k,
       round(sum(ips) * 10000.0 / sum(chars), 4) AS ips_per_10k
FROM counted GROUP BY source ORDER BY source
"""


# --------------------------------------------- url_blocklist_filter

_BLOCKED = ["gamma.dev", "mirror.delta.io"]


def url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filtering: a doc is dropped when ANY of its
    extracted link hosts is a blocked domain or a subdomain of one
    ('gamma.dev' blocks 'mirror.gamma.dev' too — registrable-domain
    suffix semantics). The blocklist is a plan-time literal (real
    blocklists broadcast); host extraction + the ANY-match are an
    array lambda over the regexp_extract_all result — no explode,
    the row count never changes before the final groupBy."""
    docs = load_table(spark, "documents", sf_dir)
    pages = docs.select("doc_id", "source",
                        _url_page().alias("page"))
    checks = " OR ".join(
        f"h = '{b}' OR endswith(h, '.{b}')" for b in _BLOCKED)
    blocked = F.expr(
        f"exists(regexp_extract_all(page, '{_URL_RE}', 1), "
        f"h -> {checks})")
    return (pages.select("source", blocked.alias("blocked"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("blocked"), 1).otherwise(0))
                 .cast("long").alias("n_dropped"),
                 F.sum(F.when(F.col("blocked"), 0).otherwise(1))
                 .cast("long").alias("n_kept"))
            .orderBy("source"))


def _blocklist_oracle() -> str:
    case = " ".join(f"WHEN {i} THEN '{d}'"
                    for i, d in enumerate(_URL_DOMAINS))
    checks = " OR ".join(
        f"h = '{b}' OR suffix(h, '.{b}')" for b in _BLOCKED)
    return f"""
WITH pages AS (
  SELECT doc_id, source,
         concat(text, ' see https://',
                CASE doc_id % 5 {case} END,
                '/p/', CAST(doc_id AS VARCHAR)) ||
         CASE WHEN doc_id % 3 = 0
              THEN concat(' and http://mirror.',
                          CASE doc_id % 5 {case} END, '/x')
              ELSE '' END AS page
  FROM documents),
flagged AS (
  SELECT source,
         len(list_filter(regexp_extract_all(page, '{_URL_RE}', 1),
                         h -> {checks})) > 0 AS blocked
  FROM pages)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE blocked) AS BIGINT) AS n_dropped,
       CAST(count(*) FILTER (WHERE NOT blocked) AS BIGINT) AS n_kept
FROM flagged GROUP BY source ORDER BY source
"""


QUERIES.update({
    "dedup_edit_distance": dedup_edit_distance,
    "url_dedup_normalized": url_dedup_normalized,
    "pii_density": pii_density,
    "url_blocklist_filter": url_blocklist_filter,
})
ORACLES.update({
    "dedup_edit_distance": DEDUP_EDIT_DISTANCE_ORACLE,
    "url_dedup_normalized": URL_DEDUP_ORACLE,
    "pii_density": PII_DENSITY_ORACLE,
    "url_blocklist_filter": _blocklist_oracle(),
})
