"""Multimodal container walks and corpus text-profiling, wave 17.

Two container formats the earlier header parsers don't cover —
ISO-BMFF (MP4, the video case: a box WALK whose second read position
depends on the first box's parsed size) and WebP (RIFF with three
mutually exclusive bitstream variants branched per row) — plus two
text-profiling passes a training-data pipeline runs corpus-wide:
classic readability formulas and URL/domain extraction. Everything is
whole-stage-codegen expression arithmetic over one scan: no UDF, no
shuffle except the final domain groupBy.

Like the BMP/PNG/GIF/TIFF/JPEG waves, media payloads are planted
in-query as deterministic functions of (doc_id, n_chars) so every SF
has real bytes to parse and the DuckDB oracle can recompute the
expected fields arithmetically — any endianness, offset-walk, or
bit-slicing bug mismatches the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _be32(c):
    """4 big-endian bytes of a non-negative int64 column (< 2^31)."""
    return F.unhex(F.lpad(F.hex(c.cast("long")), 8, "0"))


def _le_bytes(c, n):
    """n little-endian bytes of a non-negative int64 column."""
    return F.concat(*[
        F.unhex(F.lpad(F.hex(F.floor(c / (1 << (8 * i)))
                             .cast("long") % 256), 2, "0"))
        for i in range(n)])


def _rd_be(pos, n):
    """Parse n big-endian bytes at a 1-based position expression."""
    return F.conv(F.hex(F.expr(
        f"substring(payload, cast(({pos}) as int), {n})")),
        16, 10).cast("long")


def _rd_byte(pos):
    return F.conv(F.hex(F.expr(
        f"substring(payload, cast(({pos}) as int), 1)")),
        16, 10).cast("long")


def _rd_le(pos, n):
    """Parse n little-endian bytes at a 1-based position expression."""
    out = None
    for i in range(n):
        term = _rd_byte(f"({pos}) + {i}") * (1 << (8 * i))
        out = term if out is None else out + term
    return out


# ---------------------------------------------------- mp4_header_parse

_MP4_BRANDS = ["isom", "mp42", "avc1"]
_MP4_COMPAT = ["mp41", "iso2", "avc1"]


def _mp4_payload():
    """Planted ISO-BMFF prefix: an `ftyp` box whose size VARIES with
    the number of compatible brands (1-3, so 20/24/28 bytes — the
    walk to box 2 must use the parsed size, not a constant), then
    the second box's 8-byte header (`mdat` on even docs, `free` on
    odd) with a data-dependent declared size."""
    n_compat = (F.col("doc_id") % 3 + 1).cast("int")
    ftyp_size = n_compat * 4 + 16
    brand = F.element_at(F.array(*[F.lit(b) for b in _MP4_BRANDS]),
                         (F.col("doc_id") % 3 + 1).cast("int"))
    minver = (F.col("doc_id") % 512).cast("long")
    compat = F.expr(
        "substring('" + "".join(_MP4_COMPAT) + "', 1, "
        "cast((doc_id % 3 + 1) * 4 as int))")
    box2_size = (F.col("n_chars") % 65536 + 16).cast("long")
    box2_type = F.when(F.col("doc_id") % 2 == 0, F.lit("mdat")) \
        .otherwise(F.lit("free"))
    return F.concat(
        _be32(ftyp_size), F.encode(F.lit("ftyp"), "UTF-8"),
        F.encode(brand, "UTF-8"), _be32(minver),
        F.encode(compat, "UTF-8"),
        _be32(box2_size), F.encode(box2_type, "UTF-8"))


def mp4_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-BMFF (MP4) box walk: parse the `ftyp` box header
    (big-endian size + fourcc), read major_brand / minor_version /
    compatible-brand count from inside it, then JUMP to byte
    offset ftyp_size+1 — a position computed from parsed bytes, the
    defining move of a container walk — and read the second box's
    size and fourcc. Pure codegen; one scan, no shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(F.col("doc_id").alias("media_id"),
                        _mp4_payload().alias("payload"))
    size1 = _rd_be("1", 4)
    media = media.withColumn("sz1", size1)
    n_compat = (F.col("sz1") - 16) / 4
    return (media.select(
        "media_id",
        F.expr("decode(substring(payload, 5, 4), 'UTF-8')")
        .alias("box1_type"),
        F.col("sz1").alias("ftyp_size"),
        F.expr("decode(substring(payload, 9, 4), 'UTF-8')")
        .alias("major_brand"),
        _rd_be("13", 4).alias("minor_version"),
        n_compat.cast("int").alias("n_compat_brands"),
        F.expr("decode(substring(payload, cast(sz1 + 5 as int), 4), "
               "'UTF-8')").alias("box2_type"),
        _rd_be("sz1 + 1", 4).alias("box2_size"))
        .orderBy("media_id"))


MP4_HEADER_ORACLE = """
SELECT doc_id AS media_id,
       'ftyp' AS box1_type,
       CAST((doc_id % 3 + 1) * 4 + 16 AS BIGINT) AS ftyp_size,
       CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
            ELSE 'avc1' END AS major_brand,
       CAST(doc_id % 512 AS BIGINT) AS minor_version,
       CAST(doc_id % 3 + 1 AS INT) AS n_compat_brands,
       CASE WHEN doc_id % 2 = 0 THEN 'mdat' ELSE 'free' END
         AS box2_type,
       CAST(n_chars % 65536 + 16 AS BIGINT) AS box2_size
FROM documents ORDER BY media_id
"""


# --------------------------------------------------- webp_header_parse

def _webp_payload():
    """Planted WebP: RIFF header + one of the three bitstream
    variants — 'VP8 ' (lossy: 3-byte frame tag, 3-byte sync,
    14-bit LE dims), 'VP8L' (lossless: signature byte, dims packed
    as two 14-bit fields in a 32-bit LE word), 'VP8X' (extended:
    flags byte + 24-bit LE canvas dims minus one)."""
    w = (F.col("n_chars") % 2048 + 1).cast("long")
    h = (F.col("doc_id") * 7 % 1024 + 1).cast("long")
    variant = F.col("doc_id") % 3

    lossy = F.concat(F.encode(F.lit("VP8 "), "UTF-8"),
                     _le_bytes(F.lit(10), 4),
                     F.unhex(F.lit("000000")),      # frame tag
                     F.unhex(F.lit("9D012A")),      # sync code
                     _le_bytes(w, 2), _le_bytes(h, 2))
    packed = w - 1 + (h - 1) * 16384
    lossless = F.concat(F.encode(F.lit("VP8L"), "UTF-8"),
                        _le_bytes(F.lit(5), 4),
                        F.unhex(F.lit("2F")),       # signature
                        _le_bytes(packed, 4))
    extended = F.concat(F.encode(F.lit("VP8X"), "UTF-8"),
                        _le_bytes(F.lit(7), 4),
                        _le_bytes(F.col("doc_id") % 256, 1),
                        _le_bytes(w - 1, 3), _le_bytes(h - 1, 3))
    chunk = F.when(variant == 0, lossy) \
        .when(variant == 1, lossless).otherwise(extended)
    body_len = F.when(variant == 0, F.lit(10)) \
        .when(variant == 1, F.lit(5)).otherwise(F.lit(7)).cast("long")
    riff_size = body_len + 12
    return F.concat(F.encode(F.lit("RIFF"), "UTF-8"),
                    _le_bytes(riff_size, 4),
                    F.encode(F.lit("WEBP"), "UTF-8"), chunk)


def webp_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP (RIFF) parse with PER-ROW variant branching: the chunk
    fourcc decides which of three dimension encodings applies —
    lossy 14-bit LE halfwords, lossless 14+14-bit packed LE word,
    or extended 24-bit LE minus-one — the format-dispatch case a
    single-variant parser never exercises. Codegen only."""
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(F.col("doc_id").alias("media_id"),
                        _webp_payload().alias("payload"))
    fourcc = F.expr("decode(substring(payload, 13, 4), 'UTF-8')")
    media = media.withColumn("fourcc", fourcc)
    # chunk body starts at byte 21 (RIFF 12 + fourcc 4 + size 4)
    lossy_w = _rd_le("27", 2) % 16384
    lossy_h = _rd_le("29", 2) % 16384
    ll_packed = _rd_le("22", 4)
    ll_w = ll_packed % 16384 + 1
    ll_h = F.floor(ll_packed / 16384) % 16384 + 1
    ext_w = _rd_le("22", 3) + 1
    ext_h = _rd_le("25", 3) + 1
    is_lossy = F.col("fourcc") == "VP8 "
    is_ll = F.col("fourcc") == "VP8L"
    sync_ok = F.when(is_lossy, _rd_be("24", 3) == 0x9D012A) \
        .when(is_ll, _rd_byte("21") == 0x2F).otherwise(F.lit(True))
    return (media.select(
        "media_id",
        F.expr("decode(substring(payload, 1, 4), 'UTF-8')")
        .alias("riff_tag"),
        _rd_le("5", 4).alias("riff_size"),
        F.col("fourcc").alias("variant"),
        sync_ok.alias("sync_ok"),
        F.when(is_lossy, lossy_w).when(is_ll, ll_w)
        .otherwise(ext_w).alias("width"),
        F.when(is_lossy, lossy_h).when(is_ll, ll_h)
        .otherwise(ext_h).alias("height"))
        .orderBy("media_id"))


WEBP_HEADER_ORACLE = """
SELECT doc_id AS media_id,
       'RIFF' AS riff_tag,
       CAST(CASE doc_id % 3 WHEN 0 THEN 22 WHEN 1 THEN 17
            ELSE 19 END AS BIGINT) AS riff_size,
       CASE doc_id % 3 WHEN 0 THEN 'VP8 ' WHEN 1 THEN 'VP8L'
            ELSE 'VP8X' END AS variant,
       TRUE AS sync_ok,
       CAST(n_chars % 2048 + 1 AS BIGINT) AS width,
       CAST(doc_id * 7 % 1024 + 1 AS BIGINT) AS height
FROM documents ORDER BY media_id
"""


# -------------------------------------------------- readability_scores

_FRE = ("cast(206.835 as double) "
        "- cast(1.015 as double) * (cast(words as double) "
        "/ cast(sentences as double)) "
        "- cast(84.6 as double) * (cast(syllables as double) "
        "/ cast(words as double))")
_FKG = ("cast(0.39 as double) * (cast(words as double) "
        "/ cast(sentences as double)) "
        "+ cast(11.8 as double) * (cast(syllables as double) "
        "/ cast(words as double)) - cast(15.59 as double)")


def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Flesch reading-ease and Flesch-Kincaid grade
    over regex-counted words / vowel-group syllables / sentence
    marks ([.!?]+, min 1 — the corpus has unpunctuated docs). One
    narrow projection pass, formulas evaluated per row (no
    aggregation, so no cross-engine float-sum-order hazard)."""
    docs = load_table(spark, "documents", sf_dir)
    return (docs
            .withColumn("words", F.regexp_count("text", F.lit("[a-z]+")))
            .withColumn("syllables",
                        F.regexp_count("text", F.lit("[aeiouy]+")))
            .withColumn("sentences", F.greatest(
                F.lit(1),
                F.regexp_count("text", F.lit("[.!?]+"))))
            .filter(F.col("words") > 0)
            .select("doc_id", "words", "syllables", "sentences",
                    F.expr(_FRE).alias("fre"),
                    F.expr(_FKG).alias("fk_grade"))
            .orderBy("doc_id"))


READABILITY_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '[a-z]+')) AS INT)
           AS words,
         CAST(length(regexp_extract_all(text, '[aeiouy]+')) AS INT)
           AS syllables,
         CAST(greatest(1,
              length(regexp_extract_all(text, '[.!?]+'))) AS INT)
           AS sentences
  FROM documents)
SELECT doc_id, words, syllables, sentences,
       {_FRE} AS fre,
       {_FKG} AS fk_grade
FROM c WHERE words > 0 ORDER BY doc_id
"""


# ---------------------------------------------------- url_domain_stats

_URL_DOMAINS = ["alpha.example", "beta.example", "gamma.dev",
                "delta.io", "epsilon.net"]
_URL_RE = "https?://([a-z0-9.-]+)"


def _url_page():
    """Documents carry no URLs (word-salad corpus), so links are
    planted deterministically — one https link per doc, plus an
    http mirror link on every third doc — and then extracted with
    the REAL corpus regex, so the extraction path is exercised
    end-to-end and the oracle can recompute the histogram."""
    dom = F.element_at(F.array(*[F.lit(d) for d in _URL_DOMAINS]),
                       (F.col("doc_id") % 5 + 1).cast("int"))
    page = F.concat(F.col("text"), F.lit(" see https://"), dom,
                    F.lit("/p/"), F.col("doc_id").cast("string"))
    mirror = F.concat(F.lit(" and http://mirror."), dom, F.lit("/x"))
    return F.when(F.col("doc_id") % 3 == 0,
                  F.concat(page, mirror)).otherwise(page)


def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + domain histogram, the link-graph profiling
    pass of a web-corpus pipeline: regex-extract every URL host,
    explode, group by host — link count, distinct linking docs, and
    the secure fraction (https links / all links) per host. One
    narrow scan, one groupBy shuffle on the (tiny) host key."""
    docs = load_table(spark, "documents", sf_dir)
    pages = docs.select("doc_id", _url_page().alias("page"))
    url = pages.select(
        "doc_id",
        F.explode(F.expr(
            f"regexp_extract_all(page, '{_URL_RE}', 0)")).alias("url"))
    host = F.regexp_extract("url", _URL_RE, 1)
    return (url
            .select("doc_id", host.alias("host"),
                    F.col("url").startswith("https").alias("secure"))
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_links"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.sum(F.when(F.col("secure"), 1).otherwise(0))
                 .alias("n_https"))
            .orderBy("host"))


def _url_domain_oracle() -> str:
    case = " ".join(f"WHEN {i} THEN '{d}'"
                    for i, d in enumerate(_URL_DOMAINS))
    return f"""
WITH pages AS (
  SELECT doc_id,
         concat(text, ' see https://',
                CASE doc_id % 5 {case} END,
                '/p/', CAST(doc_id AS VARCHAR)) ||
         CASE WHEN doc_id % 3 = 0
              THEN concat(' and http://mirror.',
                          CASE doc_id % 5 {case} END, '/x')
              ELSE '' END AS page
  FROM documents),
urls AS (
  SELECT doc_id, unnest(regexp_extract_all(page, '{_URL_RE}', 0))
           AS url
  FROM pages)
SELECT regexp_extract(url, '{_URL_RE}', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN url LIKE 'https%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_https
FROM urls GROUP BY host ORDER BY host
"""


QUERIES.update({"mp4_header_parse": mp4_header_parse,
                "webp_header_parse": webp_header_parse,
                "readability_scores": readability_scores,
                "url_domain_stats": url_domain_stats})
ORACLES.update({"mp4_header_parse": MP4_HEADER_ORACLE,
                "webp_header_parse": WEBP_HEADER_ORACLE,
                "readability_scores": READABILITY_ORACLE,
                "url_domain_stats": _url_domain_oracle()})
