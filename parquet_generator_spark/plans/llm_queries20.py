"""LLM-pipeline wave 20: EXIF orientation — a TWO-LEVEL container
walk (JPEG APP1 segment -> embedded TIFF structure).

Every real image pipeline needs EXIF orientation before resizing or
captioning (orientations 5-8 transpose width/height; ignoring them
feeds models sideways images). Structurally this is the hardest
metadata parse in the corpus family: a JPEG marker segment whose
payload is a SECOND container (TIFF) with its OWN byte order chosen
per file ('II' little / 'MM' big), a parsed IFD offset that must be
followed (not assumed), and a variable-length entry table that must
be SCANNED for tag 0x0112 — three data-dependent indirections, all
unrolled to codegen substring+hex arithmetic. No UDF, no shuffle.

Payload variability (so fixed-offset or fixed-endianness parsers
hash-mismatch immediately): byte order alternates per doc, the IFD
offset carries 4 bytes of pad on every 3rd doc, and the entry count
is 3 or 4 with Orientation always LAST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _hx(c, n: int):
    """n-byte big-endian hex string of an int column."""
    return F.lpad(F.hex(c.cast("long")), 2 * n, "0")


def _hx_le(c, n: int):
    """n-byte little-endian hex string of an int column."""
    parts = [
        F.lpad(F.hex(F.floor(c / (1 << (8 * i))).cast("long") % 256),
               2, "0")
        for i in range(n)]
    return F.concat(*parts)


def _exif_payload():
    """SOI + APP1("Exif\\0\\0" + TIFF): header byte order II/MM, IFD
    offset 8 or 12 (4 pad bytes), 3-4 IFD entries (ImageWidth,
    ImageLength, [ResolutionUnit], Orientation last), zero next-IFD
    pointer. Everything a real camera writes, minus the thumbnail.

    Column expressions build INSIDE this function, never at module
    scope: classic PySpark's F.col() needs an active SparkContext,
    and the driver/bench import this module before starting one."""
    _W = (F.col("n_chars") % 512 + 16).cast("int")
    _H = (F.col("n_chars") % 384 + 16).cast("int")
    _ORI = (F.col("doc_id") % 8 + 1).cast("int")
    _LE = F.col("doc_id") % 2 == 0      # 'II' on even docs
    _PAD = F.col("doc_id") % 3 == 0     # IFD offset 12, not 8
    _N_ENTRIES = (F.col("doc_id") % 2 + 3).cast("int")  # 3 or 4

    def u16(c):
        return F.when(_LE, _hx_le(c, 2)).otherwise(_hx(c, 2))

    def u32(c):
        return F.when(_LE, _hx_le(c, 4)).otherwise(_hx(c, 4))

    def entry(tag: int, val):
        return F.concat(u16(F.lit(tag)), u16(F.lit(3)),
                        u32(F.lit(1)), u16(val), F.lit("0000"))

    bo = F.when(_LE, F.lit("4949")).otherwise(F.lit("4D4D"))
    magic = F.when(_LE, F.lit("2A00")).otherwise(F.lit("002A"))
    ifd_off = F.when(_PAD, F.lit(12)).otherwise(F.lit(8))
    pad = F.when(_PAD, F.lit("00000000")).otherwise(F.lit(""))
    extra = F.when(F.col("doc_id") % 2 == 1,
                   entry(0x0128, F.lit(2))).otherwise(F.lit(""))
    tiff = F.concat(
        bo, magic, u32(ifd_off), pad,
        u16(_N_ENTRIES),
        entry(0x0100, _W), entry(0x0101, _H), extra,
        entry(0x0112, _ORI),
        F.lit("00000000"))
    tiff_bytes = F.length(tiff) / 2
    app1_len = (tiff_bytes + 8).cast("int")  # len(2) + "Exif\0\0"(6)
    return F.unhex(F.concat(
        F.lit("FFD8"), F.lit("FFE1"), _hx(app1_len, 2),
        F.lit("457869660000"), tiff))


def exif_orientation_parse(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Parse EXIF orientation the way a 100-TB profiling pass must:
    verify the APP1/Exif envelope, read the TIFF byte-order mark,
    branch EVERY later read on it, FOLLOW the parsed IFD offset
    (not byte 8 — a third of the corpus pads it), scan the IFD
    entry table for tag 0x0112, and emit orientation + the
    transpose flag (orientations 5-8 swap width/height downstream).
    The unrolled entry scan covers 4 slots; dims read back from
    their own tags as a cross-check."""
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(F.col("doc_id").alias("media_id"),
                        _exif_payload().alias("payload"))

    def b(pos):
        return (F.conv(F.hex(F.expr(
            f"substring(payload, CAST({pos} AS INT), 1)")), 16, 10)
            .cast("int"))

    le = b("13") == 0x49  # 'I'

    def rd16(pos):
        return F.when(le, b(pos) + b(f"({pos}) + 1") * 256) \
            .otherwise(b(pos) * 256 + b(f"({pos}) + 1"))

    def rd32(pos):
        out = None
        for i in range(4):
            byte = b(f"({pos}) + {i}")
            term = F.when(le, byte * (1 << (8 * i))) \
                .otherwise(byte * (1 << (8 * (3 - i))))
            out = term if out is None else out + term
        return out

    # TIFF structure starts at byte 13 (1-based); offsets inside the
    # file are relative to it
    media = (media
             .withColumn("_ok", (b("3") == 0xFF) & (b("4") == 0xE1)
                         & (F.expr("substring(payload, 7, 6)")
                            == F.unhex(F.lit("457869660000"))))
             .withColumn("_le", le)
             .withColumn("_ifd", (F.lit(13) + rd32("17")).cast("int")))
    n = rd16("_ifd")
    media = media.withColumn("_n", n.cast("int"))

    tag_cols, val_cols = [], []
    for i in range(4):
        pos = f"_ifd + 2 + {12 * i}"
        tag_cols.append(rd16(pos))
        val_cols.append(rd16(f"({pos}) + 8"))

    def find(tag: int):
        # entry-table scan, first hit wins; slots beyond the parsed
        # entry count must not match (they'd read past the IFD)
        out = F.lit(None).cast("int")
        for i in range(3, -1, -1):
            out = F.when(
                (F.lit(i) < F.col("_n")) & (tag_cols[i] == tag),
                val_cols[i]).otherwise(out)
        return out

    ori = find(0x0112)
    return (media.select(
        "media_id",
        F.when(F.col("_le"), F.lit("II")).otherwise(F.lit("MM"))
        .alias("byte_order"),
        F.col("_n").alias("n_entries"),
        find(0x0100).alias("width"),
        find(0x0101).alias("height"),
        ori.alias("orientation"),
        (ori >= 5).alias("needs_transpose"),
        F.col("_ok").alias("envelope_ok"))
        .orderBy("media_id"))


EXIF_ORIENTATION_ORACLE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
       CAST(doc_id % 2 + 3 AS INT) AS n_entries,
       CAST(n_chars % 512 + 16 AS INT) AS width,
       CAST(n_chars % 384 + 16 AS INT) AS height,
       CAST(doc_id % 8 + 1 AS INT) AS orientation,
       doc_id % 8 + 1 >= 5 AS needs_transpose,
       true AS envelope_ok
FROM documents ORDER BY media_id
"""


QUERIES.update({"exif_orientation_parse": exif_orientation_parse})
ORACLES.update({"exif_orientation_parse": EXIF_ORIENTATION_ORACLE})


# ---------------------------------------------- hard_negative_mining

_HN_N_QUERIES = 20     # mine negatives for the first 20 vectors
_HN_LO, _HN_HI = 0.25, 0.45
_HN_K = 5
_HN_CELLS = 16
_HN_PROBE = 16  # probe ALL cells: the band's tail matters more than
#                 speed here, and recall of mid-similarity pairs
#                 under few probes is untested; production drops this


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retriever training: for
    each query vector, the top-k candidates whose cosine lands in
    the HARD band [0.25, 0.45] — similar enough to teach the margin,
    far enough to be true negatives. (Production thresholds are
    ~[0.7, 0.95]; this synthetic corpus' noise vectors top out at
    cos 0.49, so the band is shifted — the plan is identical.)
    Candidates come from the IVF cell equi-join (query side bounded
    at 20 rows and broadcast; corpus side shuffles on the cell key),
    so nothing is all-pairs; the per-query rank windows are keyed by
    qid."""
    from pyspark.sql import Window

    from parquet_generator_spark.operators.similarity import (
        dot,
        ivf_assign_cells,
        make_centroids_from_corpus,
        norm,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cents = make_centroids_from_corpus(emb, _HN_CELLS)
    c = (ivf_assign_cells(emb, cents, 1)
         .select(F.col("vec_id").alias("nid"),
                 F.col("embedding").alias("nvec"),
                 norm("embedding").alias("nn"), "cell"))
    q = (ivf_assign_cells(emb.filter(F.col("vec_id") < _HN_N_QUERIES),
                          cents, _HN_PROBE)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qvec"),
                 norm("embedding").alias("qn"), "cell"))
    cos = F.round(dot("qvec", "nvec") / (F.col("qn") * F.col("nn")), 4)
    band = (c.join(F.broadcast(q), "cell")
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid", cos.alias("cos"))
            .dropDuplicates(["qid", "nid"])
            .filter((F.col("cos") >= _HN_LO) & (F.col("cos") <= _HN_HI)))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (band.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _HN_K)
            .select("qid", "rank", F.col("nid").alias("neg_id"), "cos")
            .orderBy("qid", "rank"))


def _hard_negative_oracle() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS ce
  FROM (SELECT * FROM v ORDER BY vec_id LIMIT {_HN_CELLS})),
sims AS (
  SELECT v.vec_id, v.e, cent.cell,
         list_dot_product(v.e, cent.ce)
           / sqrt(list_dot_product(v.e, v.e)) AS sim
  FROM v CROSS JOIN cent),
cells AS (
  SELECT vec_id, e, cell,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cell ASC) AS pr
  FROM sims),
c AS (SELECT vec_id, e, cell FROM cells WHERE pr = 1),
qc AS (SELECT vec_id, e, cell FROM cells
       WHERE pr <= {_HN_PROBE} AND vec_id < {_HN_N_QUERIES}),
band AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid,
         round(list_dot_product(q.e, c.e) /
               (sqrt(list_dot_product(q.e, q.e)) *
                sqrt(list_dot_product(c.e, c.e))), 4) AS cos
  FROM qc q JOIN c ON q.cell = c.cell
  WHERE q.vec_id != c.vec_id),
ranked AS (
  SELECT qid, nid, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, nid ASC) AS rank
  FROM band WHERE cos BETWEEN {_HN_LO} AND {_HN_HI})
SELECT qid, rank, nid AS neg_id, cos
FROM ranked WHERE rank <= {_HN_K}
ORDER BY qid, rank
"""


QUERIES.update({"hard_negative_mining": hard_negative_mining})
ORACLES.update({"hard_negative_mining": _hard_negative_oracle()})


# ------------------------------------ embedding_outlier_mahalanobis

_MAH_K = 15


def embedding_outlier_mahalanobis(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Embedding QA by diagonal Mahalanobis distance: per-dimension
    mean/std over the corpus, then each vector's distance
    sqrt(mean_d((x_d - mu_d)^2 / sd_d^2)) — the covariance-aware
    upgrade of the norm-outlier check (embedding_norm_outliers),
    catching vectors that are wrong in DIRECTION, not just length.
    Per-dim stats come from one posexplode + 64-bucket groupBy and
    attach as dim-bounded LITERAL arrays (the kmeans-centroid
    pattern); the scoring pass is a pure zip_with fold — one scan,
    no join. Top-k via TakeOrderedAndProject."""
    emb = load_table(spark, "embeddings", sf_dir)
    stats = (emb.select(F.posexplode("embedding")
                        .alias("pos", "x"))
             .groupBy("pos")
             .agg(F.avg("x").alias("mu"),
                  F.stddev_pop("x").alias("sd"))
             .orderBy("pos")
             .collect())
    mu = F.array(*[F.lit(float(r["mu"])) for r in stats])
    sd = F.array(*[F.lit(float(r["sd"])) for r in stats])
    dim = len(stats)
    z2 = F.aggregate(
        F.zip_with(
            F.zip_with(F.col("embedding").cast("array<double>"), mu,
                       lambda x, m: x - m),
            sd, lambda d, s: (d / s) * (d / s)),
        F.lit(0.0), lambda acc, v: acc + v)
    dist = F.round(F.sqrt(z2 / F.lit(float(dim))), 4)
    top = (emb.select("vec_id", "label", dist.alias("m_dist"))
           .orderBy(F.desc("m_dist"), F.asc("vec_id"))
           .limit(_MAH_K))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("m_dist"), F.asc("vec_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "vec_id", "label", "m_dist")
            .orderBy("rank"))


EMBEDDING_MAHALANOBIS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings),
x AS (
  SELECT vec_id, label, unnest(emb) AS x,
         generate_subscripts(emb, 1) AS pos
  FROM e),
stats AS (
  SELECT pos, avg(x) AS mu, stddev_pop(x) AS sd
  FROM x GROUP BY pos),
scored AS (
  SELECT vec_id, any_value(label) AS label,
         round(sqrt(sum(((x.x - mu) / sd) * ((x.x - mu) / sd))
                    / count(*)), 4) AS m_dist
  FROM x JOIN stats USING (pos)
  GROUP BY vec_id),
top AS (
  SELECT vec_id, label, m_dist FROM scored
  ORDER BY m_dist DESC, vec_id ASC LIMIT {_MAH_K})
SELECT CAST(row_number() OVER (ORDER BY m_dist DESC, vec_id) AS INT)
         AS rank,
       vec_id, label, m_dist
FROM top ORDER BY rank
"""


QUERIES.update({"embedding_outlier_mahalanobis":
                embedding_outlier_mahalanobis})
ORACLES.update({"embedding_outlier_mahalanobis":
                EMBEDDING_MAHALANOBIS_ORACLE})


# ------------------------------------------------ lexicon_filter_stats

# tier-0 blocklist screening: real pipelines run a profanity /
# unsafe-content lexicon before any model-based filter. The corpus
# is word salad, so the "lexicon" is drawn from its own vocabulary —
# the OPERATOR (token-anchored lexicon hits, per-doc flagging at a
# hit threshold, per-source rates) is the production shape.
_LEXICON = ["slow", "error"]
_LEX_FLAG_MIN = 3     # docs with >= 3 total lexicon hits get flagged


def lexicon_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon screening stats per source: total lexicon hits, hit
    density per 10k tokens, and how many docs the >= 3-hits rule
    would drop. Hits are TOKEN-anchored regex counts (substring
    matches would flag 'slower' for 'slow' — the classic lexicon
    false positive), all codegen, one scan, one 20-bucket groupBy."""
    from parquet_generator_spark.operators.esdsl import _B_L, _B_R

    docs = load_table(spark, "documents", sf_dir)
    hit_cols = [
        F.regexp_count(F.lower(F.col("text")),
                       F.lit(f"{_B_L}{w}{_B_R}")).alias(f"h_{w}")
        for w in _LEXICON]
    toks = F.size(F.split(F.col("text"), " "))
    per_doc = docs.select("source", toks.alias("n_toks"), *hit_cols)
    total_hits = sum(F.col(f"h_{w}") for w in _LEXICON)
    per_doc = per_doc.withColumn("hits", total_hits)
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("hits").cast("long").alias("lexicon_hits"),
                 F.round(F.sum("hits") * 10000.0 / F.sum("n_toks"), 4)
                 .alias("hits_per_10k_tokens"),
                 F.sum(F.when(F.col("hits") >= _LEX_FLAG_MIN, 1)
                       .otherwise(0)).cast("long").alias("n_flagged"))
            .orderBy("source"))


def _lexicon_oracle() -> str:
    from parquet_generator_spark.operators.esdsl import _B_L, _B_R

    hits = " + ".join(
        f"len(regexp_extract_all(lower(text), '{_B_L}{w}{_B_R}'))"
        for w in _LEXICON)
    return f"""
WITH per_doc AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_toks,
         {hits} AS hits
  FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(hits) AS BIGINT) AS lexicon_hits,
       round(sum(hits) * 10000.0 / sum(n_toks), 4)
         AS hits_per_10k_tokens,
       CAST(count(*) FILTER (WHERE hits >= {_LEX_FLAG_MIN}) AS BIGINT)
         AS n_flagged
FROM per_doc GROUP BY source ORDER BY source
"""


QUERIES.update({"lexicon_filter_stats": lexicon_filter_stats})
ORACLES.update({"lexicon_filter_stats": _lexicon_oracle()})


# -------------------------------------------------- dup_rate_by_source

def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication impact — the data-card line a source
    negotiation actually uses: of each source's docs, how many sit
    in a multi-member exact-content group (md5), how many would
    survive keep-one dedup, and the duplicate rate. One hash groupBy
    (the exact-dedup shuffle) re-joined to the doc frame on the
    hash key; all frames stay hash/doc-cardinality, no pairs."""
    docs = load_table(spark, "documents", sf_dir)
    hashed = docs.select("source", F.md5("text").alias("h"))
    groups = (hashed.groupBy("h")
              .agg(F.count(F.lit(1)).alias("gsize")))
    return (hashed.join(groups, "h")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("gsize") > 1, 1).otherwise(0))
                 .cast("long").alias("n_in_dup_groups"),
                 F.countDistinct("h").alias("n_unique_contents"),
                 F.round(F.sum(F.when(F.col("gsize") > 1, 1)
                               .otherwise(0))
                         / F.count(F.lit(1)), 4).alias("dup_rate"))
            .orderBy("source"))


DUP_RATE_BY_SOURCE_ORACLE = """
WITH hashed AS (SELECT source, md5(text) AS h FROM documents),
groups AS (SELECT h, count(*) AS gsize FROM hashed GROUP BY h)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE gsize > 1) AS BIGINT)
         AS n_in_dup_groups,
       CAST(count(DISTINCT hashed.h) AS BIGINT) AS n_unique_contents,
       round(count(*) FILTER (WHERE gsize > 1)
             / CAST(count(*) AS DOUBLE), 4) AS dup_rate
FROM hashed JOIN groups ON hashed.h = groups.h
GROUP BY source ORDER BY source
"""


QUERIES.update({"dup_rate_by_source": dup_rate_by_source})
ORACLES.update({"dup_rate_by_source": DUP_RATE_BY_SOURCE_ORACLE})
