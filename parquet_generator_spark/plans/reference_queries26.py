"""ES|QL tranche three: ENRICH (the Kibana lookup staple), GROK,
ES-semantics LIKE/RLIKE + CASE, the MV_* multivalue family, and
exact interpolated MEDIAN/PERCENTILE in STATS.

All five ride the ordered-command esql.py core: one parse produces
one command list, two renderers consume it sequentially, so the
Spark plan and the DuckDB oracle cannot drift structurally.

Reference parity: ES|QL per the public ES 8.11+ grammar (the
reference repo — liujiawinds/parquet-generator, Bootstrap.java — is
an ETL tool with no query language; the translation generalizes
what its ES indices get queried WITH).

Scale notes:
- esql_enrich: BOTH enrich policies broadcast (ES materializes the
  enrich index on every node — same contract), so the orders scan
  never shuffles before the aggregation; two BroadcastHashJoins +
  one hash-agg with map-side combine. At 100 TB the fact scan
  partitions freely; the dims stay node-local.
- esql_grok: regexp_extract is pure codegen over one projected
  column — narrow, shuffle-free until the small-key groupBy.
- esql_case_like: the LIKE/IN/RLIKE disjunction stays in the scan
  filter (StartsWith pushes down; the residual predicate is still
  codegen); CASE is a plain conditional projection.
- esql_mv_funcs: the MV family is higher-order array codegen
  (size/sort_array/array_distinct/array_join) — per-row, no
  shuffle, no Python; the only shuffle is the 5-key lang groupBy.
- esql_stats_percentiles: exact interpolated percentile is a
  sort-based agg per group — fine at bounded group count; the
  approx scale path (percentile_approx) is the documented swap,
  as in dsl_percentiles (reference_queries2.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_generator_spark.operators.esql import (
    EnrichPolicy,
    esql_df,
    esql_duck_sql,
    parse_esql,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# the enrich-policy store (ES keeps these server-side; here they are
# plan-time constants shared by both renderers)
ENRICH_POLICIES = {
    "cust": EnrichPolicy(table="customer", match_field="c_custkey",
                         fields=("c_mktsegment", "c_nationkey")),
    "nat": EnrichPolicy(table="nation", match_field="n_nationkey",
                        fields=("n_name",)),
}

ESQL_ENRICH_QUERY = """
FROM orders
| ENRICH cust ON o_custkey WITH c_mktsegment, c_nationkey
| ENRICH nat ON c_nationkey WITH n_name
| STATS revenue = SUM(o_totalprice), n = COUNT(*)
        BY c_mktsegment, n_name
| EVAL rev = ROUND(revenue, 2)
| SORT c_mktsegment, n_name
| KEEP c_mktsegment, n_name, rev, n
| LIMIT 50
"""

ESQL_GROK_QUERY = """
FROM events
| EVAL line = CONCAT("evt ", event_type, " user=", TO_STRING(user_id))
| GROK line "%{WORD} %{WORD:etype} user=%{INT:uid:long}"
| STATS n = COUNT(*), users = COUNT_DISTINCT(uid) BY etype
| SORT etype
"""

ESQL_CASE_LIKE_QUERY = """
FROM events
| WHERE event_type LIKE "c*" OR event_type IN ("view", "error")
        OR event_type RLIKE "sign.p"
| EVAL bucket = CASE(value >= 75, "high", value >= 25, "mid", "low")
| STATS n = COUNT(*), av = AVG(value) BY event_type, bucket
| EVAL avg_r = ROUND(av, 4)
| SORT event_type, bucket
| KEEP event_type, bucket, n, avg_r
"""

ESQL_MV_FUNCS_QUERY = """
FROM documents
| EVAL toks = SPLIT(text, " ")
| EVAL ntoks = MV_COUNT(toks), uniq = MV_COUNT(MV_DEDUPE(toks)),
       sig = MV_CONCAT(MV_SORT(MV_DEDUPE(toks)), "|"),
       alpha = MV_MIN(toks), omega = MV_MAX(toks)
| STATS docs = COUNT(*), avg_n = AVG(ntoks), avg_u = AVG(uniq),
        sigs = COUNT_DISTINCT(sig), mn_tok = MIN(alpha),
        mx_tok = MAX(omega) BY lang
| EVAL avg_ntoks = ROUND(avg_n, 4), avg_uniq = ROUND(avg_u, 4)
| SORT lang
| KEEP lang, docs, avg_ntoks, avg_uniq, sigs, mn_tok, mx_tok
"""

ESQL_PCTL_QUERY = """
FROM events
| STATS p50 = MEDIAN(value), p90 = PERCENTILE(value, 90),
        n = COUNT(*) BY event_type
| EVAL med = ROUND(p50, 4), hi = ROUND(p90, 4)
| SORT event_type
| KEEP event_type, med, hi, n
"""


def esql_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained ENRICH commands (orders -> customer segment ->
    nation name) feeding a grouped revenue rollup: the Kibana
    lookup-then-aggregate panel. Both lookups broadcast (the ES
    enrich-index execution model); a key that misses enriches to
    NULL, per ES. Plan shape: scan + 2 BroadcastHashJoin + 1
    hash-agg + TakeOrdered — zero fact-side pre-agg shuffles."""
    plan = parse_esql(ESQL_ENRICH_QUERY, enrich=ENRICH_POLICIES)
    orders = load_table(spark, plan.table, sf_dir)
    lookups = {"cust": load_table(spark, "customer", sf_dir),
               "nat": load_table(spark, "nation", sf_dir)}
    return esql_df(orders, plan, lookups=lookups)


def esql_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROK with the bounded pattern library: an unnamed %{WORD}
    skip, a string capture, and a typed %{INT:uid:long} capture
    (the '' non-match extraction casts to NULL via an explicit CASE
    — ANSI-safe, and ES's null-on-miss semantics). One unanchored
    regex, valid in Java regex and RE2."""
    plan = parse_esql(ESQL_GROK_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


def esql_case_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL expression semantics the SQL dialects disagree on,
    rendered faithfully in both: LIKE "c*" (wildcard translation ->
    LIKE 'c%' — full-string in both dialects), RLIKE "sign.p"
    (FULL-string regex: Spark gets ^(?:...)$ anchors, DuckDB gets
    SIMILAR TO), IN (...), and the variadic CASE(cond, val, ...,
    default) function."""
    plan = parse_esql(ESQL_CASE_LIKE_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


def esql_mv_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multivalue family over SPLIT arrays: MV_COUNT (size,
    BIGINT-aligned), MV_DEDUPE (canonical sorted distinct — ES
    leaves the order unspecified, both engines sort), MV_SORT,
    MV_CONCAT, MV_MIN/MV_MAX. All higher-order array codegen —
    per-row, shuffle-free, no Python workers."""
    plan = parse_esql(ESQL_MV_FUNCS_QUERY)
    docs = load_table(spark, plan.table, sf_dir)
    return esql_df(docs, plan)


def esql_stats_percentiles(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """MEDIAN / PERCENTILE(expr, p) in STATS: exact interpolated
    quantiles (Spark percentile == DuckDB quantile_cont, both
    linear interpolation; ES|QL's 0-100 p converts to a fraction at
    parse time). The approx swap for unbounded groups is
    percentile_approx, as documented on dsl_percentiles."""
    plan = parse_esql(ESQL_PCTL_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


# ----------------- tranche four: INLINESTATS / LOOKUP JOIN /
# DATE_EXTRACT

# LOOKUP JOIN's index registry (ES 8.18 lookup indexes): the ON
# field must BE the index key (same-name contract) — the query
# stages it with EVAL, the documented ES|QL pattern
LOOKUP_INDEXES = {
    "customer": EnrichPolicy(table="customer",
                             match_field="c_custkey",
                             fields=("c_mktsegment", "c_acctbal")),
}

ESQL_INLINESTATS_QUERY = """
FROM events
| INLINESTATS av = AVG(value), mx = MAX(value) BY event_type
| WHERE value >= av
| STATS kept = COUNT(*), av_kept = AVG(value) BY event_type
| EVAL r = ROUND(av_kept, 4)
| SORT event_type
| KEEP event_type, kept, r
"""

ESQL_LOOKUP_QUERY = """
FROM orders
| EVAL c_custkey = o_custkey
| LOOKUP JOIN customer ON c_custkey
| STATS n = COUNT(*), rev = SUM(o_totalprice) BY c_mktsegment
| EVAL r = ROUND(rev, 2)
| SORT c_mktsegment
| KEEP c_mktsegment, n, r
"""

ESQL_DATE_EXTRACT_QUERY = """
FROM events
| EVAL h = DATE_EXTRACT("hour_of_day", ts),
       y = DATE_EXTRACT("year", ts)
| WHERE y == 2024
| STATS n = COUNT(*), av = AVG(value) BY h
| EVAL r = ROUND(av, 4)
| SORT h
| KEEP h, n, r
"""


ESQL_CHANGE_POINT_QUERY = """
FROM events
| WHERE event_type == "purchase"
| STATS doc_count = COUNT(*) BY day = BUCKET(ts, 1 day)
| CHANGE_POINT doc_count ON day
"""


def esql_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE_POINT over a STATS-bucketed daily series: the
    deterministic step-change argmax (dsl_change_point contract —
    documented divergence from ES's ML p-value annotation). The
    prior STATS is ENFORCED at parse, so the ordered prefix-sum
    window runs on the bucket-cardinality frame (days), never on
    raw rows — the ES ~1000-value input bound, kept structural."""
    plan = parse_esql(ESQL_CHANGE_POINT_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


def esql_inlinestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INLINESTATS: group aggregates attached to every row WITHOUT
    collapsing (window functions, identical OVER text in both
    engines), feeding the classic above-group-mean filter then a
    real STATS. BY is required (a global INLINESTATS would be an
    unpartitioned window); the window shuffle is ONE hash exchange
    on the group key — the same exchange the later STATS reuses."""
    plan = parse_esql(ESQL_INLINESTATS_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


def esql_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOOKUP JOIN (ES 8.18): the ON field must be the lookup
    index's key — staged here with EVAL, ES|QL's documented
    pattern. Unlike ENRICH the join strategy is NOT forced:
    Catalyst/AQE picks (broadcast under the threshold, shuffled
    hash beyond — lookup indexes may outgrow enrich-index sizes)."""
    plan = parse_esql(ESQL_LOOKUP_QUERY,
                      lookup_indexes=LOOKUP_INDEXES)
    orders = load_table(spark, plan.table, sf_dir)
    return esql_df(orders, plan,
                   lookups={"customer":
                            load_table(spark, "customer", sf_dir)})


def esql_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_EXTRACT with ES|QL's aligned chrono names (hour_of_day,
    year) via ANSI EXTRACT — identical text in both engines,
    BIGINT-aligned; the hour-of-day traffic profile panel."""
    plan = parse_esql(ESQL_DATE_EXTRACT_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


QUERIES.update({
    "esql_enrich": esql_enrich,
    "esql_grok": esql_grok,
    "esql_case_like": esql_case_like,
    "esql_mv_funcs": esql_mv_funcs,
    "esql_stats_percentiles": esql_stats_percentiles,
    "esql_inlinestats": esql_inlinestats,
    "esql_lookup_join": esql_lookup_join,
    "esql_date_extract": esql_date_extract,
    "esql_change_point": esql_change_point,
})
ORACLES.update({
    "esql_enrich": esql_duck_sql(
        parse_esql(ESQL_ENRICH_QUERY, enrich=ENRICH_POLICIES)),
    "esql_grok": esql_duck_sql(parse_esql(ESQL_GROK_QUERY)),
    "esql_case_like": esql_duck_sql(parse_esql(ESQL_CASE_LIKE_QUERY)),
    "esql_mv_funcs": esql_duck_sql(parse_esql(ESQL_MV_FUNCS_QUERY)),
    "esql_stats_percentiles": esql_duck_sql(
        parse_esql(ESQL_PCTL_QUERY)),
    "esql_inlinestats": esql_duck_sql(
        parse_esql(ESQL_INLINESTATS_QUERY)),
    "esql_lookup_join": esql_duck_sql(
        parse_esql(ESQL_LOOKUP_QUERY, lookup_indexes=LOOKUP_INDEXES)),
    "esql_date_extract": esql_duck_sql(
        parse_esql(ESQL_DATE_EXTRACT_QUERY)),
    "esql_change_point": esql_duck_sql(
        parse_esql(ESQL_CHANGE_POINT_QUERY)),
})
