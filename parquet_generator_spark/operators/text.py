"""Text-analysis operators for LLM training-data pipelines.

All hot-path computation is JVM-side Catalyst expressions (split /
filter / transform / md5 / conv) — no Python in the loop — so each
operator is a narrow map over the corpus: embarrassingly parallel,
no shuffle, scales to 100 TB as a single scan.

Every operator has a DuckDB-SQL twin (the *_DUCK constants) built
from the same primitive recipe, so the driver's oracle can verify
values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- shared tokenization (the "analyzer"): lowercase alnum runs ----
# Spark SQL and DuckDB spellings of the same expression.
def toks_spark(c: str) -> str:
    return f"filter(split(lower({c}), '[^a-z0-9]+'), x -> x != '')"


def toks_duck(c: str) -> str:
    return (f"list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), "
            f"x -> x <> '')")


# BPE-ish pre-tokenizer: letter runs, single digits, single symbols
BPE_RE = r"[a-z]+|[0-9]|[^a-z0-9\s]"


# --- CJK-aware tokenization (bigram fallback) ----------------------
# A real web corpus is heavily CJK/multilingual, and the plain
# [a-z0-9]+ analyzer silently drops those scripts (token counts,
# shingles, dedup and langid all degrade). The standard fallback for
# unsegmented scripts is CHARACTER BIGRAMS (Lucene's CJKAnalyzer):
# Latin alnum runs tokenize as before, and each CJK run of length n
# contributes its n-1 overlapping bigrams (a lone char stands as its
# own token). The script ranges are written as LITERAL characters so
# one pattern is valid in both Java regex (Spark) and RE2 (DuckDB):
# CJK Unified Ideographs, Hiragana, Katakana, Hangul syllables.
CJK_RANGES = "\u4e00-\u9fff\u3041-\u309f\u30a0-\u30ff\uac00-\ud7a3"
_MIXED_PAT = f"[a-z0-9]+|[{CJK_RANGES}]+"


def toks_cjk_spark(c: str) -> str:
    return (
        f"flatten(transform("
        f"regexp_extract_all(lower({c}), '{_MIXED_PAT}', 0), "
        f"r -> CASE WHEN r rlike '^[a-z0-9]' THEN array(r) "
        f"WHEN length(r) = 1 THEN array(r) "
        f"ELSE transform(sequence(1, length(r) - 1), "
        f"i -> substr(r, i, 2)) END))")


def toks_cjk_duck(c: str) -> str:
    return (
        f"flatten(list_transform("
        f"regexp_extract_all(lower({c}), '{_MIXED_PAT}'), "
        f"r -> CASE WHEN regexp_matches(r, '^[a-z0-9]') THEN [r] "
        f"WHEN length(r) = 1 THEN [r] "
        f"ELSE list_transform(generate_series(1, length(r) - 1), "
        f"i -> substr(r, i, 2)) END))")

# language marker (stopword) sets for the n-gram/stopword language-ID
# heuristic; deterministic tie-break order en > de > fr > es
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ein", "ist", "zu", "den"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "du"),
    "es": ("el", "los", "las", "y", "un", "una", "es", "en", "por"),
}
_LANG_ORDER = ("en", "de", "fr", "es")


def _in_list(vals: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


def lang_hits_spark(c: str, lang: str) -> str:
    return (f"size(filter({toks_spark(c)}, "
            f"x -> x in {_in_list(LANG_MARKERS[lang])}))")


def lang_hits_duck(c: str, lang: str) -> str:
    return (f"len(list_filter({toks_duck(c)}, "
            f"x -> x in {_in_list(LANG_MARKERS[lang])}))")


def langid_case(hits: dict[str, str]) -> str:
    """Shared CASE chain over per-language hit-count expressions;
    identical text works in Spark SQL and DuckDB."""
    clauses = []
    order = list(_LANG_ORDER)
    for i, lang in enumerate(order[:-1]):
        conds = " AND ".join(
            f"{hits[lang]} >= {hits[other]}" for other in order[i + 1:])
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return ("CASE " + " ".join(clauses)
            + f" ELSE '{order[-1]}' END")


def langid_spark(c: str) -> Column:
    return F.expr(langid_case({l: lang_hits_spark(c, l)
                               for l in _LANG_ORDER}))


def langid_duck(c: str) -> str:
    return langid_case({l: lang_hits_duck(c, l) for l in _LANG_ORDER})


# --- quality scoring -------------------------------------------------
# components: token count saturation, lexical diversity, stopword
# naturalness; score = 0.4*sat + 0.3*diversity + 0.3*stopness


def round4(expr: str) -> str:
    """Engine-agnostic 4-decimal rounding: scale, round to integer,
    unscale. Written this way because Spark rounds doubles via exact
    BigDecimal while DuckDB multiplies by 1e4 first — on .xxxx5 ties
    the two disagree; with the multiply made explicit, both engines
    see the same double and round it the same way."""
    return f"round(({expr}) * 10000) / 10000"

def quality_components_spark(c: str) -> dict[str, Column]:
    toks = toks_spark(c)
    n = f"size({toks})"
    distinct_ratio = (f"CASE WHEN {n} > 0 THEN "
                      f"CAST(size(array_distinct({toks})) AS DOUBLE) / {n} "
                      f"ELSE 0.0 END")
    stop_ratio = (f"CASE WHEN {n} > 0 THEN "
                  f"CAST({lang_hits_spark(c, 'en')} AS DOUBLE) / {n} "
                  f"ELSE 0.0 END")
    sat = f"least(CAST({n} AS DOUBLE) / 100.0, 1.0)"
    return {
        "n_tokens": F.expr(n),
        "distinct_ratio": F.expr(round4(distinct_ratio)),
        "stop_ratio": F.expr(round4(stop_ratio)),
        "quality": F.expr(round4(
            f"0.4 * {sat} + 0.3 * ({distinct_ratio}) "
            f"+ 0.3 * ({stop_ratio})")),
    }


def quality_components_duck(c: str) -> dict[str, str]:
    toks = toks_duck(c)
    n = f"len({toks})"
    distinct_ratio = (f"CASE WHEN {n} > 0 THEN "
                      f"CAST(len(list_distinct({toks})) AS DOUBLE) / {n} "
                      f"ELSE 0.0 END")
    stop_ratio = (f"CASE WHEN {n} > 0 THEN "
                  f"CAST({lang_hits_duck(c, 'en')} AS DOUBLE) / {n} "
                  f"ELSE 0.0 END")
    sat = f"least(CAST({n} AS DOUBLE) / 100.0, 1.0)"
    return {
        "n_tokens": n,
        "distinct_ratio": round4(distinct_ratio),
        "stop_ratio": round4(stop_ratio),
        "quality": round4(f"0.4 * {sat} + 0.3 * ({distinct_ratio}) "
                          f"+ 0.3 * ({stop_ratio})"),
    }


# --- fused per-document profile --------------------------------------

def profile_struct_spark(c: str) -> Column:
    """All per-document text metrics in ONE expression with the token
    array bound once (the transform-over-single-struct trick): struct
    (n_tokens, distinct_ratio, stop_ratio, quality, pred_lang).

    Semantically identical to composing quality_components_spark +
    langid_spark; the fusion exists because every separate expression
    re-runs the tokenizer split — ~10 tokenizations per row become 1.
    """
    toks = toks_spark(c)
    t = "s.t"
    n = f"size({t})"
    distinct_ratio = (f"CASE WHEN {n} > 0 THEN "
                      f"CAST(size(array_distinct({t})) AS DOUBLE) / {n} "
                      f"ELSE 0.0 END")
    hits = {l: f"size(filter({t}, x -> x in {_in_list(LANG_MARKERS[l])}))"
            for l in _LANG_ORDER}
    stop_ratio = (f"CASE WHEN {n} > 0 THEN "
                  f"CAST({hits['en']} AS DOUBLE) / {n} ELSE 0.0 END")
    sat = f"least(CAST({n} AS DOUBLE) / 100.0, 1.0)"
    quality = round4(f"0.4 * {sat} + 0.3 * ({distinct_ratio}) "
                     f"+ 0.3 * ({stop_ratio})")
    inner = (f"struct({n} AS n_tokens, "
             f"{round4(distinct_ratio)} AS distinct_ratio, "
             f"{round4(stop_ratio)} AS stop_ratio, "
             f"{quality} AS quality, "
             f"{langid_case(hits)} AS pred_lang)")
    return F.expr(f"transform(array(struct({toks} AS t)), s -> {inner})[0]")


# --- fingerprinting --------------------------------------------------
# content fingerprint: md5 of the sorted distinct token bag — stable
# under token reordering/duplication (a cheap canonicalization, the
# "fingerprint except shuffled words" family)

def fingerprint_spark(c: str) -> Column:
    return F.expr(
        f"md5(array_join(array_sort(array_distinct({toks_spark(c)})), ' '))")


def fingerprint_duck(c: str) -> str:
    return (f"md5(array_to_string(list_sort(list_distinct({toks_duck(c)})),"
            f" ' '))")


# --- shingles (shared with dedup) -----------------------------------

def shingles_spark(c: str, k: int = 3) -> str:
    """k-token shingle set as a Spark SQL expression string.

    The token array is bound to a lambda variable via the
    single-element transform(array(struct(...))) trick: Catalyst does
    not hoist loop-invariant subexpressions out of lambda bodies, so
    inlining the tokenizer would re-split the text once per shingle
    index (O(tokens^2) work per document)."""
    toks = toks_spark(c)
    body = (
        f"CASE WHEN size(s.t) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size(s.t) - {k}), "
        f"i -> array_join(slice(s.t, i + 1, {k}), ' '))) "
        f"ELSE array() END"
    )
    return f"transform(array(struct({toks} AS t)), s -> {body})[0]"


def shingles_spark_inline(c: str, k: int = 3) -> str:
    """shingles_spark without the struct binding: slower (re-tokenizes
    per shingle index) but safe to compose with a Pandas UDF — the
    bound form's nested transform defeats Python-UDF extraction when
    projections collapse into an aggregate's input (interpreted
    projection then tries to eval the PythonUDF and crashes)."""
    toks = toks_spark(c)
    return (
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size({toks}) - {k}), "
        f"i -> array_join(slice({toks}, i + 1, {k}), ' '))) "
        f"ELSE array() END"
    )


def shingles_duck(c: str, k: int = 3) -> str:
    toks = toks_duck(c)
    picks = ", ".join(f"({toks})[i + {j + 1}]" for j in range(k))
    return (f"list_distinct(list_transform(range(len({toks}) - {k - 1}), "
            f"i -> concat_ws(' ', {picks})))")
