"""scripted_metric agg: the bounded painless-fold subset — the
painless->SQL expression translator, fold-shape recognition (sum via
.add()/+=, max/min via Math.max/min self-assignment), combine/reduce
consistency validation, and end-to-end semantics through search()
(global and inside a terms bucket)."""

from __future__ import annotations

import pytest

from parquet_generator_spark.operators.esdsl import (
    _painless_expr_sql,
    _scripted_metric_col,
    search,
)


def test_painless_doc_refs_and_math():
    assert _painless_expr_sql("doc['v'].value * 2") == "v * 2"
    assert _painless_expr_sql("doc.v.value + doc['w'].value") == "v + w"
    assert _painless_expr_sql(
        "Math.round(doc.v.value * 100)") == "round(v * 100)"
    assert _painless_expr_sql(
        "Math.max(doc.v.value, Math.abs(doc.w.value))") \
        == "greatest(v, abs(w))"


def test_painless_operators():
    assert _painless_expr_sql("doc.k.value == 'a'") == "k = 'a'"
    assert _painless_expr_sql("doc.k.value != 'a'") == "k <> 'a'"
    assert _painless_expr_sql(
        "doc.v.value >= 1 && doc.v.value <= 9") == "v >= 1 AND v <= 9"


def test_painless_ternary_nested():
    out = _painless_expr_sql(
        "doc.k.value == 'sale' ? doc.v.value "
        ": (doc.k.value == 'fee' ? 0 : -1 * doc.v.value)")
    assert out == ("CASE WHEN k = 'sale' THEN v ELSE "
                   "CASE WHEN k = 'fee' THEN 0 "
                   "ELSE -1 * v END END")


def test_painless_ternary_ignores_quoted_question_mark():
    # '?' inside a string literal must not split a ternary
    assert _painless_expr_sql("doc.k.value == '?'") == "k = '?'"


def test_rejects_non_fold_map_script():
    with pytest.raises(ValueError, match="fold"):
        _scripted_metric_col("m", {
            "map_script": "state.seen[doc.k.value] = 1"})


def test_rejects_mismatched_combine_fold():
    with pytest.raises(ValueError, match="combine_script folds"):
        _scripted_metric_col("m", {
            "map_script": "state.t.add(doc.v.value)",
            "combine_script":
                "long m = 0; for (s in state.t) m = Math.max(m, s);"
                " return m"})


def _frame(spark):
    rows = [(1, "sale", 10.0), (2, "sale", 20.0), (3, "refund", 5.0),
            (4, "sale", 40.0), (5, "refund", 15.0)]
    return spark.createDataFrame(rows, "id long, kind string, v double")


def test_global_profit_fold(spark):
    # the ES reference example: sale -> +v, else -> -v, summed
    out = search(_frame(spark), {
        "aggs": {"profit": {"scripted_metric": {
            "init_script": "state.t = []",
            "map_script": "state.t.add(doc.kind.value == 'sale'"
                          " ? doc.v.value : -1 * doc.v.value)",
            "combine_script":
                "double p = 0; for (t in state.t) { p += t } return p",
            "reduce_script":
                "double p = 0; for (a in states) { p += a } return p",
        }}}}).collect()
    assert out[0]["profit"] == 10.0 + 20.0 + 40.0 - 5.0 - 15.0


def test_max_fold_in_terms_bucket(spark):
    out = search(_frame(spark), {
        "aggs": {"kinds": {
            "terms": {"field": "kind", "size": 10},
            "aggs": {"peak": {"scripted_metric": {
                "init_script": "state.m = 0",
                "map_script":
                    "state.m = Math.max(state.m, doc.v.value)",
                "combine_script":
                    "double m = 0; for (s in state.m) m ="
                    " Math.max(m, s); return m",
                "reduce_script":
                    "double m = 0; for (a in states) m ="
                    " Math.max(m, a); return m",
            }}}}}}).collect()
    got = {r["key"]: (r["doc_count"], r["peak"]) for r in out}
    assert got == {"sale": (3, 40.0), "refund": (2, 15.0)}


def test_painless_preserves_string_literals():
    # operators INSIDE string literals must survive untouched
    assert _painless_expr_sql("doc.k.value == 'a==b'") == "k = 'a==b'"
    assert _painless_expr_sql(
        "doc.k.value == 'x&&y' && doc.v.value > 0") \
        == "k = 'x&&y' AND v > 0"


def test_multi_statement_needs_return_reduce():
    # multi-var folds are supported SINCE round 12, but only with a
    # 'return <expr>' reduce projecting the merged vars
    with pytest.raises(ValueError, match="reduce_script"):
        _scripted_metric_col("m", {
            "map_script":
                "state.t.add(doc.a.value); state.u.add(doc.b.value)"})


def test_multi_statement_mean_pattern(spark):
    """state.s += x; state.n += 1 with return s/n — the canonical
    multi-var accumulation — computes the per-bucket mean."""
    out = search(_frame(spark), {
        "aggs": {"kinds": {
            "terms": {"field": "kind", "size": 10},
            "aggs": {"mean_v": {"scripted_metric": {
                "init_script": "state.s = 0; state.n = 0",
                "map_script":
                    "state.s += doc.v.value; state.n += 1",
                "reduce_script":
                    "return state.s * 1.0 / state.n",
            }}}}}}).collect()
    got = {r["key"]: r["mean_v"] for r in out}
    assert got == {"sale": (10.0 + 20.0 + 40.0) / 3,
                   "refund": (5.0 + 15.0) / 2}


def test_multi_statement_mixed_folds(spark):
    """sum + max vars merged in one return expression."""
    out = search(_frame(spark), {
        "aggs": {"spread": {"scripted_metric": {
            "map_script":
                "state.total += doc.v.value; "
                "state.peak = Math.max(state.peak, doc.v.value)",
            "reduce_script":
                "return state.peak * 100 + state.total",
        }}}}).collect()
    assert out[0]["spread"] == 40.0 * 100 + 90.0


def test_multi_statement_fences():
    base = {"map_script": "state.s += doc.v.value; state.n += 1"}
    with pytest.raises(ValueError, match="omit combine_script"):
        _scripted_metric_col("m", {
            **base, "combine_script": "p += t",
            "reduce_script": "return state.s / state.n"})
    with pytest.raises(ValueError, match="no map statement folds"):
        _scripted_metric_col("m", {
            **base, "reduce_script": "return state.zz + 1"})
    with pytest.raises(ValueError, match="more than one"):
        _scripted_metric_col("m", {
            "map_script": "state.s += doc.v.value; state.s += 1",
            "reduce_script": "return state.s"})
    with pytest.raises(ValueError, match="bounded to one scalar"):
        _scripted_metric_col("m", {
            "map_script":
                "state.s += doc.v.value; state.seen[doc.k.value] = 1",
            "reduce_script": "return state.s"})


def test_while_loop_fold(spark):
    """The bounded while form folds identically to the for form."""
    rows = [(1, "a", [1.0, 2.0]), (2, "a", [3.0]), (3, "b", [0.5])]
    df = spark.createDataFrame(
        rows, "id long, kind string, arr array<double>")
    spec_for = {
        "map_script":
            "for (int i = 0; i < doc['arr'].length; i++) "
            "{ state.v += Math.floor(doc['arr'][i] * 10) }",
        "combine_script":
            "long p = 0; for (t in state.v) { p += t } return p",
        "reduce_script":
            "long p = 0; for (a in states) { p += a } return p"}
    spec_while = {
        **spec_for,
        "map_script":
            "int i = 0; while (i < doc['arr'].length) "
            "{ state.v += Math.floor(doc['arr'][i] * 10); i++ }"}
    run = lambda spec: {  # noqa: E731
        r["key"]: r["s"] for r in search(df, {
            "aggs": {"k": {"terms": {"field": "kind", "size": 5},
                           "aggs": {"s": {"scripted_metric": spec}},
                           }}}).collect()}
    assert run(spec_for) == run(spec_while) == {"a": 60.0, "b": 5.0}


def test_while_fences_raise_loudly():
    def body(map_script):
        return {"map_script": map_script,
                "combine_script": "p += t", "reduce_script": "p += a"}

    with pytest.raises(ValueError, match="bounded while"):
        _scripted_metric_col("x", body(
            "int i = 0; while (true) { state.v += 1; i++ }"))
    with pytest.raises(ValueError, match="bounded while"):
        _scripted_metric_col("x", body(
            "int i = 0; while (state.v < 10) "
            "{ state.v += doc['arr'][i]; i++ }"))
    with pytest.raises(ValueError, match="bounded while"):
        _scripted_metric_col("x", body(
            "int i = 0; while (i < doc['arr'].length) "
            "{ state.v += doc['arr'][i] }"))  # missing i++


def test_painless_params_resolve_to_literals():
    # float params/literals are Java DOUBLES — rendered with an
    # engine-neutral cast so Spark does not parse them as DECIMAL
    assert _painless_expr_sql("doc.v.value * params.w",
                              {"w": 2.5}) == "v * CAST(2.5 AS DOUBLE)"
    assert _painless_expr_sql("params['tag'] == doc.k.value",
                              {"tag": "a'b"}) == "'a''b' = k"
    assert _painless_expr_sql("params.on ? 1 : 0", {"on": True}) \
        == "CASE WHEN TRUE THEN 1 ELSE 0 END"
    with pytest.raises(ValueError, match="params.missing"):
        _painless_expr_sql("params.missing + 1", {"w": 1})


def test_painless_nested_parenthesized_ternary():
    got = _painless_expr_sql(
        "Math.log(1 + doc.v.value) * "
        "(doc.k.value == 'x' ? 2.0 : 1.0)")
    assert got == ("ln(1 + v) * "
                   "(CASE WHEN k = 'x' THEN CAST(2.0 AS DOUBLE) "
                   "ELSE CAST(1.0 AS DOUBLE) END)")
    # two nested groups, each with its own ternary
    got = _painless_expr_sql("(doc.a.value > 1 ? 1 : 0) + "
                             "(doc.b.value > 2 ? 10 : 0)")
    assert got == ("(CASE WHEN a > 1 THEN 1 ELSE 0 END) + "
                   "(CASE WHEN b > 2 THEN 10 ELSE 0 END)")


def test_painless_exp_log10():
    assert _painless_expr_sql("Math.exp(doc.v.value)") == "exp(v)"
    assert _painless_expr_sql("Math.log10(doc.v.value)") == "log10(v)"
    # Math.log still maps to ln, not log10's prefix
    assert _painless_expr_sql("Math.log(doc.v.value)") == "ln(v)"


def test_loop_fences_raise_loudly():
    """Non-fold loops and positional arithmetic are refused with
    clear errors, not mistranslated."""
    import pytest

    from parquet_generator_spark.operators.esdsl import (
        _scripted_metric_col,
    )

    def body(map_script):
        return {"init_script": "state.v = 0",
                "map_script": map_script,
                "combine_script": "p += t", "reduce_script": "p += a"}

    # index used outside the element ref
    with pytest.raises(ValueError, match="positional arithmetic"):
        _scripted_metric_col("x", body(
            "for (int i = 0; i < doc['embedding'].length; i++) "
            "{ state.v += doc['embedding'][i] * i }"))
    # body never reads the array
    with pytest.raises(ValueError, match="never reads"):
        _scripted_metric_col("x", body(
            "for (int i = 0; i < doc['embedding'].length; i++) "
            "{ state.v += 1 }"))
    # non-zero start / foreign bound stay out of the loop gate
    with pytest.raises(ValueError, match="must be a fold"):
        _scripted_metric_col("x", body(
            "for (int i = 1; i < doc['embedding'].length; i++) "
            "{ state.v += doc['embedding'][i] }"))
    # multi-statement loop bodies are refused
    with pytest.raises(ValueError, match="must be a fold"):
        _scripted_metric_col("x", body(
            "for (int i = 0; i < doc['embedding'].length; i++) "
            "{ state.v += doc['embedding'][i]; state.u += 1 }"))
