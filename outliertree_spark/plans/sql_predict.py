"""Compile a fitted model into pure-Catalyst scoring expressions.

For shallow models (the default: depth <= 4, tens of clusters) the whole
predict decision — bound tests, condition chains, and the reference's
tie-break — fits in JVM column expressions, eliminating Python/Arrow
from the flagging path entirely.

Codegen caveat (measured, not theoretical): with enough clusters the
single ``least(struct(...), ...)`` expression exceeds janino's 64 KB
method limit, Spark logs the compile failure and evaluates that one
expression interpreted (correctness unaffected — the bench's jvm_ladder
and the streaming at_scale path run this way; the Arrow
``predict_batch`` path is the measured-fastest flagging path and is
what the headline ladders use).  The split-into-projections alternative
does not help: Catalyst collapses adjacent projects and re-inlines the
subtrees (the same behavior documented at text.winnowing_fingerprints).

Correctness argument (verified against predict_batch in tests): the
reference's sequential best-cluster update rule (predict.cpp:688-728) is
equivalent to the lexicographic minimum of
``struct(uses_NA_branch, depth, -cluster_size, score)`` over all matching
clusters, and its early-exit only prunes clusters that are strictly deeper
than an already-found non-NA-branch winner — which lose that comparison
anyway.  Cluster matching is the conjunction of the branch conditions on
the path to the cluster's tree node plus the cluster's own condition,
which for tree routing is exactly the set of rows that reach the node.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..colref import qcol

_WORST = (1, 9999, 0, 2.0)  # sentinel losing to every real candidate


def _num_ref(col: str, schema: dict):
    """(value expression in model space, is-NA predicate) for a numeric
    condition column; timestamp predictors compare in the shifted-seconds
    space the model was fitted in."""
    info = (schema or {}).get(col) or {}
    c = qcol(col)
    if info.get("kind") == "timestamp":
        v = F.unix_timestamp(c).cast("double") - F.lit(info["ts_min"])
        return v, c.isNull()
    v = c.cast("double")
    return v, c.isNull() | F.isnan(v)


def _edge_condition(parent: dict, child: dict, levels_by_col: dict,
                    schema: dict):
    """Column predicate for entering ``child`` from ``parent`` (None = no
    restriction)."""
    br = child["parent_branch"]
    if br == "root":
        return None
    if br == "allbranch":
        own = child.get("own") or {}
        return _own_condition(own, levels_by_col, schema)
    if br == "subtrees":
        lev = child.get("branch_lev")
        col = parent.get("col")
        if lev is None or col is None:
            return None
        return qcol(col) == F.lit(levels_by_col[col][lev])
    col = parent.get("col")
    if col is None:
        return None
    kind = parent.get("col_kind")
    c = qcol(col)
    if kind == "numeric":
        v, isna = _num_ref(col, schema)
        if br == "isna":
            return isna
        return ~isna & (v <= parent["split_point"] if br == "le"
                        else v > parent["split_point"])
    if br == "isna":
        return c.isNull()
    levels = levels_by_col[col]
    if kind == "ordinal":
        lev = parent["split_lev"]
        members = levels[:lev + 1] if br == "le" else levels[lev + 1:]
        return c.isin([_lv(v) for v in members])
    ss = parent.get("split_subset") or []
    want = 1 if br == "in" else 0
    members = [levels[i] for i, s in enumerate(ss) if s == want]
    return c.isin([_lv(v) for v in members])


def _lv(v):
    return bool(v) if isinstance(v, bool) else v


def _own_condition(own: dict, levels_by_col: dict, schema: dict):
    col = own.get("col")
    if col is None:
        return None
    c = qcol(col)
    kind = own["kind"]
    br = own["branch"]
    if kind == "numeric":
        v, isna = _num_ref(col, schema)
        if br == "isna":
            return isna
        return ~isna & (v <= own["point"] if br == "le" else v > own["point"])
    if br == "isna":
        return c.isNull()
    levels = levels_by_col[col]
    if br == "eq":
        return c == F.lit(_lv(levels[own["lev"]]))
    if br in ("le", "gt"):
        members = levels[:own["lev"] + 1] if br == "le" else levels[own["lev"] + 1:]
        return c.isin([_lv(v) for v in members])
    ss = own.get("subset") or []
    want = 1 if br == "in" else 0
    return c.isin([_lv(levels[i]) for i, s in enumerate(ss) if s == want])


def _cluster_own_condition(cl: dict, levels_by_col: dict, schema: dict):
    st = cl["split_type"]
    if st == "root":
        return None
    col = cl["col"]
    kind = cl["col_kind"]
    c = qcol(col)
    if kind == "numeric":
        v, isna = _num_ref(col, schema)
        if st == "isna":
            return isna
        return ~isna & (v <= cl["split_point"] if st == "le"
                        else v > cl["split_point"])
    if st == "isna":
        return c.isNull()
    levels = levels_by_col[col]
    seen = c.isin([_lv(v) for v in levels])  # unseen category -> cluster skipped
    if st == "eq":
        return c == F.lit(_lv(levels[cl["split_lev"]]))
    if st == "neq":
        return seen & (c != F.lit(_lv(levels[cl["split_lev"]])))
    if st in ("le", "gt"):
        lev = cl["split_lev"]
        members = levels[:lev + 1] if st == "le" else levels[lev + 1:]
        return c.isin([_lv(v) for v in members])
    ss = cl["split_subset"] or []
    want = 1 if st == "in" else 0
    return c.isin([_lv(levels[i]) for i, s in enumerate(ss) if s == want])


def _target_value_expr(cm: dict):
    name = cm["name"]
    if cm.get("is_ts"):
        return F.unix_timestamp(qcol(name)).cast("double") - F.lit(cm["ts_min"])
    return qcol(name).cast("double")


def _score_expr(cm: dict, cl: dict, val: Column):
    if cm["kind"] == "numeric":
        t = cm["transf"]
        if t == "log":
            v = F.log(val - F.lit(cm["log_minval"]))
        elif t == "exp":
            v = F.exp((val - F.lit(cm["orig_mean"]))
                      / F.lit(max(cm["orig_sd"], 1e-12)))
        else:
            v = val
        z = (v - F.lit(cl["cluster_mean"])) / F.lit(max(cl["cluster_sd"], 1e-12))
        score = F.lit(1.0) / F.greatest(z * z, F.lit(1.0))
        return F.when(F.isnan(score), F.lit(1.0 - 1e-15)).otherwise(score)
    # categorical: per-level stored score
    levels = cm["levels"]
    sc = cl["score_categ"] or []
    expr = F.lit(0.0)
    for i, s in enumerate(sc):
        if s != 0.0 and i < len(levels):
            expr = F.when(qcol(cm["name"]) == F.lit(_lv(levels[i])),
                          F.lit(float(s))).otherwise(expr)
    return expr


def compile_score_exprs(model: dict, df_cols: set[str]) -> dict[str, Column]:
    """Per-target-column Column of struct(nab, depth, neg_size, score,
    col_ix, cluster_id); least() of these + the worst-sentinel gives the
    per-row winner with the reference tie-break (earlier column / earlier
    cluster wins exact ties, as in the sequential update)."""
    levels_by_col = dict(model.get("predictor_levels") or {})
    for cm in model["columns"]:
        if cm.get("levels") is not None:
            levels_by_col.setdefault(cm["name"], cm["levels"])

    schema = model.get("schema") or {}
    out = {}
    for col_ix, cm in enumerate(model["columns"]):
        name = cm["name"]
        if name not in df_cols or not cm["clusters"]:
            continue
        trees = cm["trees"]
        # path condition per tree node (conjunction root -> node)
        path_cond: list = [None] * len(trees)
        for ix in range(1, len(trees)):
            child = trees[ix]
            parent_ix = child["parent"]
            edge = _edge_condition(trees[parent_ix], child, levels_by_col, schema)
            pc = path_cond[parent_ix]
            path_cond[ix] = edge if pc is None else (
                pc if edge is None else (pc & edge))

        if cm["kind"] == "numeric":
            val = _target_value_expr(cm)
            candidate = val.isNotNull() & ~F.isnan(val)
        else:
            val = qcol(name)
            candidate = val.isNotNull()

        structs = []
        for cl_id, cl in enumerate(cm["clusters"]):
            if cm["kind"] == "numeric":
                lo, hi = cl["lower_lim"], cl["upper_lim"]
                bound = F.lit(False)
                if math.isfinite(lo):
                    bound = val <= F.lit(lo)
                if math.isfinite(hi):
                    bound = bound | (val >= F.lit(hi))
            else:
                sc = cl.get("subset_common") or []
                flagged = [cm["levels"][i] for i, s in enumerate(sc)
                           if s != 0 and i < len(cm["levels"])]
                if not flagged:
                    continue
                bound = val.isin([_lv(v) for v in flagged])
            cond = path_cond[cl["tree"]]
            own = _cluster_own_condition(cl, levels_by_col, schema)
            matched = candidate & bound
            if cond is not None:
                matched = matched & cond
            if own is not None:
                matched = matched & own
            cand = F.struct(
                F.lit(1 if cl["has_NA_branch"] else 0).alias("nab"),
                F.lit(int(cl["depth"])).alias("depth"),
                F.lit(-int(cl["cluster_size"])).alias("neg_size"),
                _score_expr(cm, cl, val).alias("score"),
                F.lit(col_ix).alias("col_ix"),
                F.lit(cl_id).alias("cluster_id"),
            )
            structs.append(F.when(matched, cand))
        if not structs:
            continue
        worst = _worst_struct(col_ix)
        best = F.least(*structs, worst) if len(structs) > 1 else \
            F.coalesce(structs[0], worst)
        out[name] = best
    return out


def _worst_struct(col_ix: int = -1) -> Column:
    return F.struct(F.lit(_WORST[0]).alias("nab"),
                    F.lit(_WORST[1]).alias("depth"),
                    F.lit(_WORST[2]).alias("neg_size"),
                    F.lit(_WORST[3]).alias("score"),
                    F.lit(2 ** 30).alias("col_ix"),
                    F.lit(-1).alias("cluster_id"))


def score_sql(model: dict, df: DataFrame,
              id_cols: list[str] | None = None,
              keep_cols: list[str] | None = None) -> DataFrame:
    """Pure-Catalyst flagging: one row per flagged input row with its
    winning (column, cluster) — zero Python in the plan, single scan.

    ``keep_cols``: raw input columns to carry through to the output
    (used by `engine.predict_at_scale` to render values/explanations
    JVM-side)."""
    id_cols = id_cols or []
    keep_cols = [c for c in (keep_cols or [])
                 if c in df.columns and c not in id_cols]
    exprs = compile_score_exprs(model, set(df.columns))
    if not exprs:
        empty = df.select(*[qcol(c) for c in id_cols],
                          *[qcol(c) for c in keep_cols]).limit(0)
        return (empty.withColumn("suspicious_column", F.lit(""))
                .withColumn("outlier_score", F.lit(0.0))
                .withColumn("tree_depth", F.lit(0))
                .withColumn("uses_NA_branch", F.lit(False))
                .withColumn("cluster_id", F.lit(-1)))
    names = list(exprs)
    per_col = list(exprs.values())
    overall = (F.least(*per_col, _worst_struct())
               if len(per_col) > 1 else per_col[0])
    sel = df.select(*[qcol(c) for c in id_cols],
                    *[qcol(c) for c in keep_cols],
                    overall.alias("_b"))
    flagged = sel.filter(F.col("_b.cluster_id") >= 0)
    name_ix = {i: cm["name"] for i, cm in enumerate(model["columns"])}
    col_name = F.lit("")
    for ix, nm in name_ix.items():
        col_name = F.when(F.col("_b.col_ix") == ix, F.lit(nm)).otherwise(col_name)
    return flagged.select(
        *[qcol(c) for c in id_cols], *[qcol(c) for c in keep_cols],
        col_name.alias("suspicious_column"),
        F.col("_b.score").alias("outlier_score"),
        F.col("_b.depth").cast("long").alias("tree_depth"),
        (F.col("_b.nab") == 1).alias("uses_NA_branch"),
        F.col("_b.cluster_id").alias("cluster_id"))
