"""Model post-processing, serialization, and metadata accessors.

The fitted model is a plain nested dict (JSON-serializable) so it can be
broadcast to executors cheaply and checkpointed alongside run metadata.
Mirrors the reference's ``ModelOutputs`` accessors: per-cluster condition
reconstruction (outlier_cpp_interface.pyx:283-774 walks cluster -> tree ->
root) and ``flaggable_values`` (reference __init__.py:750-780).
"""

from __future__ import annotations

import json
import math

import numpy as np


def _cond_from_cluster(cl: dict, levels_by_col: dict) -> dict | None:
    """The cluster's own extra condition on top of its tree path."""
    if cl["split_type"] == "root" or cl["col"] is None:
        return None
    col = cl["col"]
    kind = cl["col_kind"]
    st = cl["split_type"]
    levels = levels_by_col.get(col)
    if st == "isna":
        return {"column": col, "comparison": "is NA", "value_comp": None, "kind": kind}
    if kind == "numeric":
        if st == "le":
            return {"column": col, "comparison": "<=", "value_comp": cl["split_point"], "kind": kind}
        if st == "gt":
            return {"column": col, "comparison": ">", "value_comp": cl["split_point"], "kind": kind}
    if kind in ("categorical", "ordinal"):
        if st == "eq":
            return {"column": col, "comparison": "=",
                    "value_comp": levels[cl["split_lev"]], "kind": kind}
        if st == "neq":
            return {"column": col, "comparison": "!=",
                    "value_comp": levels[cl["split_lev"]], "kind": kind}
        if st == "le":  # ordinal: levels 0..split_lev
            return {"column": col, "comparison": "in",
                    "value_comp": [levels[i] for i in range(cl["split_lev"] + 1)],
                    "kind": kind}
        if st == "gt":
            return {"column": col, "comparison": "in",
                    "value_comp": [levels[i] for i in range(cl["split_lev"] + 1, len(levels))],
                    "kind": kind}
        if st == "in" and cl["split_subset"] is not None:
            return {"column": col, "comparison": "in",
                    "value_comp": [levels[i] for i, s in enumerate(cl["split_subset"]) if s == 1],
                    "kind": kind}
        if st == "notin" and cl["split_subset"] is not None:
            return {"column": col, "comparison": "in",
                    "value_comp": [levels[i] for i, s in enumerate(cl["split_subset"]) if s == 0],
                    "kind": kind}
    return None


def _cond_from_tree_edge(parent: dict, child: dict, levels_by_col: dict) -> dict | None:
    """Condition implied by entering ``child`` from ``parent``."""
    br = child["parent_branch"]
    col = parent.get("col")
    kind = parent.get("col_kind")
    if br == "root":
        return None
    if br == "allbranch":
        own = child.get("own") or {}
        ocol, okind = own.get("col"), own.get("kind")
        if ocol is None:
            return None
        levels = levels_by_col.get(ocol)
        b = own["branch"]
        if b == "isna":
            return {"column": ocol, "comparison": "is NA", "value_comp": None,
                    "kind": okind}
        if okind == "numeric":
            return {"column": ocol, "comparison": "<=" if b == "le" else ">",
                    "value_comp": own["point"], "kind": okind}
        if b == "eq":
            return {"column": ocol, "comparison": "=",
                    "value_comp": levels[own["lev"]], "kind": okind}
        if b == "le":
            return {"column": ocol, "comparison": "in",
                    "value_comp": [levels[i] for i in range(own["lev"] + 1)],
                    "kind": okind}
        if b == "gt":
            return {"column": ocol, "comparison": "in",
                    "value_comp": [levels[i] for i in range(own["lev"] + 1, len(levels))],
                    "kind": okind}
        ss = own.get("subset") or []
        want = 1 if b == "in" else 0
        return {"column": ocol, "comparison": "in",
                "value_comp": [levels[i] for i, s in enumerate(ss) if s == want],
                "kind": okind}
    if br == "subtrees":
        lev = child.get("branch_lev")
        if lev is None or col is None:
            return None  # binarize-mode root subtree: no condition
        return {"column": col, "comparison": "=",
                "value_comp": levels_by_col[col][lev], "kind": kind}
    if col is None:
        return None
    levels = levels_by_col.get(col)
    if br == "isna":
        return {"column": col, "comparison": "is NA", "value_comp": None, "kind": kind}
    if kind == "numeric":
        return {"column": col, "comparison": "<=" if br == "le" else ">",
                "value_comp": parent["split_point"], "kind": kind}
    if kind == "ordinal":
        lev = parent["split_lev"]
        if br == "le":
            return {"column": col, "comparison": "in",
                    "value_comp": [levels[i] for i in range(lev + 1)], "kind": kind}
        return {"column": col, "comparison": "in",
                "value_comp": [levels[i] for i in range(lev + 1, len(levels))], "kind": kind}
    # categorical subset split
    ss = parent.get("split_subset")
    if ss is None:
        return None
    if br == "in":
        return {"column": col, "comparison": "in",
                "value_comp": [levels[i] for i, s in enumerate(ss) if s == 1], "kind": kind}
    return {"column": col, "comparison": "in",
            "value_comp": [levels[i] for i, s in enumerate(ss) if s == 0], "kind": kind}


def attach_conditions(model: dict) -> dict:
    """Precompute each cluster's condition chain (leaf -> root order)."""
    levels_by_col = {}
    for cm in model["columns"]:
        if cm["levels"] is not None:
            levels_by_col[cm["name"]] = cm["levels"]
    # predictor columns may not be targets; engine passes extra levels via
    # model["predictor_levels"]
    levels_by_col.update(model.get("predictor_levels", {}))

    for cm in model["columns"]:
        trees = cm["trees"]
        for cl in cm["clusters"]:
            conds = []
            own = _cond_from_cluster(cl, levels_by_col)
            if own is not None:
                conds.append(own)
            t_ix = cl["tree"]
            while t_ix is not None and trees:
                child = trees[t_ix]
                if child["parent_branch"] == "root":
                    break
                parent = trees[child["parent"]]
                edge = _cond_from_tree_edge(parent, child, levels_by_col)
                if edge is not None:
                    conds.append(edge)
                t_ix = child["parent"]
            cl["conditions"] = conds
    return model


def flaggable_values(model: dict) -> dict:
    """Per-column flaggable ranges / category sets (B6)."""
    out = {}
    for cm in model["columns"]:
        if cm["kind"] == "numeric":
            out[cm["name"]] = {"low": cm["min_outlier_any"], "high": cm["max_outlier_any"]}
        else:
            out[cm["name"]] = {
                "flaggable": [lev for lev, f in zip(cm["levels"], cm["cat_outlier_any"]) if f]
            }
    return out


class _NpEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


def model_to_json(model: dict) -> str:
    clean = {k: v for k, v in model.items() if not k.startswith("_")}

    def enc(o):
        if isinstance(o, float):
            if math.isinf(o):
                return "Infinity" if o > 0 else "-Infinity"
            if math.isnan(o):
                return "NaN"
        return o

    return json.dumps(clean, cls=_NpEncoder)


def model_from_json(s: str) -> dict:
    return json.loads(s)
