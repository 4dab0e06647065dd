"""Golden parity on the reference's own bundled datasets.

The reference pins human-readable outputs for hypothyroid rows
1138/2230/745 (README.md:8-30, 1-indexed) and exercises titanic in
vignettes/Explainable_Outlier_Detection_in_Titanic_dataset.Rmd (row 1147).
These tests (a) run the UNMODIFIED compiled reference core on the real
datasets and assert exact flagged-row/score/bound agreement with our fit,
and (b) drive the Spark engine end-to-end on hypothyroid asserting the
README's distribution numbers appear in our rendered explanations.

The .rda files are read with tools/rda_reader.py (public R serialization
format); nothing from the reference tree is copied or committed.
"""

import os
import shutil
import subprocess

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference"
HARNESS_BIN = "/tmp/ref_harness"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(f"{REF}/src") and shutil.which("g++")),
    reason="reference sources or g++ unavailable")


@pytest.fixture(scope="module")
def harness():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "tools", "ref_harness.cpp")
    stale = (not os.path.exists(HARNESS_BIN)
             or os.path.getmtime(HARNESS_BIN) < os.path.getmtime(src))
    if stale:
        srcs = [f"{REF}/src/{f}.cpp" for f in
                ("fit_model", "split", "clusters", "cat_outlier",
                 "misc", "predict")]
        subprocess.run(
            ["g++", "-O2", "-std=c++11", "-fopenmp", f"-I{REF}/src",
             src, *srcs, "-o", HARNESS_BIN], check=True, cwd=root)
    return HARNESS_BIN


@pytest.fixture(scope="module")
def hypothyroid():
    from tools.rda_reader import read_rda
    return read_rda(f"{REF}/data/hypothyroid.rda")["hypothyroid"]


@pytest.fixture(scope="module")
def titanic():
    from tools.rda_reader import read_rda
    return read_rda(f"{REF}/data/titanic.rda")["titanic"]


def _encode(df: pd.DataFrame, ordinal: tuple = ()):
    """Encode a pandas frame the way the reference R binding does
    (helpers.R split.types): factors keep stored level order, characters
    factorize alphabetically, logicals are 2-level categoricals, NA -> -1
    (categ) / NaN (num).  Returns (num, cat, ord) column lists in frame
    order plus the matching names."""
    num_cols, cat_cols, ord_cols = [], [], []
    num_names, cat_names, ord_names = [], [], []
    for name in df.columns:
        s = df[name]
        if name in ordinal:
            su = s.dropna().unique()
            levels = sorted(su, key=str)
            lut = {v: i for i, v in enumerate(levels)}
            codes = np.array([lut.get(v, -1) if not pd.isna(v) else -1
                              for v in s], dtype=np.int64)
            ord_cols.append((codes, len(levels)))
            ord_names.append((name, [str(v) for v in levels]))
        elif isinstance(s.dtype, pd.CategoricalDtype):
            codes = s.cat.codes.to_numpy().astype(np.int64)
            cat_cols.append((codes, len(s.cat.categories)))
            cat_names.append((name, [str(v) for v in s.cat.categories]))
        elif s.dtype == object and any(isinstance(v, bool) for v in s):
            codes = np.array([-1 if v is None or (isinstance(v, float)
                                                  and np.isnan(v))
                              else int(bool(v)) for v in s], dtype=np.int64)
            cat_cols.append((codes, 2))
            cat_names.append((name, ["False", "True"]))
        elif s.dtype == object:
            levels = sorted({v for v in s if isinstance(v, str)})
            lut = {v: i for i, v in enumerate(levels)}
            codes = np.array([lut.get(v, -1) for v in s], dtype=np.int64)
            cat_cols.append((codes, len(levels)))
            cat_names.append((name, levels))
        else:
            num_cols.append(s.to_numpy().astype(np.float64))
            num_names.append(name)
    return (num_cols, cat_cols, ord_cols,
            num_names, cat_names, ord_names)


def _fit_both(harness, df, ordinal=()):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.diff_vs_reference import run_reference
    from outliertree_spark.config import ValidationConfig
    from outliertree_spark.operators.fit import FitColumn, fit_arrays

    num_cols, cat_cols, ord_cols, nn, cn, on = _encode(df, ordinal)
    ref = run_reference(num_cols, cat_cols, ord_cols)

    cols = [FitColumn(name, "numeric", c)
            for name, c in zip(nn, num_cols)]
    cols += [FitColumn(name, "categorical", c, levels=levels)
             for (name, levels), (c, _) in zip(cn, cat_cols)]
    cols += [FitColumn(name, "ordinal", c, levels=levels)
             for (name, levels), (c, _) in zip(on, ord_cols)]
    model = fit_arrays(cols, ValidationConfig())
    tr = model["_train_rows"]
    ours = {}
    for r in np.flatnonzero(tr["scores"] < 1.0):
        cm = model["columns"][tr["col"][r]]
        cl = cm["clusters"][tr["cluster"][r]]
        ours[int(r)] = {"name": cm["name"], "score": float(tr["scores"][r]),
                        "depth": int(tr["depth"][r]),
                        "size": int(cl["cluster_size"]),
                        "lo": cl["lower_lim"], "hi": cl["upper_lim"],
                        "cl": cl}
    return ref, ours, model


def _assert_parity(ref, ours):
    assert set(ref) == set(ours), (
        f"flagged-row mismatch: ref-only={sorted(set(ref) - set(ours))[:5]} "
        f"ours-only={sorted(set(ours) - set(ref))[:5]}")
    for r in ref:
        assert abs(ref[r]["score"] - ours[r]["score"]) <= 1e-6 * max(
            1.0, abs(ref[r]["score"])), (r, ref[r], ours[r])
        assert ref[r]["depth"] == ours[r]["depth"], (r, ref[r], ours[r])
        for k in ("lo", "hi"):
            a, b = ref[r][k], ours[r][k]
            assert (np.isinf(a) and np.isinf(b)) or \
                abs(a - b) <= 1e-6 * max(1.0, abs(a)), (r, k, a, b)


def test_hypothyroid_matches_reference_core(harness, hypothyroid):
    ref, ours, _ = _fit_both(harness, hypothyroid)
    assert len(ref) > 0
    _assert_parity(ref, ours)
    # README.md:8-30 pins these training outliers (1-indexed rows)
    assert ours[1137]["name"] == "age"
    assert ours[2229]["name"] == "T3"
    assert ours[744]["name"] == "TT4"


def test_titanic_matches_reference_core(harness, titanic):
    # vignette preprocessing: capitalized names, Survived as yes/no,
    # Name/Ticket/Home.dest dropped, Pclass/Parch/SibSp ordinal
    df = titanic.copy()
    df.columns = [c[0].upper() + c[1:] for c in df.columns]
    df = df.rename(columns={"Sibsp": "SibSp"})
    df["Sex"] = df["Sex"].map(lambda v: v[0].upper() + v[1:]
                              if isinstance(v, str) else v)
    df["Survived"] = df["Survived"].map(
        lambda v: ("Yes" if v else "No") if not pd.isna(v) else None)
    df = df.drop(columns=["Name", "Ticket", "Home.dest"])
    ref, ours, _ = _fit_both(harness, df, ordinal=("Pclass", "Parch", "SibSp"))
    assert len(ref) > 0
    _assert_parity(ref, ours)
    # vignette's flagged example (1-indexed 1147): overpaid 3rd-class fare
    assert ours[1146]["name"] == "Fare"


def test_hypothyroid_spark_end_to_end_golden(spark, hypothyroid):
    """Full-stack golden: Spark DataFrame in, violation rows out, README
    distribution numbers (README.md:8-30) in our rendered explanations."""
    from outliertree_spark import SparkOutlierTree, ValidationConfig

    pdf = hypothyroid.copy()
    # Spark treats '.' in column names as struct access; rename like any
    # Spark user would (R-style dotted names are a pandas/R artifact)
    pdf.columns = [c.replace(".", "_") for c in pdf.columns]
    pdf.insert(0, "row_id", np.arange(len(pdf), dtype=np.int64))
    # Arrow chokes on object bool-with-None; make them pandas nullable bool
    for c in pdf.columns:
        if pdf[c].dtype == object and any(isinstance(v, bool) for v in pdf[c]):
            pdf[c] = pd.array([None if v is None or (isinstance(v, float)
                                                     and np.isnan(v))
                               else bool(v) for v in pdf[c]],
                              dtype="boolean")
        elif isinstance(pdf[c].dtype, pd.CategoricalDtype):
            pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
    df = spark.createDataFrame(pdf)
    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(df, id_cols=["row_id"])
    out = eng.training_outliers().set_index("row_id")

    assert 1137 in out.index and 2229 in out.index and 744 in out.index
    e1138 = out.loc[1137, "explanation"]
    assert out.loc[1137, "suspicious_column"] == "age"
    for frag in ("75.00", "95.122%", "42.00", "31.46", "5.28", "39",
                 "pregnant"):
        assert frag in e1138, (frag, e1138)
    e2230 = out.loc[2229, "explanation"]
    assert out.loc[2229, "suspicious_column"] == "T3"
    for frag in ("10.60", "99.951%", "7.10", "1.98", "0.75", "2050",
                 "query_hyperthyroid"):
        assert frag in e2230, (frag, e2230)
    e745 = out.loc[744, "explanation"]
    assert out.loc[744, "suspicious_column"] == "TT4"
    for frag in ("239.00", "98.571%", "177.00", "135.23", "12.57", "69",
                 "FTI", "T4U", "age"):
        assert frag in e745, (frag, e745)


# README.md:8-27 blocks, byte-for-byte, with exactly ONE documented
# mapping applied: the README was rendered by the reference's R
# interface, which spells logicals TRUE/FALSE; the reference's own
# Python interface (and ours) spells them True/False (str(bool)).
# Everything else — every digit, space, tab and newline — is pinned.
_README_1138 = (
    "row [1138] - suspicious column: [age] - suspicious value: [75.00]\n"
    "\tdistribution: 95.122% <= 42.00 - [mean: 31.46] - [sd: 5.28]"
    " - [norm. obs: 39]\n"
    "\tgiven:\n"
    "\t\t[pregnant] = [True]")
_README_2230 = (
    "row [2230] - suspicious column: [T3] - suspicious value: [10.60]\n"
    "\tdistribution: 99.951% <= 7.10 - [mean: 1.98] - [sd: 0.75]"
    " - [norm. obs: 2050]\n"
    "\tgiven:\n"
    "\t\t[query.hyperthyroid] = [False]")
_README_745 = (
    "row [745] - suspicious column: [TT4] - suspicious value: [239.00]\n"
    "\tdistribution: 98.571% <= 177.00 - [mean: 135.23] - [sd: 12.57]"
    " - [norm. obs: 69]\n"
    "\tgiven:\n"
    "\t\t[FTI] between (97.96, 128.12] (value: 112.74)\n"
    "\t\t[T4U] > [1.12] (value: 2.12)\n"
    "\t\t[age] > [55.00] (value: 87.00)")


def test_hypothyroid_readme_blocks_byte_identical(spark, hypothyroid):
    """Full-string equality with the reference README's rendered blocks
    (the north-rule invariant), upgraded from round-2's fragment
    assertions.  Column names keep their ORIGINAL dots
    (query.hyperthyroid) — exercising the backtick-safe column
    references — and row ids are 1-based to match R's row numbers."""
    from outliertree_spark import SparkOutlierTree, ValidationConfig
    from outliertree_spark.report import print_outliers

    pdf = hypothyroid.copy()
    pdf.insert(0, "row_id", np.arange(1, len(pdf) + 1, dtype=np.int64))
    for c in pdf.columns:
        if pdf[c].dtype == object and any(isinstance(v, bool)
                                          for v in pdf[c]):
            pdf[c] = pd.array([None if v is None or (isinstance(v, float)
                                                     and np.isnan(v))
                               else bool(v) for v in pdf[c]],
                              dtype="boolean")
        elif isinstance(pdf[c].dtype, pd.CategoricalDtype):
            pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
    df = spark.createDataFrame(pdf)
    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(df, id_cols=["row_id"])
    out = eng.training_outliers().set_index("row_id")

    assert out.loc[1138, "explanation"] == _README_1138
    assert out.loc[2230, "explanation"] == _README_2230
    assert out.loc[745, "explanation"] == _README_745

    # B4 print path (reference __init__.py:785-969, sort at 819):
    # ascending (uses_NA_branch, tree_depth, outlier_score) over the
    # three README rows, rendered through print_outliers
    sub = out.loc[[1138, 2230, 745]].reset_index()
    txt = print_outliers(sub)
    order = sub.sort_values(
        ["uses_NA_branch", "tree_depth", "outlier_score"],
        ascending=True)["explanation"].tolist()
    expected = ("Reporting top 3 outliers [out of 3 found]\n\n\n"
                + "\n\n\n".join(order) + "\n\n")
    assert txt == expected
