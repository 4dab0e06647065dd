"""Cluster definition / 1-D outlier decision operators.

Re-expresses the reference's cluster semantics (src/clusters.cpp,
src/cat_outlier.cpp) in NumPy.  A "cluster" is the decision payload
attached to one branch of one conditioning-tree node: numeric bounds
(lower_lim/upper_lim) derived from a trimmed z + gap test, or categorical
proportion thresholds.  Known reference quirks are mirrored where they are
deterministic and documented inline.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.stats import (
    calculate_max_cat_outliers,
    calculate_max_outliers,
    chebyshyov_bound,
    log2ceil,
    welford_mean_sd,
    z_score,
    z_score_arr,
)

EPS = np.finfo(np.float64).eps


def _better_cluster_fit(state, clusters, rows,
                        new_nab: bool, new_depth: int, new_size_proxy: int):
    """Fit-time per-column overwrite rule (src/clusters.cpp:235-249):
    prefer non-NA-branch, then shallower, then larger cluster.

    The previously-assigned cluster's size is looked up at comparison time
    (the reference reads clusters[assigned].cluster_size, which is FINAL by
    then); the new cluster compares via its interior-size proxy because its
    own size is not yet known (clusters.cpp:358-360 notes this asymmetry)."""
    old_scores = state.scores[rows]
    no_prev = old_scores >= 1.0
    old_nab = state.cl_nab[rows]
    old_depth = state.depth[rows]
    old_size = np.array(
        [clusters[c]["cluster_size"] if 0 <= c < len(clusters) else 0
         for c in state.cluster[rows]], dtype=np.int64)
    better = (
        no_prev
        | (old_nab & (not new_nab))
        | ((old_nab == new_nab)
           & ((new_depth < old_depth)
              | ((new_depth == old_depth) & (old_size < new_size_proxy))))
    )
    return better


class RowState:
    """Per-target-column workspace arrays tracking each row's best cluster."""

    def __init__(self, nrows: int):
        self.scores = np.ones(nrows, dtype=np.float64)
        self.cluster = np.zeros(nrows, dtype=np.int64)
        self.tree = np.zeros(nrows, dtype=np.int64)
        self.depth = np.zeros(nrows, dtype=np.int64)
        # cached attributes of the currently-assigned cluster
        self.cl_nab = np.zeros(nrows, dtype=bool)
        self.cl_size = np.zeros(nrows, dtype=np.int64)

    def assign(self, rows, scores, cluster_num, tree_num, depth,
               cl_nab: bool, cl_size: int):
        self.scores[rows] = scores
        self.cluster[rows] = cluster_num
        self.tree[rows] = tree_num
        self.depth[rows] = depth
        self.cl_nab[rows] = cl_nab
        self.cl_size[rows] = cl_size


def define_numerical_cluster(y: np.ndarray, ix: np.ndarray, orig: np.ndarray,
                             state: RowState, cluster: dict, clusters: list,
                             cluster_num: int, tree_num: int, tree_depth: int,
                             is_log: bool, log_minval: float,
                             is_exp: bool, orig_mean: float, orig_sd: float,
                             left_tail: float, right_tail: float,
                             max_perc_outliers: float, z_norm: float, z_outlier: float,
                             check_nonneg_outliers: bool) -> bool:
    """Numeric 1-D cluster: trimmed mean/SD, z + gap outlier test, limits.

    Semantics of src/clusters.cpp:108-446.  ``y`` is the (possibly
    transformed) working column, ``orig`` the untransformed one; ``ix`` the
    row indices of this cluster's subset (any order).  Mutates ``cluster``
    in place and assigns flagged rows into ``state``.  Returns whether any
    outlier was found.
    """
    tot = ix.shape[0]
    if tot < 5:
        cluster.update(lower_lim=-math.inf, upper_lim=math.inf,
                       perc_above=1.0, perc_below=1.0,
                       display_lim_low=float("nan"), display_lim_high=float("nan"),
                       cluster_mean=0.0, cluster_sd=0.0,
                       display_mean=0.0, display_sd=0.0, cluster_size=int(tot))
        return False

    order = ix[np.argsort(y[ix], kind="stable")]
    ys = y[order]
    os_ = orig[order]

    tail_size = int(calculate_max_outliers(float(tot), max_perc_outliers))
    min_gap = z_outlier - z_norm
    min_gap_orig_scale = math.log(math.sqrt(tot)) / 2.0
    min_gap_orig_scale = min(2.5, max(1.1, min_gap_orig_scale))

    lo, hi = tail_size, tot - tail_size  # interior slice [lo, hi)
    if hi - lo < 2:
        lo, hi = 0, tot
    cnt = hi - lo
    mean, sd = welford_mean_sd(ys[lo:hi])
    # SD inflation for the removed tails (src/clusters.cpp:170-176)
    sd *= float(cnt + 3 * tail_size) / float(cnt + tail_size)
    if (math.isfinite(left_tail) or math.isfinite(right_tail)) and not is_log and not is_exp:
        sd *= 0.5
    sd = max(sd, EPS / min(min_gap, z_norm))
    cluster["cluster_mean"] = mean
    cluster["cluster_sd"] = sd

    tail_size = min(tail_size, log2ceil(tot))

    z = z_score_arr(ys, mean, sd)
    has_low = (-z[0] >= z_outlier) and (ys[0] > left_tail)
    has_high = (z[-1] >= z_outlier) and (ys[-1] < right_tail)
    has_outlier_neg = False
    st_normals = 0
    end_normals = 0  # sentinel: 0 == not found (mirrors reference)

    def _orig_next_gap_ok(row: int, low_side: bool) -> bool:
        # transformed columns: require the gap to persist in the original scale
        if not (is_exp or is_log):
            return True
        if low_side:
            curr_gap = os_[row + 1] - os_[row]
            nxt = 0.0
            for rr in range(row + 1, tot - 1):
                if os_[rr + 1] > os_[rr]:
                    nxt = os_[rr + 1] - os_[rr]
                    break
        else:
            curr_gap = os_[row] - os_[row - 1]
            nxt = 0.0
            for rr in range(row - 1, 0, -1):
                if os_[rr] > os_[rr - 1]:
                    nxt = os_[rr] - os_[rr - 1]
                    break
        return not (nxt > 0 and curr_gap / nxt < min_gap_orig_scale)

    if has_low:
        for row in range(0, tail_size):
            if z[row + 1] - z[row] >= min_gap:
                if not _orig_next_gap_ok(row, low_side=True):
                    continue
                st_normals = row + 1
                if is_exp:
                    cluster["lower_lim"] = math.log(max(ys[row + 1] - min_gap * sd, 1e-300)) * orig_sd + orig_mean
                elif is_log:
                    cluster["lower_lim"] = math.exp(ys[row + 1] - min_gap * sd) + log_minval
                else:
                    cluster["lower_lim"] = float(ys[row + 1] - min_gap * sd)
                cluster["display_lim_low"] = float(os_[row + 1])
                cluster["perc_above"] = float(tot - st_normals) / float(tot)
                if cluster["display_lim_low"] <= cluster["lower_lim"]:
                    cluster["lower_lim"] = float(np.nextafter(cluster["display_lim_low"], -np.inf))
                break
            if z[row] > -z_outlier:
                break
        if st_normals == 0:
            has_low = False

    # negative-among-positives rule, root cluster only (src/clusters.cpp:261-276)
    if check_nonneg_outliers and st_normals == 0 and tot >= 500 and os_[0] < 0.0 and os_[-1] >= 2.0:
        max_neg = 1 if tot < 10000 else (2 if tot < 100000 else 3)
        if os_[max_neg] > 0.0:
            num_neg = int((os_[:max_neg] < 0.0).sum())
            st_normals = num_neg
            cluster["lower_lim"] = 0.0
            # (reference indexes orig_x[ix_arr[st + st_normals]], a double-offset
            # quirk; we use the intended first-normal value)
            cluster["display_lim_low"] = float(os_[st_normals])
            cluster["perc_above"] = float(tot - st_normals) / float(tot)
            has_outlier_neg = True

    if (has_low or has_outlier_neg) and st_normals > 0:
        rows = order[:st_normals]
        better = _better_cluster_fit(state, clusters, rows,
                                     bool(cluster["has_NA_branch"]), tree_depth,
                                     tot - 2 * tail_size)
        sel = rows[better]
        if sel.shape[0]:
            sc = np.array([chebyshyov_bound(z_score(y[r], mean, sd)) for r in sel])
            sc = np.where(np.isfinite(sc), sc, 0.0)
            state.assign(sel, sc, cluster_num, tree_num, tree_depth,
                         bool(cluster["has_NA_branch"]), tot - 2 * tail_size)

    if not has_low and not has_outlier_neg:
        cluster["perc_above"] = 1.0
        if not is_log and not is_exp:
            cluster["lower_lim"] = float(ys[0] - min_gap * sd) if math.isinf(left_tail) else -math.inf
        elif is_exp:
            cluster["lower_lim"] = math.log(max(ys[0] - min_gap * sd, 1e-300)) * orig_sd + orig_mean
        else:
            cluster["lower_lim"] = math.exp(ys[0] - min_gap * sd) + log_minval
        if cluster["lower_lim"] > -math.inf and cluster["lower_lim"] >= os_[0]:
            cluster["lower_lim"] = float(np.nextafter(os_[0], -np.inf))
        if is_exp or is_log:
            for row in range(0, tot - 1):
                if os_[row + 1] > os_[row]:
                    curr_gap = os_[row + 1] - os_[row]
                    cluster["lower_lim"] = min(cluster["lower_lim"],
                                               float(os_[0] - min_gap_orig_scale * curr_gap))
                    break
        cluster["display_lim_low"] = float(os_[0])

    if has_high:
        for row in range(tot - 1, tot - 1 - tail_size, -1):
            if z[row] - z[row - 1] >= min_gap:
                if not _orig_next_gap_ok(row, low_side=False):
                    continue
                end_normals = row - 1
                if is_exp:
                    cluster["upper_lim"] = math.log(max(ys[row - 1] + min_gap * sd, 1e-300)) * orig_sd + orig_mean
                elif is_log:
                    cluster["upper_lim"] = math.exp(ys[row - 1] + min_gap * sd) + log_minval
                else:
                    cluster["upper_lim"] = float(ys[row - 1] + min_gap * sd)
                cluster["display_lim_high"] = float(os_[row - 1])
                cluster["perc_below"] = float(end_normals + 1) / float(tot)
                if cluster["display_lim_high"] >= cluster["upper_lim"]:
                    # reference nudges toward -inf here too (clusters.cpp:346)
                    cluster["upper_lim"] = float(np.nextafter(cluster["display_lim_high"], -np.inf))
                break
            if z[row] < z_outlier:
                break
        if end_normals == 0:
            has_high = False
        else:
            rows = order[end_normals + 1:]
            better = _better_cluster_fit(state, clusters, rows,
                                         bool(cluster["has_NA_branch"]), tree_depth,
                                         tot - 2 * tail_size)
            sel = rows[better]
            if sel.shape[0]:
                sc = np.array([chebyshyov_bound(z_score(y[r], mean, sd)) for r in sel])
                sc = np.where(np.isfinite(sc), sc, 0.0)
                state.assign(sel, sc, cluster_num, tree_num, tree_depth,
                             bool(cluster["has_NA_branch"]), tot - 2 * tail_size)

    if not has_high:
        cluster["perc_below"] = 1.0
        if not is_log and not is_exp:
            cluster["upper_lim"] = float(ys[-1] + min_gap * sd) if math.isinf(right_tail) else math.inf
        elif is_exp:
            cluster["upper_lim"] = math.log(max(ys[-1] + min_gap * sd, 1e-300)) * orig_sd + orig_mean
        else:
            cluster["upper_lim"] = math.exp(ys[-1] + min_gap * sd) + log_minval
        if cluster["upper_lim"] < math.inf and cluster["upper_lim"] <= os_[-1]:
            cluster["upper_lim"] = float(np.nextafter(os_[-1], np.inf))
        # (reference's orig-scale widening loop for the high side is dead code
        #  -- clusters.cpp:409 -- so no equivalent here)
        cluster["display_lim_high"] = float(os_[-1])

    # displayed statistics (src/clusters.cpp:422-442)
    if has_high or has_low or is_log or is_exp or has_outlier_neg:
        st_disp = st_normals if (has_low or has_outlier_neg) else 0
        end_disp = end_normals if has_high else tot - 1
        dm, dsd = welford_mean_sd(os_[st_disp:end_disp + 1])
        cluster["cluster_size"] = int(end_disp - st_disp + 1)
        cluster["display_mean"] = dm
        cluster["display_sd"] = dsd
    else:
        cluster["display_mean"] = cluster["cluster_mean"]
        cluster["display_sd"] = cluster["cluster_sd"]
        cluster["cluster_size"] = int(tot)

    return bool(has_low or has_high or has_outlier_neg)


def find_outlier_categories(counts: np.ndarray, tot: int, max_perc_outliers: float,
                            perc_threshold: np.ndarray, z_norm: float):
    """Tail-mode categorical outlier rule (src/cat_outlier.cpp:75-194).

    Returns (is_outlier[ncat] in {-1,0,1}, found_outliers, new_is_outlier,
    next_most_comm).
    """
    ncateg = counts.shape[0]
    is_outlier = np.zeros(ncateg, dtype=np.int8)
    found = False
    new_out = False
    next_most_comm = 0.0
    max_outliers = int(calculate_max_cat_outliers(float(tot), max_perc_outliers, z_norm))
    pct_unseen = 1.0 / float(tot + 1)

    perc = np.where(counts > 0, counts / float(tot), 0.0)
    sorted_ix = np.argsort(counts, kind="stable")

    st_non_zero = 0
    for cat in range(ncateg):
        if counts[sorted_ix[cat]] > 0:
            st_non_zero = cat
            break

    if counts[sorted_ix[st_non_zero]] > max_outliers:
        return is_outlier, False, False, next_most_comm

    end_tail = 0
    for cat in range(st_non_zero, ncateg - 1):
        a = perc[sorted_ix[cat]]
        b = perc[sorted_ix[cat + 1]]
        ci = z_norm * math.sqrt(max(b * (1 - b), a * (1 - a)) / float(tot))
        if (b - a) > ci and b * 0.5 > a:
            end_tail = cat
            next_most_comm = float(b)
            break

    size_tail = int(counts[sorted_ix[st_non_zero:end_tail + 1]].sum()) if end_tail >= st_non_zero else 0

    if size_tail >= max_outliers:
        # tail too long: only unseen categories may be flaggable
        # (mirrors the reference's sorted_ix[sorted_ix[...]] indexing,
        #  cat_outlier.cpp:152-157, which is deterministic)
        p0 = perc[sorted_ix[st_non_zero]]
        ref_val = float(sorted_ix[min(int(sorted_ix[st_non_zero]), ncateg - 1)])
        if (
            st_non_zero == 0
            or (ref_val * 0.5) / float(tot + 1) <= pct_unseen
            or ((ref_val - 1) / float(tot + 1)
                - z_norm * math.sqrt(p0 * (1 - p0) / float(tot))) >= pct_unseen
        ):
            return is_outlier, False, False, next_most_comm
        for cat in range(0, st_non_zero):
            if perc_threshold[sorted_ix[cat]] > pct_unseen:
                new_out = True
                is_outlier[sorted_ix[cat]] = -1
        next_most_comm = float(perc[sorted_ix[st_non_zero]])
        return is_outlier, False, new_out, next_most_comm

    for cat in range(st_non_zero, end_tail + 1):
        if perc[sorted_ix[cat]] < perc_threshold[sorted_ix[cat]]:
            is_outlier[sorted_ix[cat]] = 1
            found = True

    if st_non_zero > 0:
        for cat in range(0, st_non_zero):
            if perc_threshold[sorted_ix[cat]] > pct_unseen:
                new_out = True
                is_outlier[sorted_ix[cat]] = -1
    if new_out and not found:
        next_most_comm = float(perc[sorted_ix[st_non_zero]])

    return is_outlier, found, new_out, next_most_comm


def find_outlier_categories_by_maj(counts: np.ndarray, tot: int, max_perc_outliers: float,
                                   prior_prob: np.ndarray, z_outlier: float):
    """Majority-mode (GritBot) rule (src/cat_outlier.cpp:227-265).

    Returns (is_outlier, found, new_is_outlier, categ_maj).
    """
    ncateg = counts.shape[0]
    is_outlier = np.zeros(ncateg, dtype=np.int8)
    found = False
    new_out = False
    max_outliers = int(calculate_max_outliers(float(tot), max_perc_outliers))
    categ_maj = int(np.argmax(counts))
    n_non_maj = tot - int(counts[categ_maj])
    if n_non_maj > max_outliers:
        return is_outlier, False, False, categ_maj
    thr_prop = 1.0 / (z_outlier * z_outlier)
    denom = float(tot + 1)
    for cat in range(ncateg):
        if cat == categ_maj or prior_prob[cat] <= 0:
            continue
        if (n_non_maj / (denom * prior_prob[cat])) < thr_prop:
            if counts[cat]:
                is_outlier[cat] = 1
                found = True
            else:
                is_outlier[cat] = -1
                new_out = True
    return is_outlier, found, new_out, categ_maj


def find_outlier_categories_no_cond(counts: np.ndarray, tot: int):
    """Unconditional rare-category rule (src/cat_outlier.cpp:285-328)."""
    ncateg = counts.shape[0]
    is_outlier = np.zeros(ncateg, dtype=np.int8)
    if tot < 1000:
        return is_outlier, False, 0.0
    max_outliers = 1 if tot < 10000 else (2 if tot < 100000 else 3)
    max_next_most_comm = 250
    has_outlier = False
    for cat in range(ncateg):
        c = counts[cat]
        if c > max_outliers and c < max_next_most_comm:
            has_outlier = False
            break
        if 0 < c <= max_outliers:
            if has_outlier:  # only one outlier category allowed
                has_outlier = False
                break
            has_outlier = True
            is_outlier[cat] = 1
    next_most_comm = 0.0
    if has_outlier:
        normal = counts[(counts > 0) & (is_outlier == 0)]
        if normal.shape[0]:
            next_most_comm = float(normal.min()) / float(tot)
    else:
        is_outlier[:] = 0
    return is_outlier, has_outlier, next_most_comm


def define_categ_cluster_no_cond(codes: np.ndarray, ix: np.ndarray, ncateg: int,
                                 state: RowState, cluster: dict,
                                 counts: np.ndarray, is_outlier: np.ndarray,
                                 perc_next_most_comm: float) -> None:
    """Root rare-category cluster (src/clusters.cpp:483-509)."""
    tot = ix.shape[0]
    cluster["cluster_size"] = int(tot)
    subset_common = is_outlier.astype(int).tolist()
    score_categ = [0.0] * ncateg
    vals = codes[ix]
    out_mask = is_outlier[vals] == 1
    rows = ix[out_mask]
    cnt_common = tot - rows.shape[0]
    for cat in range(ncateg):
        if is_outlier[cat] == 1 and counts[cat] > 0:
            p = counts[cat] / float(tot)
            score_categ[cat] = p + math.sqrt(p * (1 - p) / float(tot))
    if rows.shape[0]:
        sc = np.array([score_categ[v] for v in codes[rows]])
        state.assign(rows, sc, 0, 0, 0, False, int(tot))
    cluster["subset_common"] = subset_common
    cluster["score_categ"] = score_categ
    cluster["perc_in_subset"] = cnt_common / float(tot)
    cluster["perc_next_most_comm"] = perc_next_most_comm


def define_categ_cluster(codes: np.ndarray, ix: np.ndarray, ncateg: int, by_maj: bool,
                         state: RowState, cluster: dict, clusters: list,
                         cluster_num: int, tree_num: int, tree_depth: int,
                         max_perc_outliers: float, z_norm: float, z_outlier: float,
                         perc_threshold: np.ndarray, prop_prior: np.ndarray):
    """Conditional categorical cluster (src/clusters.cpp:581-696).

    Returns (found_outliers, drop_cluster).
    """
    tot = ix.shape[0]
    tail_size = int(calculate_max_outliers(float(tot), max_perc_outliers))
    cluster["perc_in_subset"] = 1.0
    vals = codes[ix]
    counts = np.bincount(vals, minlength=ncateg).astype(np.int64)

    if not by_maj:
        is_outlier, found, new_out, next_most_comm = find_outlier_categories(
            counts, tot, max_perc_outliers, perc_threshold, z_norm)
        cluster["perc_next_most_comm"] = float(next_most_comm)
        categ_maj = -1
    else:
        is_outlier, found, new_out, categ_maj = find_outlier_categories_by_maj(
            counts, tot, max_perc_outliers, prop_prior, z_outlier)
        cluster["categ_maj"] = int(categ_maj)

    sz_maj = tot
    if found:
        out_mask = is_outlier[vals] == 1
        rows = ix[out_mask]
        sz_maj = tot - rows.shape[0]
        better = _better_cluster_fit(state, clusters, rows,
                                     bool(cluster["has_NA_branch"]), tree_depth,
                                     tot - tail_size)
        sel = rows[better]
        if sel.shape[0]:
            if not by_maj:
                p = counts[codes[sel]] / float(tot)
                sc = p + np.sqrt(p * (1 - p) / float(tot))
            else:
                p = (tot - counts[categ_maj]) / (float(tot) * prop_prior[codes[sel]])
                sc = np.square(p)
            state.assign(sel, sc, cluster_num, tree_num, tree_depth,
                         bool(cluster["has_NA_branch"]), tot - tail_size)
        cluster["perc_in_subset"] = sz_maj / float(tot)

    if new_out and not found:
        cluster["perc_in_subset"] = 1.0

    if new_out or found:
        drop = False
        cluster["cluster_size"] = int(sz_maj)
        cluster["subset_common"] = is_outlier.astype(int).tolist()
        score_categ = [0.0] * ncateg
        if not by_maj:
            for cat in range(ncateg):
                if is_outlier[cat] > 0:
                    p = counts[cat] / float(tot)
                    score_categ[cat] = p + math.sqrt(p * (1 - p) / float(tot))
                elif is_outlier[cat] < 0:
                    p = 1.0 / float(tot + 2)
                    score_categ[cat] = p + math.sqrt(p * (1 - p) / float(tot + 2))
        else:
            cluster["perc_in_subset"] = counts[categ_maj] / float(tot)
            for cat in range(ncateg):
                if cat == categ_maj or is_outlier[cat] == 0 or prop_prior[cat] <= 0:
                    continue
                s = (tot - counts[categ_maj] + 1) / (float(tot + 2) * prop_prior[cat])
                score_categ[cat] = s * s
        cluster["score_categ"] = score_categ
    else:
        drop = True

    return found, drop
