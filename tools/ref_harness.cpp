/* Differential-test harness: drives the UNMODIFIED reference C++ core
 * (compiled straight from /root/reference/src) on CSV input and prints the
 * fitted per-row outlier assignments + cluster stats, so the PySpark
 * engine's NumPy fit can be diffed against the true reference behavior.
 *
 * Input format (stdin):
 *   line 1: nrows ncols_numeric ncols_categ ncols_ord ncat_0 ... ncat_ord_0 ...
 *   then nrows lines of space-separated values: numeric cols first
 *   (literal "nan" for NA), then categorical codes, then ordinal codes
 *   (-1 for NA).
 * Output: one line per flagged row:
 *   row col_index score depth has_na_branch cluster_size lower_lim upper_lim
 */
#include "outlier_tree.hpp"
#include <cstdio>
#include <sstream>
#include <string>
#include <iostream>

int main(int argc, char **argv) {
    size_t nrows, ncols_num, ncols_cat, ncols_ord;
    int categ_from_maj = 0, cat_bruteforce = 0, categ_as_bin = 1;
    size_t max_depth = 4;
    if (argc > 1) categ_from_maj = atoi(argv[1]);
    if (argc > 2) cat_bruteforce = atoi(argv[2]);
    if (argc > 3) categ_as_bin = atoi(argv[3]);
    if (argc > 5) max_depth = (size_t)atoi(argv[5]);
    int follow_all = 0;
    if (argc > 6) follow_all = atoi(argv[6]);
    int take_mid = 0;
    double min_gain = 1e-2, z_norm = 2.67, z_outlier = 8.0, pct = 0.01;
    size_t min_size_num = 25, min_size_cat = 50;
    if (argc > 7) take_mid = atoi(argv[7]);
    if (argc > 8) min_gain = atof(argv[8]);
    if (argc > 9) z_norm = atof(argv[9]);
    if (argc > 10) z_outlier = atof(argv[10]);
    if (argc > 11) pct = atof(argv[11]);
    if (argc > 12) min_size_num = (size_t)atoi(argv[12]);
    if (argc > 13) min_size_cat = (size_t)atoi(argv[13]);
    std::cin >> nrows >> ncols_num >> ncols_cat >> ncols_ord;
    std::vector<int> ncat(ncols_cat), ncat_ord(ncols_ord);
    for (size_t i = 0; i < ncols_cat; i++) std::cin >> ncat[i];
    for (size_t i = 0; i < ncols_ord; i++) std::cin >> ncat_ord[i];

    std::vector<double> num(nrows * ncols_num);
    std::vector<int> cat(nrows * ncols_cat);
    std::vector<int> ord(nrows * ncols_ord);
    std::string tok;
    for (size_t r = 0; r < nrows; r++) {
        for (size_t c = 0; c < ncols_num; c++) {
            std::cin >> tok;
            num[r + c * nrows] = (tok == "nan")
                ? std::numeric_limits<double>::quiet_NaN() : std::stod(tok);
        }
        for (size_t c = 0; c < ncols_cat; c++) {
            std::cin >> cat[r + c * nrows];
        }
        for (size_t c = 0; c < ncols_ord; c++) {
            std::cin >> ord[r + c * nrows];
        }
    }

    ModelOutputs model;
    bool found = fit_outliers_models(
        model,
        num.data(), ncols_num,
        cat.data(), ncols_cat, ncat.data(),
        ord.data(), ncols_ord, ncat_ord.data(),
        nrows, nullptr, 1,
        (bool)categ_as_bin, (bool)categ_as_bin,
        (bool)cat_bruteforce, (bool)categ_from_maj,
        (bool)take_mid,
        max_depth, pct,
        min_size_num, min_size_cat,
        min_gain, /*gain_as_pct=*/true, (bool)follow_all,
        z_norm, z_outlier);

    printf("found=%d\n", (int)found);
    for (size_t r = 0; r < nrows; r++) {
        if (model.outlier_scores_final[r] < 1.0) {
            size_t col = model.outlier_columns_final[r];
            size_t cl = model.outlier_clusters_final[r];
            const Cluster &c = model.all_clusters[col][cl];
            printf("%zu %zu %.12g %zu %d %zu %.12g %.12g\n",
                   r, col, model.outlier_scores_final[r],
                   model.outlier_depth_final[r],
                   (int)c.has_NA_branch, c.cluster_size,
                   c.lower_lim, c.upper_lim);
        }
    }
    /* optional predict block: nrows2 then rows in the same layout; runs
       the reference's find_new_outliers on the fitted model */
    size_t nrows2 = 0;
    if (std::cin >> nrows2 && nrows2 > 0) {
        std::vector<double> num2(nrows2 * ncols_num);
        std::vector<int> cat2(nrows2 * ncols_cat);
        std::vector<int> ord2(nrows2 * ncols_ord);
        for (size_t r = 0; r < nrows2; r++) {
            for (size_t c = 0; c < ncols_num; c++) {
                std::cin >> tok;
                num2[r + c * nrows2] = (tok == "nan")
                    ? std::numeric_limits<double>::quiet_NaN() : std::stod(tok);
            }
            for (size_t c = 0; c < ncols_cat; c++) std::cin >> cat2[r + c * nrows2];
            for (size_t c = 0; c < ncols_ord; c++) std::cin >> ord2[r + c * nrows2];
        }
        find_new_outliers(num2.data(), cat2.data(), ord2.data(),
                          nrows2, 1, model);
        printf("PREDICT\n");
        for (size_t r = 0; r < nrows2; r++) {
            if (model.outlier_scores_final[r] < 1.0) {
                size_t col = model.outlier_columns_final[r];
                size_t cl = model.outlier_clusters_final[r];
                const Cluster &c = model.all_clusters[col][cl];
                printf("%zu %zu %.12g %zu %d %zu %.12g %.12g\n",
                       r, col, model.outlier_scores_final[r],
                       model.outlier_depth_final[r],
                       (int)c.has_NA_branch, c.cluster_size,
                       c.lower_lim, c.upper_lim);
            }
        }
    }

    /* structural dump for tree-level diffing */
    if (argc > 4 && atoi(argv[4])) {
        size_t tot_cols = ncols_num + ncols_cat + ncols_ord;
        for (size_t col = 0; col < tot_cols; col++) {
            for (size_t t = 0; t < model.all_trees[col].size(); t++) {
                const ClusterTree &tr = model.all_trees[col][t];
                std::string ss;
                for (auto v : tr.split_subset) ss += std::to_string((int)v);
                fprintf(stderr, "TREE %zu %zu parent=%zu branch=%d type=%d "
                        "col=%zu point=%g lev=%d subset=%s NA=%zu L=%zu R=%zu nbin=%zu\n",
                        col, t, tr.parent, (int)tr.parent_branch,
                        (int)tr.column_type, tr.col_num, tr.split_point,
                        tr.split_lev, ss.c_str(),
                        tr.tree_NA, tr.tree_left, tr.tree_right,
                        tr.binary_branches.size());
            }
            for (size_t cl = 0; cl < model.all_clusters[col].size(); cl++) {
                const Cluster &c = model.all_clusters[col][cl];
                std::string ss;
                for (auto v : c.split_subset) ss += std::to_string((int)v);
                fprintf(stderr, "CLUST %zu %zu type=%d col=%zu split=%d "
                        "point=%g lev=%d subset=%s lo=%.10g hi=%.10g size=%zu nab=%d\n",
                        col, cl, (int)c.column_type, c.col_num,
                        (int)c.split_type, c.split_point, c.split_lev,
                        ss.c_str(), c.lower_lim, c.upper_lim,
                        c.cluster_size, (int)c.has_NA_branch);
            }
        }
    }
    return 0;
}
