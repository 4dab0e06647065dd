/* Probe: call the reference's split kernels directly on stdin data and
 * print the gains, to diff split-level behavior against our NumPy kernels.
 * stdin: n, then n lines: y x1 g1 g2 ; prints gains for x1, g1, g2. */
#include "outlier_tree.hpp"
#include <cstdio>
#include <iostream>

int main() {
    size_t n;
    std::cin >> n;
    std::vector<double> y(n), x1(n);
    std::vector<int> g1(n), g2(n);
    for (size_t i = 0; i < n; i++) std::cin >> y[i] >> x1[i] >> g1[i] >> g2[i];

    std::vector<size_t> ix(n);
    for (size_t i = 0; i < n; i++) ix[i] = i;

    /* mean/sd of y over all rows (ddof=1 style like the reference) */
    double mean;
    long double sd = calc_sd(ix.data(), y.data(), 0, n - 1, &mean);
    printf("mean=%.10g sd=%.10Lg\n", mean, sd);

    long double gain; double split_point; size_t split_left, split_NA;
    bool zero_var;
    std::vector<long double> buffer_sd(n);
    split_numericx_numericy(ix.data(), 0, n - 1, x1.data(), y.data(), sd,
                            false, 25, false, buffer_sd.data(),
                            &gain, &split_point, &split_left, &split_NA,
                            &zero_var);
    printf("x1: gain=%.10Lg pct=%.10Lg point=%.10g\n", gain, gain / sd, split_point);

    for (int which = 0; which < 2; which++) {
        int *g = which == 0 ? g1.data() : g2.data();
        size_t ncat = which == 0 ? 2 : 4;
        std::vector<size_t> cat_cnt(ncat + 1);
        std::vector<long double> cat_sum(ncat + 1), cat_ssq(ncat + 1);
        std::vector<size_t> cat_sorted(ncat);
        std::vector<signed char> subset(ncat);
        long double g_gain; int split_lev; bool bin;
        for (size_t i = 0; i < n; i++) ix[i] = i;
        split_categx_numericy(ix.data(), 0, n - 1, g, y.data(), sd, mean,
                              false, ncat, cat_cnt.data(), cat_sum.data(),
                              cat_ssq.data(), cat_sorted.data(), false, 25,
                              &g_gain, subset.data(), &split_lev, &zero_var, &bin);
        printf("g%d: gain=%.10Lg pct=%.10Lg subset=", which + 1, g_gain, g_gain / sd);
        for (size_t c = 0; c < ncat; c++) printf("%d", (int)subset[c]);
        printf("\n");
    }
    return 0;
}
