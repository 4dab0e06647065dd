"""Operator-level unit tests against hand-computed expectations
(FIXTURES.md F5)."""

import math

import numpy as np
import pytest

from outliertree_spark.config import SD_REG, ValidationConfig
from outliertree_spark.functions.stats import (
    calc_sd_counts,
    calculate_max_cat_outliers,
    calculate_max_outliers,
    categ_gain,
    chebyshyov_bound,
    check_for_tails,
    decimals_diff,
    prop_small_and_prior,
    total_info,
    welford_mean_sd,
    z_score,
)


def test_welford_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.normal(10, 3, size=1000)
    mean, sd = welford_mean_sd(x)
    assert mean == pytest.approx(x.mean(), rel=1e-12)
    assert sd == pytest.approx(x.std(ddof=1), rel=1e-12)


def test_calc_sd_counts_regularizer():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    sd = calc_sd_counts(4, x.sum(), (x * x).sum())
    expected = math.sqrt(((x * x).sum() - x.sum() ** 2 / 4 + SD_REG) / 3)
    assert sd == pytest.approx(expected, rel=1e-12)
    assert calc_sd_counts(2, 3.0, 5.0) == 0.0  # cnt < 3 -> 0


def test_total_info():
    counts = np.array([5, 3, 0, 2])
    n = 10
    expected = n * math.log(n) - (5 * math.log(5) + 3 * math.log(3) + 2 * math.log(2))
    assert total_info(counts) == pytest.approx(expected, rel=1e-12)
    assert total_info(np.array([0, 0])) == 0.0


def test_categ_gain_perfect_split():
    # perfectly separable 2-class target -> gain == base_info / n
    left = np.array([10, 0])
    right = np.array([0, 10])
    na = np.array([0, 0])
    base = total_info(np.array([10, 10]))
    g = categ_gain(na, left, right, base, 20)
    assert g == pytest.approx(base / 20, rel=1e-12)


def test_tail_size_formula():
    # n*p + 2*sqrt(n*p*(1-p)) + 1  (outlier_tree.hpp:727)
    n, p = 1000.0, 0.01
    assert calculate_max_outliers(n, p) == pytest.approx(
        10 + 2 * math.sqrt(1000 * 0.01 * 0.99) + 1)
    assert calculate_max_cat_outliers(1000, 0.01, 2.67) == pytest.approx(
        1 + 10 / 2.67)


def test_chebyshev_score():
    assert chebyshyov_bound(10.0) == pytest.approx(0.01)
    assert chebyshyov_bound(0.5) == 1.0  # clamped at z^2 >= 1


def test_prop_small():
    counts = np.array([900, 90, 10])
    ps, prior = prop_small_and_prior(counts, 1000, 2.67)
    p = 0.01
    sd = math.sqrt(p * (1 - p) / 1000)
    assert ps[2] == pytest.approx(min(p - 2.67 * sd, p / 2))
    assert prior[0] == pytest.approx(0.9)


def test_decimals_diff():
    assert decimals_diff(1.0, 1.0) == 0
    assert decimals_diff(1.0, 1.05) == 2
    assert decimals_diff(100.0, 200.0) <= 0 or decimals_diff(100.0, 200.0) == -2


def test_check_for_tails_lognormal_gets_log_transform():
    rng = np.random.RandomState(3)
    x = np.sort(np.exp(rng.normal(0, 1.2, size=5000)))
    mean, sd = welford_mean_sd(x)
    lt, rt, exp_t, log_t = check_for_tails(x, 2.67, 0.01, mean, sd)
    assert log_t  # heavy right tail fixed by log
    assert math.isinf(rt)


def test_check_for_tails_normal_clean():
    rng = np.random.RandomState(4)
    x = np.sort(rng.normal(0, 1, size=5000))
    mean, sd = welford_mean_sd(x)
    lt, rt, exp_t, log_t = check_for_tails(x, 2.67, 0.01, mean, sd)
    assert not exp_t and not log_t
    assert math.isinf(lt) and math.isinf(rt)
