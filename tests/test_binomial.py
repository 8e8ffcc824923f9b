"""Exact one-sided binomial p-value vs scipy (the previous backend):
agreement to ~1e-12 relative across the parameter ranges the
significance filters use, plus the reference's edge-case contract
(reference: blt_util/binomial_test.cpp, test coverage mirrored from
blt_util/test/binomial_test_test.cpp style)."""

import numpy as np
import pytest

from manta_tpu.core.binomial import (
    binomial_gte_n_success_pval, is_reject_binomial_gte_n_success_exact,
)


def test_matches_scipy_grid():
    from scipy.stats import binom
    rng = np.random.default_rng(0)
    for _ in range(500):
        n = int(rng.integers(1, 100000))
        k = int(rng.integers(1, min(n, 50) + 1))
        p = float(rng.uniform(1e-6, 0.5))
        want = float(binom.sf(k - 1, n, p))
        got = binomial_gte_n_success_pval(p, k, n)
        assert got == pytest.approx(want, rel=1e-10, abs=1e-300), (n, k, p)


def test_edge_cases():
    # n_success == 0 -> pval 1 (reference: binomial_test.cpp:122)
    assert binomial_gte_n_success_pval(0.01, 0, 100) == 1.0
    assert binomial_gte_n_success_pval(0.01, 0, 0) == 1.0
    # certain success probability
    assert binomial_gte_n_success_pval(1.0, 5, 10) == 1.0
    assert binomial_gte_n_success_pval(0.0, 1, 10) == 0.0
    # k > n cannot happen
    assert binomial_gte_n_success_pval(0.3, 11, 10) == 0.0
    # monotonic in k
    ps = [binomial_gte_n_success_pval(0.01, k, 1000) for k in range(1, 8)]
    assert all(a > b for a, b in zip(ps, ps[1:]))


def test_reject_thresholds():
    # the phase-2 filter configuration: alpha=0.03 spanning, 0.005 assembly
    # with noise rates around (s+10)/(n+1000)
    assert is_reject_binomial_gte_n_success_exact(0.03, 0.01, 4, 50)
    assert not is_reject_binomial_gte_n_success_exact(0.03, 0.2, 4, 50)
