"""Parallel-prefix (log-depth) sweeps vs sequential scans."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import prefix as px
from bdd_tpu.solver import uniform as uf
from bdd_tpu.utils.problems import set_cover
from tests import fixtures


def build(lp=None, ilp=None):
    if ilp is None:
        ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    host = uf.flatten_uniform(
        pre.collection,
        pre.total_nr_variables(),
        pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    state = uf.init_uniform_state(host, pre.objective_vector(), dtype=jnp.float64)
    return host, uf.iterations(host.geom, state, 5, 0.5)


def assert_close_inf(a, b, atol=1e-9):
    a, b = np.asarray(a), np.asarray(b)
    both_inf = np.isinf(a) & np.isinf(b)
    assert np.array_equal(np.isinf(a), np.isinf(b))
    assert np.allclose(a[~both_inf], b[~both_inf], atol=atol)


@pytest.mark.parametrize(
    "lp",
    [
        fixtures.MATCHING_3x3,
        fixtures.COVERING,
        fixtures.SHORT_MRF_CHAIN,
        fixtures.INFEASIBLE,
    ],
)
def test_prefix_sweep_parity(lp):
    host, state = build(lp)
    for g, lo, hi, cft_ref in zip(
        host.geom.buckets, state.lo, state.hi, state.cft
    ):
        assert_close_inf(px.bucket_backward_run_prefix(g, lo, hi), cft_ref)
        assert_close_inf(
            px.bucket_forward_run_prefix(g, lo, hi), uf.bucket_forward_run(g, lo, hi)
        )
        m0p, m1p = px.bucket_min_marginals_prefix(g, lo, hi)
        m0r, m1r = uf.bucket_min_marginals(g, lo, hi)
        assert_close_inf(m0p, m0r)
        assert_close_inf(m1p, m1r)
    assert float(px.lower_bound_prefix(host.geom, state)) == pytest.approx(
        float(uf.lower_bound(host.geom, state)), abs=1e-9
    ) or np.isinf(float(uf.lower_bound(host.geom, state)))


def test_prefix_deep_bucket():
    """Deep set-cover BDDs (H up to 64): log-depth sweep equals the scan."""
    ilp = set_cover(60, 80, density=0.1, seed=2)
    ilp.reorder_bfs()
    ilp.normalize()
    host, state = build(ilp=ilp)
    for g, lo, hi, cft_ref in zip(
        host.geom.buckets, state.lo, state.hi, state.cft
    ):
        assert_close_inf(px.bucket_backward_run_prefix(g, lo, hi), cft_ref)
