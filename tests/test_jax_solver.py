"""JAX dense-scan backend vs numpy oracle parity + convergence tests.

(ref analogue: torch re-implementation vs CUDA parity tests,
src/bdd_cuda_torch/tests/test_bdd_torch_base.py)
"""
import math

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver.flatten import densify
from bdd_tpu.solver import jax_solver as js
from tests import fixtures

FIXTURE_LPS = [
    fixtures.SHORT_MRF_CHAIN,
    fixtures.TWO_SIMPLEX,
    fixtures.COVERING,
    fixtures.MATCHING_3x3,
]


def build(lp_text, dtype=jnp.float64):
    ilp = parse_lp_string(lp_text)
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    dense = densify(flat)
    geom = js.geom_from_dense(dense, dtype=dtype)
    state = js.init_state(geom, dense, pre.objective_vector(), dtype=dtype)
    ref = RefSolver(flat, pre.objective_vector(), dtype=np.float64)
    return ilp, pre, flat, dense, geom, state, ref


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_initial_lower_bound_parity(lp):
    ilp, pre, flat, dense, geom, state, ref = build(lp)
    lb_jax = float(js.lower_bound(geom, state))
    assert lb_jax == pytest.approx(ref.lower_bound(), abs=1e-9)


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_min_marginals_parity(lp):
    ilp, pre, flat, dense, geom, state, ref = build(lp)
    m0d, m1d = js.min_marginals(geom, state.lo, state.hi)
    m0r, m1r = ref.min_marginals()
    m0d, m1d = np.asarray(m0d), np.asarray(m1d)
    mask = dense.flat_layer_index >= 0
    idx = dense.flat_layer_index[mask]
    for dn, rf in ((m0d, m0r), (m1d, m1r)):
        d = dn[mask]
        r = rf[idx]
        both_inf = np.isinf(d) & np.isinf(r)
        assert np.allclose(d[~both_inf], r[~both_inf], atol=1e-9)


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_iteration_parity(lp):
    ilp, pre, flat, dense, geom, state, ref = build(lp)
    mask = dense.flat_layer_index >= 0
    idx = dense.flat_layer_index[mask]
    for it in range(10):
        state = js.iteration(geom, state, 0.5)
        ref.iteration(0.5)
        for dn, rf in (
            (np.asarray(state.lo), ref.lo_cost),
            (np.asarray(state.hi), ref.hi_cost),
            (np.asarray(state.def_mm), ref.def_mm),
        ):
            d, r = dn[mask], rf[idx]
            both_inf = np.isinf(d) & np.isinf(r) & (np.sign(d) == np.sign(r))
            assert np.allclose(d[~both_inf], r[~both_inf], atol=1e-8), f"iter {it}"
    lb_jax = float(js.lower_bound_with_deferred(geom, state))
    assert lb_jax == pytest.approx(ref.lower_bound_with_deferred(), abs=1e-8)


def test_convergence_f32():
    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    dense = densify(flat)
    geom = js.geom_from_dense(dense, dtype=jnp.float32)
    state = js.init_state(geom, dense, pre.objective_vector(), dtype=jnp.float32)
    state = js.iterations(geom, state, 200, 0.5)
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    lb = float(js.lower_bound_with_deferred(geom, state))
    assert lb == pytest.approx(opt, abs=1e-3)


def test_infeasible_diverges():
    ilp, pre, flat, dense, geom, state, ref = build(fixtures.INFEASIBLE)
    state = js.iterations(geom, state, 50, 0.5)
    assert float(js.lower_bound_with_deferred(geom, state)) == math.inf


def test_iterations_scan_matches_python_loop():
    ilp, pre, flat, dense, geom, state, ref = build(fixtures.TWO_SIMPLEX)
    s_scan = js.iterations(geom, state, 7, 0.5)
    s_loop = state
    for _ in range(7):
        s_loop = js.iteration(geom, s_loop, 0.5)
    for a, b in zip(s_scan, s_loop):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
