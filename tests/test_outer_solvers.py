"""L-BFGS and subgradient outer loops + solution/dual-algebra primitives.

(ref analogues: lbfgs tests via bdd_solver_regression, bdds_solution_cuda
tests test_bdd_cuda_base_sol.cpp)
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver import jax_solver as js
from bdd_tpu.solver.lbfgs import LbfgsSolver
from bdd_tpu.solver.subgradient import SubgradientSolver
from bdd_tpu.solver.wrapper import JaxSolver
from bdd_tpu.utils.problems import grid_mrf
from tests import fixtures


def build(lp=None, ilp=None, dtype=jnp.float64):
    if ilp is None:
        ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    base = JaxSolver(flat, pre.objective_vector(), dtype=dtype)
    return ilp, pre, flat, base


def test_bdds_solution_matches_ref():
    ilp, pre, flat, base = build(fixtures.MATCHING_3x3)
    ref = RefSolver(flat, pre.objective_vector())
    sol_dense = np.asarray(
        js.bdds_solution(base.geom, base.state.lo, base.state.hi)
    )
    sol_ref = ref.bdds_solution()
    mask = base.dense.flat_layer_index >= 0
    idx = base.dense.flat_layer_index[mask]
    np.testing.assert_array_equal(sol_dense[mask], sol_ref[idx])


def test_make_dual_feasible_zero_sums():
    ilp, pre, flat, base = build(fixtures.MATCHING_3x3)
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(*base.state.lo.shape))
    proj = np.asarray(js.make_dual_feasible(base.geom, g))
    lvar = np.asarray(base.geom.layer_var)
    lvalid = np.asarray(base.geom.layer_valid)
    sums = np.zeros(flat.nr_vars)
    np.add.at(sums, lvar[lvalid], proj[lvalid])
    assert np.allclose(sums, 0.0, atol=1e-9)


def test_gradient_step_with_feasible_direction_preserves_dual_value_sum():
    """A zero-sum direction keeps the reparametrization valid: per-variable net
    cost totals are unchanged."""
    ilp, pre, flat, base = build(fixtures.MATCHING_3x3)
    obj = np.asarray(pre.objective_vector())
    g = js.make_dual_feasible(
        base.geom, jnp.asarray(np.random.RandomState(1).randn(*base.state.lo.shape))
    )
    base.state = js.gradient_step(base.geom, base.state, g, 0.37)
    lvar = np.asarray(base.geom.layer_var)
    lvalid = np.asarray(base.geom.layer_valid)
    net = np.asarray(base.state.hi - base.state.lo)
    sums = np.zeros(flat.nr_vars)
    np.add.at(sums, lvar[lvalid], net[lvalid])
    assert np.allclose(sums, obj, atol=1e-9)


@pytest.mark.parametrize("outer", ["lbfgs", "subgradient"])
def test_outer_solver_converges(outer):
    ilp, pre, flat, base = build(fixtures.MATCHING_3x3)
    s = LbfgsSolver(base) if outer == "lbfgs" else SubgradientSolver(base)
    for _ in range(150):
        s.iteration()
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    lb = s.lower_bound_with_deferred()
    assert lb <= opt + 1e-6
    assert lb >= opt - 1e-2, f"{outer} lb {lb} vs opt {opt}"


def test_lbfgs_monotone_non_decreasing():
    ilp = grid_mrf(3, 3, 2, seed=3)
    ilp.normalize()
    _, pre, flat, base = build(ilp=ilp)
    s = LbfgsSolver(base)
    prev = s.lower_bound()
    for i in range(40):
        s.iteration()
        cur = s.lower_bound()
        assert cur >= prev - 1e-6, f"iteration {i}"
        prev = cur


def test_lbfgs_not_slower_than_mma():
    """After equal iteration counts, lbfgs should be at least as tight as plain
    MMA on a harder instance (the point of the outer loop)."""
    ilp = grid_mrf(4, 4, 3, seed=5)
    ilp.normalize()
    _, pre, flat, base = build(ilp=ilp)
    s = LbfgsSolver(base)
    for _ in range(60):
        s.iteration()
    _, pre2, flat2, base2 = build(ilp=grid_mrf(4, 4, 3, seed=5))
    base2.iteration_block(60)
    assert s.lower_bound_with_deferred() >= base2.lower_bound_with_deferred() - 1e-3


def test_uniform_bdds_solution_matches_dense():
    import bdd_tpu.solver.uniform as uf
    from bdd_tpu.solver.uniform_wrapper import UniformSolver

    ilp, pre, flat, base = build(fixtures.MATCHING_3x3)
    us = UniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    sols = uf.bdds_solution(us.geom, us.state)
    # decode per-variable votes from both backends and compare evaluations
    ref = RefSolver(flat, pre.objective_vector())
    sol_ref = ref.bdds_solution()
    # aggregate per (bdd, var): uniform layout
    votes_u = {}
    for g, s, lbdd in zip(us.geom.buckets, sols, us.host.layer_bdd):
        s = np.asarray(s)
        lvar = np.asarray(g.layer_var)
        lval = np.asarray(g.layer_valid)
        lbdd = np.asarray(lbdd)
        for h in range(g.H):
            for c in range(g.B):
                if lval[h, c]:
                    votes_u[(int(lbdd[h, c]), int(lvar[h, c]))] = int(s[h, c])
    votes_r = {}
    valid = flat.valid_layer_mask()
    for li in np.nonzero(valid)[0]:
        votes_r[(int(flat.layer_bdd[li]), int(flat.layer_var[li]))] = int(sol_ref[li])
    assert votes_u == votes_r


@pytest.mark.parametrize("outer", ["lbfgs", "subgradient"])
def test_outer_solver_on_uniform_backend(outer):
    from bdd_tpu.solver.uniform_wrapper import UniformSolver

    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    pre = BddPreprocessor(ilp)
    base = UniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    s = LbfgsSolver(base) if outer == "lbfgs" else SubgradientSolver(base)
    for _ in range(120):
        s.iteration()
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    lb = s.lower_bound_with_deferred()
    assert lb <= opt + 1e-6
    assert lb >= opt - 1e-2, f"{outer} on uniform: lb {lb} vs opt {opt}"


def test_lbfgs_device_path_matches_host_path():
    """The fully-jitted L-BFGS iteration (history ring buffers + while-loop
    step search on device) must reproduce the host-orchestrated control flow
    bit-for-bit in f64, including curvature skips, step growth/decay and the
    exhausted-search fallbacks."""
    import os

    from bdd_tpu.solver.uniform_wrapper import UniformSolver

    def make():
        ilp = grid_mrf(4, 4, 3, seed=5)
        ilp.normalize()
        pre = BddPreprocessor(ilp)
        return UniformSolver(
            pre.collection,
            pre.total_nr_variables(),
            pre.objective_vector(),
            nr_primal_vars=pre.nr_primal_variables,
            dtype=jnp.float64,
        )

    os.environ["BDD_TPU_LBFGS_HOST"] = "1"
    try:
        host = LbfgsSolver(make())
        host_lbs = []
        for _ in range(40):
            host.iteration()
            host_lbs.append(host.lower_bound())
    finally:
        del os.environ["BDD_TPU_LBFGS_HOST"]
    dev = LbfgsSolver(make())
    assert dev._use_device
    dev_lbs = []
    for _ in range(40):
        dev.iteration()
        dev_lbs.append(dev.lower_bound())
    np.testing.assert_allclose(dev_lbs, host_lbs, rtol=0, atol=1e-9)
