"""Flattening + numpy oracle solver tests.

Oracles: exhaustive enumeration (min marginals, per-BDD minima) and known LP
bounds on fixture problems (ref: test_bdd_min_marginals.cpp,
test_bdd_parallel_mma.cpp, test_bdd_small_binary_mrfs.cpp,
test_bdd_infeasible_problem.cpp).
"""
import math
import random

import numpy as np
import pytest

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver.flatten import densify
from tests import fixtures


def build(lp_text):
    ilp = parse_lp_string(lp_text)
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    return ilp, pre, flat


def test_flatten_invariants():
    ilp, pre, flat = build(fixtures.SHORT_MRF_CHAIN)
    assert flat.nr_bdds == 7
    assert flat.nr_vars == 8
    # hop 0 nodes are exactly the roots
    s, e = flat.hop_node_range(0)
    assert e - s == flat.nr_bdds
    assert sorted(flat.root_node) == list(range(s, e))
    # every variable appears in >= 1 layer; counts match constraint membership
    assert np.all(flat.num_bdds_per_var >= 1)
    mu00 = ilp.get_var_index("mu_00")
    assert flat.num_bdds_per_var[mu00] == 3  # marg constraint x2 + simplex
    # arcs go to strictly later nodes or terminals
    for i in range(flat.nr_nodes):
        for c in (flat.lo_node[i], flat.hi_node[i]):
            if c >= 0:
                assert c > i or c >= flat.cum_nodes_per_hop[flat.nr_hops - 1]


def test_initial_lower_bound_equals_per_bdd_minima():
    ilp, pre, flat = build(fixtures.MATCHING_3x3)
    s = RefSolver(flat, pre.objective_vector())
    # brute force per-bdd minimum with layer costs
    col = pre.collection
    layer_costs = {}
    for li in range(flat.nr_layers):
        if flat.layer_var[li] < flat.nr_vars:
            layer_costs[(int(flat.layer_bdd[li]), int(flat.layer_var[li]))] = (
                s.lo_cost[li],
                s.hi_cost[li],
            )
    expected = 0.0
    for b in range(col.nr_bdds()):
        support = col.level_variables(b)
        best = math.inf
        for sol in col.solutions(b):
            cost = sum(layer_costs[(b, v)][sol[v]] for v in support)
            best = min(best, cost)
        expected += best
    assert s.lower_bound() == pytest.approx(expected)


def test_min_marginals_vs_brute_force():
    for lp in (fixtures.SHORT_MRF_CHAIN, fixtures.TWO_SIMPLEX, fixtures.COVERING):
        ilp, pre, flat = build(lp)
        s = RefSolver(flat, pre.objective_vector())
        costs = {}
        for li in range(flat.nr_layers):
            if flat.layer_var[li] < flat.nr_vars:
                costs[(int(flat.layer_bdd[li]), int(flat.layer_var[li]))] = (
                    s.lo_cost[li],
                    s.hi_cost[li],
                )
        expected = fixtures.brute_force_min_marginals(ilp, pre.collection, costs)
        m0, m1 = s.min_marginals()
        for li in range(flat.nr_layers):
            b, v = int(flat.layer_bdd[li]), int(flat.layer_var[li])
            if v >= flat.nr_vars:
                continue
            e0, e1 = expected[(b, v)]
            assert m0[li] == pytest.approx(e0), (b, v)
            assert m1[li] == pytest.approx(e1), (b, v)


def test_mm_invariants_after_iteration():
    """Collected deferred mms are >= 0 on the respective side and the lower
    bound never decreases (ref: test_bdd_parallel_mma.cpp:19-70)."""
    ilp, pre, flat = build(fixtures.MATCHING_3x3)
    s = RefSolver(flat, pre.objective_vector())
    lb = s.lower_bound_with_deferred()
    for it in range(20):
        s.iteration(0.5)
        new_lb = s.lower_bound_with_deferred()
        assert new_lb >= lb - 1e-9
        lb = new_lb


@pytest.mark.parametrize(
    "lp,expected_opt",
    [
        (fixtures.SHORT_MRF_CHAIN, None),
        (fixtures.MATCHING_3x3, None),
        (fixtures.TWO_SIMPLEX, None),
        (fixtures.COVERING, None),
    ],
)
def test_convergence_to_lp_bound(lp, expected_opt):
    """On these instances the LP relaxation is tight (trees / assignment /
    totally unimodular) so MMA must approach the ILP optimum."""
    ilp, pre, flat = build(lp)
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    s = RefSolver(flat, pre.objective_vector())
    lb = s.iterations(200, omega=0.5)
    assert lb <= opt + 1e-6
    assert lb >= opt - 1e-3, f"lb {lb} vs opt {opt}"


def test_infeasible_lower_bound_diverges():
    ilp, pre, flat = build(fixtures.INFEASIBLE)
    s = RefSolver(flat, pre.objective_vector())
    s.iterations(50, omega=0.5)
    # infinite min-marginal sides force variables across BDDs; the mutually
    # contradictory fixations drive the bound to +inf
    assert s.lower_bound_with_deferred() == math.inf


def test_distribute_delta_preserves_bound():
    ilp, pre, flat = build(fixtures.MATCHING_3x3)
    s = RefSolver(flat, pre.objective_vector())
    for _ in range(5):
        s.iteration(0.5)
    lb_before = s.lower_bound_with_deferred()
    s.distribute_delta()
    assert s.lower_bound() == pytest.approx(lb_before)
    assert np.all(s.def_mm == 0)


def test_dual_feasibility_invariant():
    """Sum of (hi - lo) costs over the layers of a variable stays equal to the
    objective coefficient throughout the iterations (Lagrange multipliers form
    a reparametrization)."""
    ilp, pre, flat = build(fixtures.MATCHING_3x3)
    obj = np.asarray(pre.objective_vector())
    s = RefSolver(flat, obj)
    for _ in range(7):
        s.iteration(0.5)
    s.distribute_delta()
    valid = flat.valid_layer_mask()
    net = np.zeros(flat.nr_vars)
    np.add.at(net, flat.layer_var[valid], (s.hi_cost - s.lo_cost)[valid])
    assert np.allclose(net, obj, atol=1e-9)


def test_bdds_solution_and_decode():
    ilp, pre, flat = build(fixtures.MATCHING_3x3)
    s = RefSolver(flat, pre.objective_vector())
    s.iterations(100, omega=0.5)
    s.distribute_delta()
    sol = s.bdds_solution()
    x = s.solution_per_var(sol)
    # on this instance the relaxation is tight -> per-bdd argmin paths agree
    opt, xopt = fixtures.brute_force_ilp_optimum(ilp)
    assert ilp.evaluate(list(x[: ilp.nr_variables()])) == pytest.approx(opt)


def test_update_costs_shifts_bound():
    ilp, pre, flat = build(fixtures.COVERING)
    s = RefSolver(flat, pre.objective_vector())
    lb0 = s.lower_bound()
    # raising all hi costs by +1 per variable raises opt of each bdd min
    s.update_costs(np.zeros(flat.nr_vars), np.ones(flat.nr_vars))
    lb1 = s.lower_bound()
    assert lb1 >= lb0


def test_densify_roundtrip_costs():
    ilp, pre, flat = build(fixtures.SHORT_MRF_CHAIN)
    dense = densify(flat)
    s = RefSolver(flat, pre.objective_vector())
    packed = dense.pack_costs(s.hi_cost)
    unpacked = dense.unpack_costs(packed, flat.nr_layers)
    valid = flat.valid_layer_mask()
    # terminal layers are not represented in dense; others roundtrip
    assert np.allclose(unpacked[valid], s.hi_cost[valid])
    assert dense.H == flat.nr_hops
