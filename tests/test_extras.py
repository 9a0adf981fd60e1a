"""fix_variable, Wedelin rounding, easy-variable fixing, checkpoints.

(ref: test_bdd_solver_fix_variable.cpp, wedelin_primal_heuristic.hxx,
solve_easy_variables.py, test_bdd_cuda_base_serialization.cpp)
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
from bdd_tpu.solver.extras import (
    fix_variable,
    load_state,
    save_state,
    solve_easy_variables,
    wedelin_rounding,
)
from bdd_tpu.solver.uniform_wrapper import UniformSolver
from tests import fixtures


def build(lp, backend="ref"):
    ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    if backend == "ref":
        s = RefSolver(flat, pre.objective_vector())
    else:
        s = UniformSolver(
            pre.collection,
            pre.total_nr_variables(),
            pre.objective_vector(),
            nr_primal_vars=pre.nr_primal_variables,
            dtype=jnp.float64,
        )
    return ilp, pre, flat, s


@pytest.mark.parametrize("backend", ["ref", "uniform"])
def test_fix_variable(backend):
    ilp, pre, flat, s = build(fixtures.MATCHING_3x3, backend)
    # fixing x_11 = 0 removes the best assignment; new optimum = -5
    v = ilp.get_var_index("x_11")
    fix_variable(s, v, 0)
    for _ in range(200):
        s.iteration()
    red = ilp.reduce([v], [])
    opt, _ = fixtures.brute_force_ilp_optimum(red)
    assert s.lower_bound_with_deferred() == pytest.approx(opt, abs=1e-4)


def test_wedelin_rounding_finds_solution():
    ilp, pre, flat, s = build(fixtures.MATCHING_3x3, "ref")
    for _ in range(50):
        s.iteration()
    sol = wedelin_rounding(s, verbose=False)
    assert sol is not None
    x = list(sol[: ilp.nr_variables()])
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    assert ilp.evaluate(x) == pytest.approx(opt, abs=1e-6)


def test_solve_easy_variables():
    ilp, pre, flat, s = build(fixtures.MATCHING_3x3, "ref")
    for _ in range(200):
        s.iteration()
    fixations, reduced = solve_easy_variables(s, ilp)
    # on this instance the relaxation is tight: everything becomes easy
    assert len(fixations) >= ilp.nr_variables() - 2
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    if reduced.nr_variables() == 0:
        x = [0] * ilp.nr_variables()
        for v, val in fixations.items():
            x[v] = val
        assert ilp.evaluate(x) == pytest.approx(opt)
    else:
        opt_red, xr = fixtures.brute_force_ilp_optimum(reduced)
        assert opt_red + sum(
            ilp.objective_coeff(v) for v, val in fixations.items() if val == 1
        ) == pytest.approx(opt)


@pytest.mark.parametrize("backend", ["ref", "uniform"])
def test_state_checkpoint_roundtrip(tmp_path, backend):
    ilp, pre, flat, s = build(fixtures.TWO_SIMPLEX, backend)
    for _ in range(5):
        s.iteration()
    lb1 = s.lower_bound_with_deferred()
    p = str(tmp_path / "state.pkl")
    save_state(s, p)
    # fresh solver, load state
    _, _, _, s2 = build(fixtures.TWO_SIMPLEX, backend)
    load_state(s2, p)
    assert s2.lower_bound_with_deferred() == pytest.approx(lb1, abs=1e-12)
    # continued iterations agree
    s.iteration()
    s2.iteration()
    assert s2.lower_bound_with_deferred() == pytest.approx(
        s.lower_bound_with_deferred(), abs=1e-12
    )


def test_wedelin_per_layer_on_uniform():
    ilp, pre, flat, s = build(fixtures.MATCHING_3x3, "uniform")
    for _ in range(50):
        s.iteration()
    sol = wedelin_rounding(s, verbose=False)
    assert sol is not None
    x = list(int(v) for v in sol[: ilp.nr_variables()])
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    assert ilp.evaluate(x) == pytest.approx(opt, abs=1e-6)


@pytest.mark.parametrize("backend", ["ref", "uniform"])
def test_lagrange_constraint_matrix(backend):
    from bdd_tpu.solver.extras import lagrange_constraint_matrix

    ilp, pre, flat, s = build(fixtures.TWO_SIMPLEX, backend)
    A = lagrange_constraint_matrix(s)
    assert A.shape[0] == pre.total_nr_variables()
    # every column is one layer: exactly one variable per layer
    assert (np.asarray(A.sum(axis=0)).ravel() == 1).all()
    # row sums = number of dual layers duplicating each variable
    row_sums = np.asarray(A.sum(axis=1)).ravel()
    expected = np.zeros(pre.total_nr_variables())
    col = pre.collection
    for b in range(col.nr_bdds()):
        for v in col.variables(b):
            expected[v] += 1
    assert (row_sums == expected).all()


def test_save_load_state_sharded(tmp_path):
    """Checkpoint/restore works for the mesh-sharded solver too."""
    from jax.sharding import Mesh

    from bdd_tpu.bdd import BddPreprocessor
    from bdd_tpu.solver.extras import load_state, save_state
    from bdd_tpu.solver.uniform_sharded import ShardedUniformSolver

    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    pre = BddPreprocessor(ilp)

    def make():
        mesh = Mesh(np.array(jax.devices()[:2]), ("b",))
        return ShardedUniformSolver(
            pre.collection, pre.total_nr_variables(), pre.objective_vector(),
            mesh=mesh, nr_primal_vars=pre.nr_primal_variables,
            dtype=jnp.float64,
        )

    a = make()
    a.iteration_block(20)
    lb = a.lower_bound()
    save_state(a, str(tmp_path / "ckpt.pkl"))
    b = make()
    load_state(b, str(tmp_path / "ckpt.pkl"))
    assert b.lower_bound() == pytest.approx(lb, abs=1e-12)
    # mismatched template fails fast
    from bdd_tpu.solver.uniform_wrapper import UniformSolver

    other = UniformSolver(
        pre.collection, pre.total_nr_variables(), pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables, dtype=jnp.float64,
    )
    with pytest.raises(ValueError):
        load_state(other, str(tmp_path / "ckpt.pkl"))


def test_get_set_flat_costs_roundtrip():
    """The bdd_mp-style cost accessors (ref get/set_solver_costs,
    bdd_cuda_learned_mma_py.cu:557-573) round-trip the dual state."""
    from bdd_tpu.bdd import BddPreprocessor
    from bdd_tpu.solver.flatten import flatten_collection
    from bdd_tpu.solver.wrapper import JaxSolver

    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    s = JaxSolver(flat, pre.objective_vector(), dtype=jnp.float64)
    s.iteration_block(10)
    lb = s.lower_bound_with_deferred()
    lo, hi, dm = s.get_flat_costs()
    s2 = JaxSolver(flat, pre.objective_vector(), dtype=jnp.float64)
    s2.set_flat_costs(lo, hi, dm)
    assert s2.lower_bound_with_deferred() == pytest.approx(lb, abs=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_exact_min_via_meld_matches_brute_force(seed):
    """Full-meld exact solve (the Gurobi-substitute hook): optimum and
    assignment must match brute force on random small ILPs."""
    from bdd_tpu.solver.extras import exact_min_via_meld

    rng = np.random.RandomState(seed)
    from bdd_tpu.ilp.model import ILPInput, Ineq

    ilp = ILPInput()
    nv = 9
    for v in range(nv):
        ilp.add_to_objective(float(rng.randn()), f"x_{v}")
    for _ in range(5):
        k = int(rng.randint(2, 5))
        vs = sorted(rng.choice(nv, size=k, replace=False).tolist())
        coeffs = rng.randint(-3, 4, size=k).tolist()
        if all(c == 0 for c in coeffs):
            coeffs[0] = 1
        ineq = [Ineq.LEQ, Ineq.GEQ, Ineq.EQ][rng.randint(3)]
        lo = sum(min(c, 0) for c in coeffs)
        hi = sum(max(c, 0) for c in coeffs)
        rhs = int(rng.randint(lo, hi + 1))
        ilp.add_linear_constraint(
            coeffs, [ilp.get_var_index(f"x_{v}") for v in vs], ineq, rhs
        )
    ilp.normalize()
    try:
        pre = BddPreprocessor(ilp)
    except Exception:
        pytest.skip("infeasible random instance")
    bf_opt, bf_x = fixtures.brute_force_ilp_optimum(ilp)
    try:
        res = exact_min_via_meld(pre.collection, pre.objective_vector())
    except ValueError:
        assert bf_x is None  # jointly infeasible model
        return
    assert res is not None
    opt, x = res
    assert opt == pytest.approx(bf_opt, abs=1e-9)
    assert ilp.feasible([int(v) for v in x[: ilp.nr_variables()]])
    assert ilp.evaluate([int(v) for v in x[: ilp.nr_variables()]]) == (
        pytest.approx(bf_opt, abs=1e-9)
    )


def test_exact_min_via_meld_infeasible_and_caps():
    """Infeasible models raise; a tiny node cap returns None instead of
    hanging."""
    from bdd_tpu.ilp import parse_lp_string
    from bdd_tpu.solver.extras import exact_min_via_meld
    from bdd_tpu.utils.problems import set_cover

    ilp = set_cover(18, 30, density=0.25, seed=5)
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    assert exact_min_via_meld(
        pre.collection, pre.objective_vector(), max_nodes=5
    ) is None
    bad = parse_lp_string(
        "Minimize\nx + y\nSubject To\nc1: x + y >= 2\nc2: x + y <= 0\n"
        "Binaries\nx y\nEnd\n"
    )
    pre2 = BddPreprocessor(bad)
    with pytest.raises(ValueError):
        exact_min_via_meld(pre2.collection, pre2.objective_vector())
