"""Smoothed dual-ascent MMA solver (sum-marginal averaging iteration).

Mirrors the reference's smoothed-solver tests
(test/test_bdd_smooth_parallel_mma.cpp): the smoothed bound is monotone
nondecreasing over iterations at fixed temperature, always lower-bounds the
hard bound of the same costs, and the T→0 trajectory reproduces hard MMA.
Plus the JSON-config wiring ("smooth mma" / bare "smoothing" key).
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver.smooth_mma import SmoothSolver
from bdd_tpu.solver.uniform_wrapper import UniformSolver
from tests import fixtures

LPS = [fixtures.TWO_SIMPLEX, fixtures.COVERING, fixtures.MATCHING_3x3]


def build(lp):
    ilp = parse_lp_string(lp)
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    return pre


def make_smooth(pre, **kw):
    kw.setdefault("dtype", jnp.float64)
    kw.setdefault("smoothing_decay", 1.0)  # fixed temperature unless told
    return SmoothSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        **kw,
    )


def _perturb_zero_sum(s, magnitude=1.7):
    """Move the dual point without changing the relaxation: per variable with
    >=2 layers, +magnitude on one layer's hi cost, -magnitude on another's."""
    lv = s.f.layer_var
    valid = s.f.valid_layer_mask()
    dh = np.zeros(lv.shape[0])
    seen_first = {}
    for i in np.nonzero(valid)[0]:
        v = int(lv[i])
        if v not in seen_first:
            seen_first[v] = i
        elif seen_first[v] >= 0:
            dh[seen_first[v]] += magnitude
            dh[i] -= magnitude
            seen_first[v] = -1
    s.update_layer_costs(np.zeros_like(dh), dh)


@pytest.mark.parametrize("lp", LPS)
def test_smooth_bound_ascends_fixed_temperature(lp):
    # near-monotone ascent from a perturbed dual point: the reference's own
    # strict-monotonicity asserts are commented out
    # (test_bdd_smooth_parallel_mma.cpp:30-34) — the relu-based deferred split
    # is the hard-MMA heuristic applied to smoothed marginals, so tiny dips
    # are possible; require bounded dips and overall ascent.
    pre = build(lp)
    s = make_smooth(pre, smoothing=0.5)
    _perturb_zero_sum(s)
    first = prev = s.smooth_bound()
    for it in range(30):
        s.iteration()
        cur = s.smooth_bound()
        assert cur >= prev - 1e-3 * max(1.0, abs(prev)), f"iter {it}: {prev} -> {cur}"
        prev = cur
    shared = len(set(s.f.layer_var[s.f.valid_layer_mask()])) < int(
        np.sum(s.f.valid_layer_mask())
    )
    if shared:  # variables in >1 BDD: the perturbation is recoverable
        assert prev > first + 1e-3


@pytest.mark.parametrize("lp", LPS)
def test_smooth_bound_below_hard_bound(lp):
    pre = build(lp)
    s = make_smooth(pre, smoothing=0.7)
    for _ in range(3):
        s.iteration_block(5)
        assert s.smooth_bound() <= s.lower_bound_with_deferred() + 1e-9


@pytest.mark.parametrize("lp", LPS)
def test_zero_temperature_limit_matches_hard_mma(lp):
    pre = build(lp)
    s = make_smooth(pre, smoothing=1e-6)
    u = UniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    for it in range(15):
        s.iteration()
        u.iteration()
        a = s.lower_bound_with_deferred()
        b = u.lower_bound_with_deferred()
        assert a == pytest.approx(b, abs=1e-6), f"iter {it}"


def test_annealing_reaches_hard_optimum():
    # LP-tight instance: annealed smooth solver must reach the ILP optimum
    pre = build(fixtures.MATCHING_3x3)
    s = make_smooth(
        pre, smoothing=1.0, smoothing_decay=0.5, min_smoothing=1e-4
    )
    for _ in range(12):
        s.iteration_block(10)
    assert s.lower_bound_with_deferred() == pytest.approx(-6.0, abs=1e-3)
    assert s.smoothing <= 1e-3  # annealed down to the floor


def test_random_inequalities_monotone_smooth_bound():
    import random

    from bdd_tpu.ilp.model import ILPInput

    rng = random.Random(7)
    for trial in range(5):
        nr_vars = 6
        ilp = ILPInput()
        for v in range(nr_vars):
            ilp.add_new_variable(f"x_{v}")
        for v, c in enumerate(fixtures.random_costs(rng, nr_vars)):
            ilp.add_to_objective(c, v)
        for _ in range(3):
            c = fixtures.random_inequality(rng, nr_vars)
            ilp.add_constraint(c.coefficients, c.monomials, c.ineq, c.rhs)
        ilp.normalize()
        pre = BddPreprocessor(ilp)
        s = SmoothSolver(
            pre.collection,
            pre.total_nr_variables(),
            pre.objective_vector(),
            nr_primal_vars=pre.nr_primal_variables,
            dtype=jnp.float64,
            smoothing=0.3,
            smoothing_decay=1.0,
        )
        prev = s.smooth_bound()
        for it in range(20):
            s.iteration()
            cur = s.smooth_bound()
            assert cur >= prev - 1e-9, f"trial {trial} iter {it}"
            prev = cur


def test_json_config_smooth_mma():
    from bdd_tpu.api import BddSolver

    solver = BddSolver(
        {
            "relaxation solver": "smooth mma",
            "smoothing": 0.2,
            "smoothing decay factor": 0.5,
            "precision": "double",
            "termination criteria": {"maximum iterations": 150},
        }
    )
    solver.read_ilp(lp_string=fixtures.MATCHING_3x3)
    result = solver.solve(verbose=False)
    assert result["status"] == "solved"
    assert result["lower_bound"] == pytest.approx(-6.0, abs=1e-3)
    assert result["objective"] == pytest.approx(-6.0, abs=1e-6)


def test_bare_smoothing_key_selects_smooth_solver():
    from bdd_tpu.api import BddSolver

    solver = BddSolver({"smoothing": 0.5, "precision": "double"})
    assert solver.config["relaxation solver"] == "smooth mma"


def test_smooth_solver_f32_packed():
    # the f32 path uses packed columns + the permutation exchange
    pre = build(fixtures.COVERING)
    s = make_smooth(pre, smoothing=0.5, dtype=jnp.float32)
    prev = s.smooth_bound()
    for _ in range(10):
        s.iteration()
        cur = s.smooth_bound()
        assert cur >= prev - 1e-4
        prev = cur
    assert s.smooth_bound() <= s.lower_bound_with_deferred() + 1e-4
