"""Randomized end-to-end fuzz: unstructured random 0-1 ILPs through the full
pipeline vs exhaustive enumeration.

Complements test_regression.py (structured families with known oracles) with
adversarially unstructured inputs: random coefficients/senses/rhs, mixed
feasibility. Checks weak duality, rounding feasibility, and bound sanity —
the reference's random-inequality tests (test/test_problem_generator.h:10-62)
scaled up to whole instances.
"""
import itertools

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp.model import ILPInput, Ineq
from bdd_tpu.solver import uniform as uf
from bdd_tpu.solver.rounding import incremental_mm_rounding
from bdd_tpu.solver.uniform_wrapper import UniformSolver


def random_ilp(rng: np.random.Generator, nr_vars: int, nr_cons: int) -> ILPInput:
    ilp = ILPInput()
    for v in range(nr_vars):
        ilp.add_to_objective(float(np.round(rng.uniform(-3, 3), 2)), f"x_{v}")
    for _ in range(nr_cons):
        k = int(rng.integers(2, min(6, nr_vars) + 1))
        vs = rng.choice(nr_vars, size=k, replace=False)
        coeffs = rng.integers(-4, 5, size=k)
        coeffs[coeffs == 0] = 1
        sense = [Ineq.LEQ, Ineq.GEQ, Ineq.EQ][int(rng.integers(0, 3))]
        # pick rhs from an achievable activity so most instances are feasible
        x = rng.integers(0, 2, size=k)
        rhs = int(np.dot(coeffs, x))
        ilp.add_linear_constraint(
            [int(c) for c in coeffs], [int(v) for v in vs], sense, rhs
        )
    return ilp


def brute_force(ilp: ILPInput):
    best, best_x = np.inf, None
    n = ilp.nr_variables()
    for bits in itertools.product((0, 1), repeat=n):
        if ilp.feasible(list(bits)):
            val = ilp.evaluate(list(bits))
            if val < best:
                best, best_x = val, list(bits)
    return best, best_x


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_random_ilp(seed):
    rng = np.random.default_rng(seed)
    nr_vars = int(rng.integers(6, 13))
    nr_cons = int(rng.integers(3, 9))
    ilp = random_ilp(rng, nr_vars, nr_cons)
    opt, opt_x = brute_force(ilp)

    pre = BddPreprocessor(ilp)
    s = UniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    lbs = []
    for _ in range(40):
        s.iteration()
        lbs.append(s.lower_bound_with_deferred())
    if opt is np.inf or opt_x is None:
        # infeasible instance: either detected during construction (reduced
        # away) or the bound must blow up / stay a valid certificate
        assert lbs[-1] >= -1e6
        return
    # weak duality at every iteration, monotone to tolerance
    for lb in lbs:
        assert lb <= opt + 1e-6, (lb, opt)
    assert lbs[-1] >= lbs[0] - 1e-9
    # rounding: any solution found must be feasible with objective >= lb
    sol = incremental_mm_rounding(s, num_itr_lb=20, num_rounding_itr=60,
                                  verbose=False)
    if sol is not None:
        x = [int(v) for v in sol[: ilp.nr_variables()]]
        assert ilp.feasible(x)
        val = ilp.evaluate(x)
        assert val >= lbs[-1] - 1e-6
        assert val >= opt - 1e-9  # can't beat the optimum


@pytest.mark.parametrize("seed", [101, 202])
def test_fuzz_native_vs_python_pipeline(seed):
    """Randomized end-to-end ILPs (incl. nonlinear monomials and equalities)
    through BOTH the native and python pipelines: weak duality, consistent
    infeasibility, and no below-optimal 'solutions'."""
    import copy
    import math
    import random

    from bdd_tpu.api import BddSolver
    from bdd_tpu.ilp.model import ILPInput, Ineq
    from tests.fixtures import brute_force_ilp_optimum

    rng = random.Random(seed)
    for trial in range(6):
        ilp = ILPInput()
        nv = 7
        for v in range(nv):
            ilp.add_to_objective(round(rng.uniform(-3, 3), 2), f"x{v}")
        for _ in range(4):
            k = rng.randint(2, 4)
            vs = sorted(rng.sample(range(nv), k))
            monos = [(v,) for v in vs]
            if rng.random() < 0.2:
                monos[0] = (vs[0], vs[1])
            coeffs = [rng.choice([-2, -1, 1, 2]) for _ in range(k)]
            lo = sum(min(c, 0) for c in coeffs)
            hi = sum(max(c, 0) for c in coeffs)
            r = rng.random()
            ineq = Ineq.EQ if r < 0.25 else (Ineq.LEQ if r < 0.6 else Ineq.GEQ)
            ilp.add_constraint(coeffs, monos, ineq, rng.randint(lo, hi))
        opt, _ = brute_force_ilp_optimum(ilp)
        feasible = math.isfinite(opt)
        for native in (True, False):
            s = BddSolver({
                "relaxation solver": "uniform mma",
                "use native preprocessing": native,
                "termination criteria": {"maximum iterations": 120},
            })
            s.read_ilp(ilp=copy.deepcopy(ilp))
            res = s.solve(verbose=False)
            if not feasible:
                assert "solution" not in res
                continue
            assert res["status"] == "solved", (trial, native)
            assert res["lower_bound"] <= opt + 1e-3, (trial, native)
            if "objective" in res:
                assert res["objective"] >= opt - 1e-6, (trial, native)
