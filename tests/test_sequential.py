"""True sequential (Gauss-Seidel) MMA solver."""
import numpy as np
import pytest

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver.sequential import SequentialSolver
from tests import fixtures


def build(lp):
    ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    return ilp, SequentialSolver(flat, pre.objective_vector()), RefSolver(
        flat, pre.objective_vector()
    )


@pytest.mark.parametrize(
    "lp", [fixtures.SHORT_MRF_CHAIN, fixtures.MATCHING_3x3, fixtures.TWO_SIMPLEX]
)
def test_sequential_monotone_and_converges(lp):
    ilp, s, ref = build(lp)
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    prev = s.lower_bound()
    for it in range(60):
        s.iteration()
        cur = s.lower_bound()
        assert cur >= prev - 1e-9, f"iteration {it}: {cur} < {prev}"
        prev = cur
    assert prev <= opt + 1e-9
    assert prev >= opt - 1e-4


def test_sequential_faster_per_iteration_than_parallel():
    """Gauss-Seidel reaches a tighter bound in few iterations (its selling
    point over the deferred parallel scheme, ICML21 vs CVPR22)."""
    ilp, s, ref = build(fixtures.MATCHING_3x3)
    for _ in range(3):
        s.iteration()
        ref.iteration(0.5)
    assert s.lower_bound() >= ref.lower_bound_with_deferred() - 1e-6


def test_sequential_infeasible():
    ilp, s, ref = build(fixtures.INFEASIBLE)
    for _ in range(30):
        s.iteration()
    assert s.lower_bound() == np.inf
