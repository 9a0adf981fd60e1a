"""Heterogeneous host+device consensus solver: parity vs the monolithic
oracle (ref: bdd_multi_parallel_mma_base.cu — the 2-way CPU+GPU consensus,
here native-C++ host + uniform device backend with the delta summed through
an ordered io_callback)."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu import native
from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver.hybrid import HybridSolver, split_bdds
from bdd_tpu.utils.problems import grid_mrf, independent_set
from tests import fixtures

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def make(ilp, hop_threshold=None, force_host_bdds=None, mode="callback"):
    pre = BddPreprocessor(ilp)
    hs = HybridSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
        hop_threshold=hop_threshold,
        force_host_bdds=force_host_bdds,
        mode=mode,
    )
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    return hs, ref


def median_depth(ilp):
    pre = BddPreprocessor(ilp)
    d = sorted(
        len(pre.collection.level_variables(b))
        for b in range(pre.collection.nr_bdds())
    )
    return d[len(d) // 2]


@pytest.mark.parametrize("mode", ["callback", "sync"])
@pytest.mark.parametrize("lp", [fixtures.SHORT_MRF_CHAIN, fixtures.MATCHING_3x3])
def test_hybrid_parity(lp, mode):
    ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    nb = pre.collection.nr_bdds()
    # explicit half/half split: depth-uniform collections (MATCHING_3x3)
    # cannot split by hop threshold
    hs, ref = make(ilp, force_host_bdds=list(range(nb // 2)), mode=mode)
    assert hs.host_bdds and hs.device_bdds, "split must use both solvers"
    for it in range(10):
        hs.iteration_block(1)
        ref.iteration(0.5)
        assert hs.lower_bound_with_deferred() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=1e-9
        ), f"diverged at iteration {it}"
    hs.close()


@pytest.mark.parametrize("mode", ["callback", "sync"])
def test_hybrid_parity_grid_blocks(mode):
    ilp = grid_mrf(3, 3, 2, seed=4)
    ilp.reorder_bfs()
    ilp.normalize()
    hs, ref = make(ilp, hop_threshold=median_depth(ilp), mode=mode)
    assert hs.host_bdds and hs.device_bdds
    hs.iteration_block(25)
    for _ in range(25):
        ref.iteration(0.5)
    assert hs.lower_bound_with_deferred() == pytest.approx(
        ref.lower_bound_with_deferred(), abs=1e-8
    )
    # plain (non-deferred) bound: both sides' root sums, finite and valid
    assert np.isfinite(hs.lower_bound())
    assert hs.lower_bound() <= hs.lower_bound_with_deferred() + 1e-9
    hs.close()


def test_hybrid_degenerate_all_device():
    ilp = parse_lp_string(fixtures.SHORT_MRF_CHAIN)
    hs, ref = make(ilp, hop_threshold=10**6)
    assert not hs.host_bdds and hs.device_bdds
    hs.iteration_block(8)
    for _ in range(8):
        ref.iteration(0.5)
    assert hs.lower_bound_with_deferred() == pytest.approx(
        ref.lower_bound_with_deferred(), abs=1e-9
    )
    hs.close()


def test_hybrid_degenerate_all_host():
    ilp = parse_lp_string(fixtures.SHORT_MRF_CHAIN)
    hs, ref = make(ilp, hop_threshold=0)
    assert hs.host_bdds and not hs.device_bdds
    hs.iteration_block(8)
    for _ in range(8):
        ref.iteration(0.5)
    assert hs.lower_bound_with_deferred() == pytest.approx(
        ref.lower_bound_with_deferred(), abs=1e-9
    )
    hs.close()


def test_hybrid_escalate_to_native_full():
    """to_native_full transfers the joint state so the monolithic f64 solver
    continues the trajectory exactly (same bounds as an all-along-monolithic
    run with the same iteration count)."""
    ilp = grid_mrf(3, 3, 2, seed=1)
    ilp.reorder_bfs()
    ilp.normalize()
    hs, ref = make(ilp, hop_threshold=median_depth(ilp))
    assert hs.host_bdds and hs.device_bdds
    hs.iteration_block(6)
    cs = hs.to_native_full()
    for _ in range(6):
        ref.iteration(0.5)
    assert cs.lower_bound_with_deferred() == pytest.approx(
        ref.lower_bound_with_deferred(), abs=1e-9
    )
    cs.iterations(5, 0.5)
    for _ in range(5):
        ref.iteration(0.5)
    assert cs.lower_bound_with_deferred() == pytest.approx(
        ref.lower_bound_with_deferred(), abs=1e-9
    )
    hs.close()


def test_hybrid_perm_layout_f32():
    """f32 routes the delta through the permutation-exchange concat layout
    (primary region + class blocks) — exercises the row<->variable maps."""
    ilp = grid_mrf(3, 3, 2, seed=2)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    nb = pre.collection.nr_bdds()
    hs = HybridSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
        force_host_bdds=list(range(nb // 3)),
    )
    assert hs.host_bdds and hs.device_bdds
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    hs.iteration_block(20)
    for _ in range(20):
        ref.iteration(0.5)
    assert hs.lower_bound_with_deferred() == pytest.approx(
        ref.lower_bound_with_deferred(), rel=2e-4, abs=2e-4
    )
    hs.close()


def test_hybrid_rounding_end_to_end():
    from bdd_tpu.solver.rounding import incremental_mm_rounding

    ilp = grid_mrf(3, 3, 2, seed=3)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    nb = pre.collection.nr_bdds()
    hs = HybridSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
        force_host_bdds=list(range(nb // 2)),
    )
    hs.iteration_block(30)
    lb = hs.lower_bound_with_deferred()  # before rounding perturbs costs
    sol = incremental_mm_rounding(hs, num_itr_lb=10, verbose=False)
    assert sol is not None
    x = [int(v) for v in sol[: ilp.nr_variables()]]
    assert ilp.feasible(x)
    assert ilp.evaluate(x) >= lb - 1e-6
    hs.close()


def test_hybrid_api_end_to_end():
    """'hybrid mma' through the full BddSolver pipeline (dual + rounding)."""
    from bdd_tpu.api import BddSolver

    s = BddSolver(
        {
            "relaxation solver": "hybrid mma",
            "precision": "double",
            "variable order": "bfs",
            "termination criteria": {"maximum iterations": 300},
        }
    )
    s.read_ilp(lp_string=fixtures.COVERING)
    result = s.solve(verbose=False)
    opt, _ = fixtures.brute_force_ilp_optimum(s.ilp)
    assert result["status"] == "solved"
    assert result["lower_bound"] <= opt + 1e-4
    assert result["objective"] == pytest.approx(opt, abs=1e-6)


def test_split_bdds_auto_threshold():
    ilp = independent_set(40, edge_prob=0.1, seed=0)
    pre = BddPreprocessor(ilp)
    host_b, dev_b, th = split_bdds(pre.collection, min_nodes_per_hop=3)
    assert sorted(host_b + dev_b) == list(range(pre.collection.nr_bdds()))
    for b in host_b:
        assert len(pre.collection.level_variables(b)) > th
    for b in dev_b:
        assert len(pre.collection.level_variables(b)) <= th
