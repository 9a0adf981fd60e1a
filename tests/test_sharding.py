"""Sharded (multi-device) MMA vs single-device parity on the virtual CPU mesh.

The delta-psum consensus must reproduce the single-device iteration exactly:
with isotropic alpha, summing local per-variable deltas and dividing by the
global BDD count is algebraically identical to the unsharded computation.
(ref analogue: test_hybrid_parallel_mma_base.cu)
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.sharding import Mesh

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver.sharding import ShardedSolver, partition_bdds
from tests import fixtures


def make(lp, n_dev):
    ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    return ilp, s, ref


def test_partition_balanced():
    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    pre = BddPreprocessor(ilp)
    parts = partition_bdds(pre.collection, 3)
    assert len(parts) == 3
    assert all(len(p) >= 1 for p in parts)
    assert sorted(b for p in parts for b in p) == list(range(6))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize(
    "lp", [fixtures.SHORT_MRF_CHAIN, fixtures.MATCHING_3x3, fixtures.TWO_SIMPLEX]
)
def test_sharded_parity_with_ref(lp, n_dev):
    ilp, s, ref = make(lp, n_dev)
    for _ in range(15):
        ref.iteration(0.5)
    s.iteration_block(15)
    lb_ref = ref.lower_bound_with_deferred()
    assert s.lower_bound() == pytest.approx(lb_ref, abs=1e-9)


def test_sharded_more_devices_than_bdds():
    # COVERING has a single constraint -> 1 BDD on 8 devices (7 dummies)
    ilp, s, ref = make(fixtures.COVERING, 8)
    for _ in range(20):
        ref.iteration(0.5)
    s.iteration_block(20)
    assert s.lower_bound() == pytest.approx(ref.lower_bound_with_deferred(), abs=1e-9)


def test_sharded_convergence():
    ilp, s, ref = make(fixtures.MATCHING_3x3, 4)
    s.iteration_block(200)
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    assert s.lower_bound() == pytest.approx(opt, abs=1e-6)


def test_custom_mesh_axis_name():
    """Sharded solvers accept any 1-D mesh axis name (regression: 'b' was
    hard-coded into the partition specs)."""
    from jax.sharding import Mesh

    from bdd_tpu.bdd import BddPreprocessor
    from bdd_tpu.solver.uniform_sharded import ShardedUniformSolver

    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    s = ShardedUniformSolver(
        pre.collection, pre.total_nr_variables(), pre.objective_vector(),
        mesh=mesh, nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    s.iteration_block(10)
    assert np.isfinite(s.lower_bound())
