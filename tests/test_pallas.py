"""Pallas fused sweep kernels vs XLA scan path (interpret mode on CPU).

(analogue of the reference's torch-vs-CUDA parity tests)
"""
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import uniform as uf
from bdd_tpu.utils.problems import grid_mrf
from tests import fixtures


@pytest.fixture(autouse=True)
def _restore_flag():
    old = uf.USE_PALLAS
    os.environ["BDD_TPU_PALLAS_INTERPRET"] = "1"
    yield
    uf.USE_PALLAS = old
    os.environ.pop("BDD_TPU_PALLAS_INTERPRET", None)


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
    return host, state


@pytest.mark.parametrize(
    "lp", [fixtures.MATCHING_3x3, fixtures.TWO_SIMPLEX, fixtures.INFEASIBLE]
)
def test_pallas_iteration_parity(lp):
    host, state = build(lp)
    uf.USE_PALLAS = False
    sA = state
    for _ in range(6):
        sA = uf.iteration(host.geom, sA, 0.5)
    uf.USE_PALLAS = True
    sB = state
    for _ in range(6):
        sB = uf.iteration(host.geom, sB, 0.5)
    for a, b in zip(jax.tree.leaves(sA), jax.tree.leaves(sB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_pallas_grid_mrf_parity():
    ilp = grid_mrf(3, 3, 2, seed=7)
    ilp.normalize()
    host, state = build(ilp=ilp)
    uf.USE_PALLAS = False
    lbA = float(
        uf.lower_bound_with_deferred(
            host.geom, uf.iterations(host.geom, state, 5, 0.5)
        )
    )
    uf.USE_PALLAS = True
    sB = state
    for _ in range(5):
        sB = uf.iteration(host.geom, sB, 0.5)
    uf.USE_PALLAS = False
    lbB = float(uf.lower_bound_with_deferred(host.geom, sB))
    assert lbA == pytest.approx(lbB, abs=1e-9)


def test_pallas_forcing_with_three_bdds():
    """Variable forcing (±inf min-marginals) must survive the Pallas kernels'
    BIG arithmetic even when alpha <= 1/3 (regression: alpha*BIG fell below
    the BIG/2 finiteness threshold and forcing silently stopped propagating
    for variables in >= 3 BDDs)."""
    import os

    os.environ["BDD_TPU_PALLAS_INTERPRET"] = "1"
    try:
        lp = """Minimize
-1 x + y + z + w
Subject To
x + y >= 1
x + z >= 1
x + w >= 1
2 x + y + z >= 4
End"""
        # the last constraint forces x = 1 (y+z <= 2); x sits in 4 BDDs
        ilp = parse_lp_string(lp)
        pre = BddPreprocessor(ilp)
        host = uf.flatten_uniform(
            pre.collection, pre.total_nr_variables(),
            pre.nr_primal_variables, dtype=jnp.float32,
        )
        results = {}
        for use_pallas in (False, True):
            old = uf.USE_PALLAS
            uf.USE_PALLAS = use_pallas
            try:
                state = uf.init_uniform_state(
                    host, pre.objective_vector(), dtype=jnp.float32
                )
                state = uf.iterations(host.geom, state, 30, 0.5)
                results[use_pallas] = float(
                    uf.lower_bound_with_deferred(host.geom, state)
                )
            finally:
                uf.USE_PALLAS = old
        assert results[True] == pytest.approx(results[False], abs=1e-3)
        # and the bound reflects x forced to 1 (cost -1 realized)
        opt, _ = fixtures.brute_force_ilp_optimum(ilp)
        assert results[True] <= opt + 1e-4
    finally:
        os.environ.pop("BDD_TPU_PALLAS_INTERPRET", None)
