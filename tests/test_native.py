"""Native (C++) host preprocessing vs Python pipeline parity.

Exact node-for-node parity is not required (both produce canonical reduced
QBDDs, but internal orderings may differ); the oracle is semantic: identical
BDD semantics (exhaustive evaluation), identical per-iteration lower-bound
sequences, and identical bucket shape multisets.
"""
import math
import random

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.native import NativeHost, NativeUnsupported, available
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver import uniform as uf
from bdd_tpu.utils.problems import grid_mrf
from tests import fixtures

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")

FIXTURE_LPS = [
    fixtures.SHORT_MRF_CHAIN,
    fixtures.TWO_SIMPLEX,
    fixtures.COVERING,
    fixtures.MATCHING_3x3,
]


def python_pipeline(lp, order="input"):
    ilp = parse_lp_string(lp)
    if order == "bfs":
        ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    return ilp, pre


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_parse_parity(lp):
    nh = NativeHost(lp)
    ilp, pre = python_pipeline(lp)
    assert nh.nr_vars() == ilp.nr_variables()
    names = nh.var_names()
    obj = nh.objective()
    for i, name in enumerate(names):
        assert ilp.var_exists(name)
        assert obj[i] == pytest.approx(ilp.objective_coeff(ilp.get_var_index(name)))


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_bdd_semantics_parity(lp):
    """Native BDDs accept exactly the constraint solutions."""
    nh = NativeHost(lp)
    col = nh.collection()
    ilp, pre = python_pipeline(lp)
    # native var order == input order here
    for b in range(col.nr_bdds()):
        support = col.variables(b)
        # find the python constraint with the same support
        target = None
        for c in ilp.constraints():
            if sorted(v[0] for v in c.monomials) == support:
                target = c
                break
        assert target is not None, f"no constraint with support {support}"
        for bits in range(2 ** len(support)):
            full = [0] * (max(support) + 1)
            for i, v in enumerate(support):
                full[v] = (bits >> i) & 1
            assert col.evaluate(b, full) == target.evaluate(full)


@pytest.mark.parametrize("order", ["input", "bfs"])
@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_lower_bound_sequence_parity(lp, order):
    nh = NativeHost(lp, order)
    host = nh.make_uniform_host(dtype=jnp.float64)
    state = uf.init_uniform_state(host, nh.objective(), dtype=jnp.float64)

    ilp, pre = python_pipeline(lp, order)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())

    for it in range(12):
        state = uf.iterations(host.geom, state, 1, 0.5)
        ref.iteration(0.5)
        lb_n = float(uf.lower_bound_with_deferred(host.geom, state))
        lb_p = ref.lower_bound_with_deferred()
        assert lb_n == pytest.approx(lb_p, abs=1e-8), f"{order} iter {it}"


def test_bucket_shapes_match_python():
    ilp = grid_mrf(4, 4, 3, seed=0)
    lp = ilp.write_lp()
    nh = NativeHost(lp, "bfs")
    raw_shapes = sorted(
        (a["H"], a["P"], a["nB"])
        for a in (nh.bucket_arrays(k) for k in range(nh.nr_buckets()))
    )
    ilp2 = parse_lp_string(lp)
    ilp2.reorder_bfs()
    ilp2.normalize()
    pre = BddPreprocessor(ilp2)
    host = uf.flatten_uniform(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables,
        pack=False,  # compare against the raw (unpacked) native buckets
    )
    py_shapes = sorted(
        (g.H, g.P, int(np.sum(np.asarray(b) >= 0)))
        for g, b in zip(host.geom.buckets, host.bdd_of_col)
    )
    assert raw_shapes == py_shapes


def test_native_grid_mrf_convergence_matches_python():
    ilp = grid_mrf(3, 3, 2, seed=1)
    lp = ilp.write_lp()
    nh = NativeHost(lp, "bfs")
    host = nh.make_uniform_host(dtype=jnp.float64)
    state = uf.init_uniform_state(host, nh.objective(), dtype=jnp.float64)
    state = uf.iterations(host.geom, state, 100, 0.5)
    lb_native = float(uf.lower_bound_with_deferred(host.geom, state))

    ilp2 = parse_lp_string(lp)
    ilp2.reorder_bfs()
    ilp2.normalize()
    pre = BddPreprocessor(ilp2)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for _ in range(100):
        ref.iteration(0.5)
    assert lb_native == pytest.approx(ref.lower_bound_with_deferred(), abs=1e-7)


def test_native_unsupported_fallback():
    # fractional constraint coefficients stay on the python (exact) pipeline
    with pytest.raises(NativeUnsupported):
        NativeHost(
            """Minimize
x + y
Subject To
0.5 x + y <= 1
End"""
        )


def test_native_nonlinear_and_coalesce_parity():
    """Native Fortet linearization + coalesce melding reproduce the python
    pipeline (counts and per-iteration bounds)."""
    from bdd_tpu.utils.problems import quadratic_assignment

    qap = quadratic_assignment(4, seed=5)
    coal = """Minimize
x + y + z
Subject To
c1: x + y >= 1
c2: y + z >= 1
c3: x + z >= 1
Coalesce
c1 c2
End"""
    for lp in [qap.write_lp(), coal]:
        ilp = parse_lp_string(lp)
        ilp.normalize()
        pre = BddPreprocessor(ilp)
        flat = flatten_collection(
            pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
        )
        ref = RefSolver(flat, pre.objective_vector())
        nh = NativeHost(lp)
        assert nh.nr_bdds() == pre.collection.nr_bdds()
        assert nh.nr_vars() == pre.total_nr_variables()
        host = nh.make_uniform_host(dtype=jnp.float64)
        state = uf.init_uniform_state(host, nh.objective(), dtype=jnp.float64)
        for it in range(12):
            state = uf.iterations(host.geom, state, 1, 0.5)
            ref.iteration(0.5)
            a = float(uf.lower_bound_with_deferred(host.geom, state))
            b = ref.lower_bound_with_deferred()
            assert a == pytest.approx(b, abs=1e-8), f"iter {it}"


def test_native_bounds_fixations():
    nh = NativeHost(
        """Minimize
x + 2 y + 4 z
Subject To
x + y + z >= 1
Bounds
y = 1
z <= 0
End"""
    )
    assert nh.nr_vars() == 1
    assert nh.constant() == pytest.approx(2.0)


def test_native_infeasible():
    nh = NativeHost(
        """Minimize
x
Subject To
x + x >= 3
End"""
    )
    assert nh.infeasible


def test_native_declines_fractional_constants_and_bounds():
    """Fractional additive constants and non-binary Bounds must make the
    native parser decline (python fallback) instead of silently rounding
    (regression: 'x - 0.5 <= 0' was llround-ed to a DIFFERENT model)."""
    from bdd_tpu.native import NativeHost, NativeUnsupported

    for lp in (
        "Minimize\n-1 x\nSubject To\nx - 0.5 <= 0\nEnd",
        "Minimize\nx + y\nSubject To\nx + y >= 1\nBounds\nx = 0.5\nEnd",
        "Minimize\nx + y\nSubject To\nx + y >= 1\nBounds\n0.5 <= x\nEnd",
        "Minimize\nx + y\nSubject To\nx + y >= 1\nBounds\nx <= 0.5\nEnd",
    ):
        with pytest.raises(Exception):
            NativeHost(lp, "input")


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_cpu_solver_parity_vs_oracle(lp):
    """The native OpenMP parallel-MMA baseline reproduces the numpy oracle's
    per-iteration bounds (semantics of bdd_parallel_mma_base.cpp:815-1044)."""
    nh = NativeHost(lp)
    cs = nh.cpu_solver()
    ilp, pre = python_pipeline(lp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(30):
        cs.iterations(1, 0.5)
        ref.iteration(0.5)
        a = cs.lower_bound_with_deferred()
        b = ref.lower_bound_with_deferred()
        assert a == pytest.approx(b, abs=1e-9), f"iter {it}"
    assert cs.lower_bound() == pytest.approx(ref.lower_bound(), abs=1e-9)


def test_cpu_solver_from_collection_nonlinear():
    """The collection loader covers python-preprocessed instances (nonlinear
    monomials) that the native parser declines."""
    from bdd_tpu import native
    from bdd_tpu.utils.problems import quadratic_assignment

    ilp = quadratic_assignment(4, seed=3)
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    cs = native.cpu_solver_from_collection(
        pre.collection, pre.total_nr_variables(), pre.objective_vector()
    )
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(10):
        cs.iterations(1, 0.5)
        ref.iteration(0.5)
        a = cs.lower_bound_with_deferred()
        b = ref.lower_bound_with_deferred()
        assert a == pytest.approx(b, abs=1e-8), f"iter {it}"


@pytest.mark.parametrize("order,method", [
    ("bfs", "reorder_bfs"),
    ("cuthill", "reorder_cuthill_mckee"),
    ("minimum degree", "reorder_minimum_degree"),
])
def test_ordering_parity_native_vs_python(order, method):
    """All native ordering modes produce the exact python permutation
    (cuthill uses pseudo-peripheral starts per the reference,
    include/cuthill-mckee.h:29 + pseudo_peripheral_node.hxx)."""
    from bdd_tpu.utils.problems import set_cover

    ilp = grid_mrf(5, 5, 3, seed=3)
    lp = ilp.write_lp()
    p = parse_lp_string(lp)
    getattr(p, method)()
    nh = NativeHost(lp, order)
    assert nh.var_names() == p.var_names

    ilp2 = set_cover(30, 60, seed=4)
    lp2 = ilp2.write_lp()
    p2 = parse_lp_string(lp2)
    getattr(p2, method)()
    nh2 = NativeHost(lp2, order)
    assert nh2.var_names() == p2.var_names


@pytest.mark.skipif(not available(), reason="native toolchain unavailable")
def test_f32_to_f64_escalation_transfer():
    """transfer_costs_to_native: run the uniform f32 backend, warm-start the
    native f64 CpuSolver from its state, and (a) the f64-evaluated bound of
    the transferred duals matches the f32 bound to f32 tolerance, (b) f64
    iterations from the warm start keep ascending (MMA monotonicity) and at
    least reach the cold-start bound trajectory."""
    from bdd_tpu.native import cpu_solver_from_collection
    from bdd_tpu.solver.extras import transfer_costs_to_native

    ilp = grid_mrf(6, 6, 3, seed=2)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    V = pre.total_nr_variables()
    obj = pre.objective_vector()
    host = uf.flatten_uniform(pre.collection, V, pre.nr_primal_variables)
    state = uf.init_uniform_state(host, obj)
    state = uf.iterations(host.geom, state, 60, 0.5)
    lb_f32 = float(uf.lower_bound_with_deferred(host.geom, state))

    cs = cpu_solver_from_collection(pre.collection, V, obj)
    transfer_costs_to_native(host, state, cs)
    lb_warm = cs.lower_bound_with_deferred()
    assert lb_warm == pytest.approx(lb_f32, abs=5e-3)

    # escalation: f64 iterations from the warm start ascend monotonically
    prev = lb_warm
    for _ in range(5):
        cs.iterations(20, 0.5)
        cur = cs.lower_bound_with_deferred()
        assert cur >= prev - 1e-9
        prev = cur
    # and the warm-started solver is ahead of a cold solver at equal budget
    cold = cpu_solver_from_collection(pre.collection, V, obj)
    cold.iterations(100, 0.5)
    assert prev >= cold.lower_bound_with_deferred() - 1e-6
