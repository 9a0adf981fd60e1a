"""Uniform bucketed backend vs numpy oracle parity + convergence."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver import uniform as uf
from bdd_tpu.solver.uniform_wrapper import UniformSolver
from bdd_tpu.solver.rounding import incremental_mm_rounding
from bdd_tpu.utils.problems import grid_mrf
from tests import fixtures

FIXTURE_LPS = [
    fixtures.SHORT_MRF_CHAIN,
    fixtures.TWO_SIMPLEX,
    fixtures.COVERING,
    fixtures.MATCHING_3x3,
]


def build(lp=None, ilp=None):
    if ilp is None:
        ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    s = UniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    return ilp, pre, s, ref


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_initial_lower_bound_parity(lp):
    ilp, pre, s, ref = build(lp)
    assert s.lower_bound() == pytest.approx(ref.lower_bound(), abs=1e-9)


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_iteration_parity(lp):
    ilp, pre, s, ref = build(lp)
    for it in range(15):
        s.iteration()
        ref.iteration(0.5)
        assert s.lower_bound_with_deferred() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=1e-8
        ), f"iter {it}"


@pytest.mark.parametrize("lp", FIXTURE_LPS)
def test_min_marginals_parity(lp):
    """Per-variable aggregated mm statistics must match the oracle (layer
    indexing differs between backends, variable grouping is canonical)."""
    ilp, pre, s, ref = build(lp)
    for _ in range(3):
        s.iteration()
        ref.iteration(0.5)
    s.distribute_delta()
    ref.distribute_delta()
    m0u, m1u = s.min_marginals()
    m0r, m1r = ref.min_marginals()

    def agg(view, m0, m1):
        valid = view.valid_layer_mask()
        v = view.layer_var[valid]
        V = view.nr_vars if hasattr(view, "nr_vars") else view.nr_vars
        lo_min = np.full(V, np.inf)
        hi_min = np.full(V, np.inf)
        lo_sum = np.zeros(V)
        np.minimum.at(lo_min, v, m0[valid])
        np.minimum.at(hi_min, v, m1[valid])
        with np.errstate(invalid="ignore"):
            d = np.where(np.isfinite(m1[valid] - m0[valid]), m1[valid] - m0[valid], 0)
        np.add.at(lo_sum, v, d)
        return lo_min, hi_min, lo_sum

    a_u = agg(s.f, m0u, m1u)
    a_r = agg(ref.f, m0r, m1r)
    for x, y in zip(a_u, a_r):
        fin = np.isfinite(x) & np.isfinite(y)
        assert np.allclose(x[fin], y[fin], atol=1e-8)
        assert np.array_equal(np.isfinite(x), np.isfinite(y))


def test_uniform_convergence_and_rounding():
    ilp, pre, s, ref = build(fixtures.MATCHING_3x3)
    s.iteration_block(200)
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    assert s.lower_bound_with_deferred() == pytest.approx(opt, abs=1e-6)
    sol = incremental_mm_rounding(s, verbose=False)
    assert sol is not None
    assert ilp.evaluate(list(sol[: ilp.nr_variables()])) == pytest.approx(opt)


def test_uniform_grid_mrf_matches_ref():
    ilp = grid_mrf(3, 3, 3, seed=2)
    ilp.reorder_bfs()
    ilp.normalize()
    _, pre, s, ref = build(ilp=ilp)
    s.iteration_block(30)
    for _ in range(30):
        ref.iteration(0.5)
    assert s.lower_bound_with_deferred() == pytest.approx(
        ref.lower_bound_with_deferred(), abs=1e-7
    )


def test_uniform_infeasible():
    ilp, pre, s, ref = build(fixtures.INFEASIBLE)
    s.iteration_block(50)
    assert s.lower_bound_with_deferred() == np.inf


def test_device_rounding_matches_host_rounding():
    from bdd_tpu.solver.rounding import incremental_mm_rounding
    from bdd_tpu.solver.rounding_device import incremental_mm_rounding_device

    ilp, pre, s, ref = build(fixtures.MATCHING_3x3)
    s.iteration_block(200)
    sol_dev = incremental_mm_rounding_device(s, verbose=False)
    assert sol_dev is not None
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    x = [int(v) for v in sol_dev[: ilp.nr_variables()]]
    assert ilp.evaluate(x) == pytest.approx(opt)

    _, _, s2, _ = build(fixtures.MATCHING_3x3)
    s2.iteration_block(200)
    sol_host = incremental_mm_rounding(s2, verbose=False)
    x2 = [int(v) for v in sol_host[: ilp.nr_variables()]]
    assert ilp.evaluate(x2) == pytest.approx(opt)


def test_device_rounding_perturbation_progress():
    """On an instance with ties, device rounding must perturb and still land
    on a feasible solution."""
    from bdd_tpu.solver.rounding_device import incremental_mm_rounding_device

    ilp, pre, s, ref = build(fixtures.TWO_SIMPLEX)
    s.iteration_block(100)
    sol = incremental_mm_rounding_device(s, verbose=False)
    assert sol is not None
    x = [int(v) for v in sol[: ilp.nr_variables()]]
    assert ilp.feasible(x)


def test_perm_exchange_matches_segment_exchange():
    """The static-permutation (sort-based) exchange must agree with the
    segment_sum + gather path at every valid slot, including ±inf forcing
    values, and produce identical iteration trajectories (float32 path)."""
    from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp
    from bdd_tpu.utils.problems import graph_matching, set_cover

    # the GM instance has a heavy-tailed count distribution (max ~25 BDDs
    # per variable at C=2) producing SIX ladder class blocks (W = 2,3,4,6,
    # 8,12) — it exercises the dense class-fold path end to end
    gm = construct_graph_matching_ilp(
        graph_matching(12, 12, seed=3, candidates=4, nr_quadratic=80)
    )[0]
    for ilp in [parse_lp_string(fixtures.COVERING), grid_mrf(4, 4, 3, seed=0),
                set_cover(30, 60, seed=1), gm]:
        pre = BddPreprocessor(ilp)

        def make(build_plan):
            host = uf.flatten_uniform(
                pre.collection,
                pre.total_nr_variables(),
                pre.nr_primal_variables,
                build_plan=build_plan,
            )
            return host, uf.init_uniform_state(host, pre.objective_vector())

        host_a, st_a = make(False)
        host_b, st_b = make(True)
        assert host_b.geom.exchange is not None
        if ilp is gm:
            assert len(host_b.geom.exchange.classes) >= 3
        st_a = uf.iterations(host_a.geom, st_a, 3, 0.5)
        st_b = uf.iterations(host_b.geom, st_b, 3, 0.5)

        # inject forcing infs and compare the exchanged deltas slot-by-slot
        mm = list(st_a.def_mm)
        mm[0] = mm[0].at[0, 0].set(jnp.inf)
        if mm[0].shape[0] > 1:
            mm[0] = mm[0].at[1, 0].set(-jnp.inf)
        mm = tuple(jnp.asarray(m, jnp.float32) for m in mm)
        a_lo, a_hi = uf.exchange_delta(host_a.geom, mm)
        b_lo, b_hi = uf.exchange_delta(host_b.geom, mm)
        for g, al, bl, ah, bh in zip(host_b.geom.buckets, a_lo, b_lo, a_hi, b_hi):
            # extended columns change the f32 summation association ->
            # last-bit differences; ±inf forcing values must match exactly
            m = np.asarray(g.layer_valid)
            np.testing.assert_allclose(
                np.asarray(al)[m], np.asarray(bl)[m], rtol=1e-6, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(ah)[m], np.asarray(bh)[m], rtol=1e-6, atol=1e-6
            )
            inf_a = ~np.isfinite(np.asarray(ah)[m])
            np.testing.assert_array_equal(inf_a, ~np.isfinite(np.asarray(bh)[m]))

        lb_a = float(uf.lower_bound_with_deferred(host_a.geom, st_a))
        lb_b = float(uf.lower_bound_with_deferred(host_b.geom, st_b))
        assert lb_b == pytest.approx(lb_a, abs=1e-4)


def test_perm_exchange_f64_opt_in(monkeypatch):
    """BDD_TPU_PERM_EXCHANGE_F64 routes float64 through the permutation
    exchange; bounds agree with the default (bit-parity) segment path to
    reassociation-level tolerance."""
    from bdd_tpu.bdd import BddPreprocessor
    from bdd_tpu.utils.problems import set_cover

    ilp = set_cover(20, 40, seed=5)
    pre = BddPreprocessor(ilp)
    host = uf.flatten_uniform(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    state0 = uf.init_uniform_state(host, pre.objective_vector(), dtype=jnp.float64)
    out_seg = uf.iterations(host.geom, state0, 30, 0.5)
    lb_seg = float(uf.lower_bound_with_deferred(host.geom, out_seg))
    monkeypatch.setattr(uf, "_PERM_EXCHANGE_F64", True)
    uf.iterations._clear_cache()
    try:
        out_perm = uf.iterations(host.geom, state0, 30, 0.5)
        lb_perm = float(uf.lower_bound_with_deferred(host.geom, out_perm))
    finally:
        uf.iterations._clear_cache()
    assert lb_perm == pytest.approx(lb_seg, rel=1e-12, abs=1e-10)


def test_dense_window_two_pointer():
    """uf._dense_window: smallest contiguous id range covering >=(1-eps) of
    occurrences, exact against a brute-force scan."""
    rng = np.random.RandomState(7)
    for _ in range(30):
        V = rng.randint(10, 60)
        rv = rng.randint(0, V, size=rng.randint(1, 200))
        for eps in (0.0, 0.05, 0.2):
            lo, hi = uf._dense_window(rv, eps)
            need = int(np.ceil((1.0 - eps) * rv.size))
            assert ((rv >= lo) & (rv < hi)).sum() >= need
            # brute force: no strictly narrower window covers `need`
            u = np.unique(rv)
            best = None
            for i in range(u.size):
                for j in range(i, u.size):
                    if ((rv >= u[i]) & (rv <= u[j])).sum() >= need:
                        w = int(u[j]) + 1 - int(u[i])
                        best = w if best is None else min(best, w)
                        break
            assert hi - lo == best
