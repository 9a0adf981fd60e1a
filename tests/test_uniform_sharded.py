"""Sharded uniform backend parity on the virtual CPU mesh."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.sharding import Mesh

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import RefSolver, flatten_collection
from bdd_tpu.solver.uniform_sharded import ShardedUniformSolver
from bdd_tpu.utils.problems import grid_mrf
from tests import fixtures


def make(lp=None, ilp=None, n_dev=4):
    if ilp is None:
        ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedUniformSolver(
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


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("lp", [fixtures.SHORT_MRF_CHAIN, fixtures.MATCHING_3x3])
def test_sharded_uniform_parity(lp, n_dev):
    ilp, s, ref = make(lp, n_dev=n_dev)
    s.iteration_block(12)
    for _ in range(12):
        ref.iteration(0.5)
    assert s.lower_bound() == pytest.approx(ref.lower_bound_with_deferred(), abs=1e-9)


def test_sharded_uniform_grid():
    ilp = grid_mrf(3, 3, 2, seed=4)
    ilp.reorder_bfs()
    ilp.normalize()
    _, s, ref = make(ilp=ilp, n_dev=8)
    s.iteration_block(40)
    for _ in range(40):
        ref.iteration(0.5)
    assert s.lower_bound() == pytest.approx(ref.lower_bound_with_deferred(), abs=1e-8)


def test_sharded_uniform_more_devices_than_bdds():
    ilp, s, ref = make(fixtures.COVERING, n_dev=8)
    s.iteration_block(10)
    for _ in range(10):
        ref.iteration(0.5)
    assert s.lower_bound() == pytest.approx(ref.lower_bound_with_deferred(), abs=1e-9)


def test_sharded_rounding_end_to_end():
    """Full pipeline on the sharded solver: dual solve + incremental rounding."""
    from bdd_tpu.solver.rounding import incremental_mm_rounding
    from bdd_tpu.solver.run import run_solver

    ilp, s, ref = make(fixtures.MATCHING_3x3, n_dev=4)
    run_solver(s, max_iter=300, verbose=False, block_size=25)
    sol = incremental_mm_rounding(s, verbose=False)
    assert sol is not None
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    assert ilp.evaluate(list(sol[: ilp.nr_variables()])) == pytest.approx(opt)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_perm_exchange_parity(n_dev):
    """float32 sharded path uses the static-permutation exchange (per-shard
    plans with global shapes); trajectories must match the f64 oracle to
    float32 tolerance."""
    ilp = grid_mrf(4, 4, 3, seed=3)
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedUniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
    )
    # plans attached on every shard
    assert s.geom_stacked.exchange is not None
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(10):
        s.iteration()
        ref.iteration(0.5)
        assert s.lower_bound() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=2e-3
        ), f"iter {it}"


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_class_block_exchange_parity(n_dev):
    """Heavy-tailed instances (graph matching: some variables in ~25 BDDs)
    now get GLOBAL class-block plans on the sharded path — the old
    force_C=global-cmax plan blew the sort volume and silently fell back to
    segment ops. Plans must exist, agree in geometry across shards, and the
    trajectory must match the f64 oracle."""
    from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp
    from bdd_tpu.utils.problems import graph_matching

    ilp = construct_graph_matching_ilp(
        graph_matching(12, 12, seed=3, candidates=4, nr_quadratic=80)
    )[0]
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedUniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
    )
    plan = s.geom_stacked.exchange
    assert plan is not None
    assert len(plan.classes) >= 3  # the skewed tail produced class blocks
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(8):
        s.iteration()
        ref.iteration(0.5)
        assert s.lower_bound() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=2e-3
        ), f"iter {it}"


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_column_packing_parity(n_dev):
    """f32 sharded shards pack their columns with globally-pooled caps
    (uniform.choose_pack_caps), so the per-shard buckets still stack on the
    device axis; bounds must match the unpacked sharded path and packing must
    actually reduce the serial step count."""
    from bdd_tpu.utils.problems import set_cover

    ilp = set_cover(40, 80, seed=11)
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))

    def build(pack):
        return ShardedUniformSolver(
            pre.collection,
            pre.total_nr_variables(),
            pre.objective_vector(),
            mesh=mesh,
            nr_primal_vars=pre.nr_primal_variables,
            dtype=jnp.float32,
            pack=pack,
        )

    sp, su = build(True), build(False)
    g0 = jax.tree.map(lambda x: x[0], sp.geom_stacked)
    assert all(g.root_mask is not None for g in g0.buckets)
    gu = jax.tree.map(lambda x: x[0], su.geom_stacked)
    steps = lambda geom: sum(int(g.node_valid.shape[0]) for g in geom.buckets)
    assert steps(g0) <= steps(gu)
    for it in range(6):
        sp.iteration()
        su.iteration()
        assert sp.lower_bound() == pytest.approx(
            su.lower_bound(), abs=2e-4
        ), f"iter {it}"


@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_windowed_exchange_parity(n_dev):
    """Windowed per-shard plans (uf.build_windowed_plans): each shard sorts
    only within its variable window, class totals merge via the static
    scatter-add, and the psum rides the placed [2, Vg] vector. Must (a)
    actually activate (Vg > 0) on an instance with variable locality and
    (b) reproduce the f64 oracle trajectory to f32 tolerance. (Pinned via
    plan_family: the auto policy now prefers split plans, which measure a
    smaller sort volume — windowed stays available as the fallback when a
    shard's split plan degenerates.)"""
    ilp = grid_mrf(8, 8, 3, seed=3)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedUniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
        plan_family="windowed",
    )
    plan = s.geom_stacked.exchange
    assert plan is not None and plan.Vg > 0  # the windowed path is active
    assert plan.window_lo.shape == (n_dev,)  # per-shard offsets stacked
    assert len(set(np.asarray(plan.window_lo).tolist())) > 1
    # the TWO-REGION refinement must be active on this instance: a few
    # long-range rows fall outside the eps-window and route through the
    # compacted stretcher region (scatter-add into the psum vector). If a
    # plan change silently stops producing stretch regions, every two-region
    # merge path in _exchange_perm goes untested — fail loudly instead.
    assert plan.stretch_globals is not None
    assert plan.stretch_base > 0
    assert int(plan.stretch_globals.shape[0]) > 0
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(10):
        s.iteration()
        ref.iteration(0.5)
        assert s.lower_bound() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=2e-3
        ), f"iter {it}"
    # distribute + per-shard lower bound agree too (uses the same exchange)
    assert s.lower_bound() == pytest.approx(
        ref.lower_bound_with_deferred(), abs=2e-3
    )


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_split_exchange_parity(n_dev):
    """SPLIT per-shard plans (uf.build_split_plans): private variables skip
    the consensus entirely, the psum rides only the compacted shared region.
    Must (a) be the auto-selected family on a grid (smallest sort volume),
    (b) have a small shared region (only the partition boundaries), and
    (c) reproduce the f64 oracle trajectory to f32 tolerance."""
    ilp = grid_mrf(8, 8, 3, seed=3)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    V = pre.total_nr_variables()
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedUniformSolver(
        pre.collection, V, pre.objective_vector(), mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables, dtype=jnp.float32,
    )
    plan = s.geom_stacked.exchange
    assert plan is not None
    n_shared = plan.split_len + sum(plan.class_shared_counts)
    assert n_shared > 0  # auto picked split
    assert plan.Vg == 0
    assert n_shared < V // 2  # shared region is the boundary set
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(10):
        s.iteration()
        ref.iteration(0.5)
        assert s.lower_bound() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=2e-3
        ), f"iter {it}"


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_split_exchange_gm_parity(n_dev):
    """Split plans on a graph-matching instance (random long-range
    couplings — the family the windowed plans could never cover): heavy
    shared variables route through class blocks whose totals must make it
    into the psum'd shared slice and back."""
    from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp
    from bdd_tpu.utils.problems import graph_matching

    ilp = construct_graph_matching_ilp(
        graph_matching(12, 12, seed=3, candidates=4, nr_quadratic=80)
    )[0]
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedUniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
        plan_family="split",
    )
    plan = s.geom_stacked.exchange
    assert plan is not None
    assert plan.split_len + sum(plan.class_shared_counts) > 0
    assert len(plan.classes) >= 1  # skewed tail -> class blocks exist
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(8):
        s.iteration()
        ref.iteration(0.5)
        assert s.lower_bound() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=2e-3
        ), f"iter {it}"


def test_sharded_split_learned_grad():
    """The split exchange is differentiable: grad of the post-rollout bound
    w.r.t. a per-variable omega vector matches the single-device layout."""
    from bdd_tpu.solver import learned as ln
    from bdd_tpu.solver import uniform as uf

    ilp = grid_mrf(8, 8, 2, seed=5)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    V = pre.total_nr_variables()
    rng = np.random.RandomState(0)
    ov = jnp.asarray(0.2 + 0.6 * rng.rand(V + 1), dtype=jnp.float32)

    host = uf.flatten_uniform(pre.collection, V, pre.nr_primal_variables)
    state0 = uf.init_uniform_state(host, pre.objective_vector())

    def single_lb(ov):
        omegas = tuple(
            jnp.where(g.layer_valid, ov[g.layer_var], 0.0)
            for g in host.geom.buckets
        )
        st = ln.learned_iterations(
            host.geom, state0, ln.isotropic_alpha(host.geom), omegas, 4
        )
        st = uf.distribute_delta(host.geom, st)
        return uf.lower_bound_from_cft(host.geom, st.cft)

    lb_single, g_single = jax.value_and_grad(single_lb)(ov)

    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    s = ShardedUniformSolver(
        pre.collection, V, pre.objective_vector(), mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables, dtype=jnp.float32,
        plan_family="split",
    )
    assert s.geom_stacked.exchange is not None
    _p = s.geom_stacked.exchange
    assert _p.split_len + sum(_p.class_shared_counts) > 0

    def sharded_lb(ov):
        omegas = s.omega_from_per_var(ov)
        out = s._learned_run(
            s.geom_stacked, s.state_stacked, s.isotropic_alphas(), omegas, 4
        )
        return s._lb(s.geom_stacked, out)

    lb_shard, g_shard = jax.value_and_grad(sharded_lb)(ov)
    assert float(lb_shard) == pytest.approx(float(lb_single), rel=2e-5)
    np.testing.assert_allclose(
        np.asarray(g_shard), np.asarray(g_single), atol=5e-4
    )


def test_sharded_windowed_learned_grad():
    """The windowed exchange is differentiable: grad of the post-rollout
    bound w.r.t. a per-variable omega vector matches the single-device
    layout (dynamic_update_slice / scatter-add both have exact VJPs)."""
    from bdd_tpu.solver import learned as ln
    from bdd_tpu.solver import uniform as uf

    ilp = grid_mrf(8, 8, 2, seed=5)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    V = pre.total_nr_variables()
    rng = np.random.RandomState(0)
    ov = jnp.asarray(0.2 + 0.6 * rng.rand(V + 1), dtype=jnp.float32)

    host = uf.flatten_uniform(pre.collection, V, pre.nr_primal_variables)
    state0 = uf.init_uniform_state(host, pre.objective_vector())

    def single_lb(ov):
        omegas = tuple(
            jnp.where(g.layer_valid, ov[g.layer_var], 0.0)
            for g in host.geom.buckets
        )
        st = ln.learned_iterations(
            host.geom, state0, ln.isotropic_alpha(host.geom), omegas, 4
        )
        st = uf.distribute_delta(host.geom, st)
        return uf.lower_bound_from_cft(host.geom, st.cft)

    lb_single, g_single = jax.value_and_grad(single_lb)(ov)

    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    s = ShardedUniformSolver(
        pre.collection, V, pre.objective_vector(), mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables, dtype=jnp.float32,
        plan_family="windowed",
    )
    assert s.geom_stacked.exchange is not None
    assert s.geom_stacked.exchange.Vg > 0

    def sharded_lb(ov):
        omegas = s.omega_from_per_var(ov)
        out = s._learned_run(
            s.geom_stacked, s.state_stacked, s.isotropic_alphas(), omegas, 4
        )
        return s._lb(s.geom_stacked, out)

    lb_shard, g_shard = jax.value_and_grad(sharded_lb)(ov)
    assert float(lb_shard) == pytest.approx(float(lb_single), rel=2e-5)
    np.testing.assert_allclose(
        np.asarray(g_shard), np.asarray(g_single), atol=5e-4
    )


def test_sharded_learned_iterations_parity_and_grad():
    """Multi-chip learned MMA (DOGE solver core over the mesh): per-layer
    omega from a shared [V+1] vector, isotropic alpha. (a) the sharded
    rollout's bound matches the single-device learned rollout exactly;
    (b) jax.grad of the post-rollout bound w.r.t. the per-variable omega
    vector matches between layouts (the psum consensus is differentiable)."""
    from bdd_tpu.solver import learned as ln
    from bdd_tpu.solver import uniform as uf

    ilp = grid_mrf(3, 3, 2, seed=7)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    V = pre.total_nr_variables()
    rng = np.random.RandomState(0)
    omega_np = 0.2 + 0.6 * rng.rand(V + 1)

    # single-device learned rollout
    host = uf.flatten_uniform(
        pre.collection, V, pre.nr_primal_variables, dtype=jnp.float64
    )
    state0 = uf.init_uniform_state(host, pre.objective_vector(),
                                   dtype=jnp.float64)

    def single_lb(ov):
        omegas = tuple(
            jnp.where(g.layer_valid, ov[g.layer_var], 0.0)
            for g in host.geom.buckets
        )
        st = ln.learned_iterations(
            host.geom, state0, ln.isotropic_alpha(host.geom), omegas, 6
        )
        st = uf.distribute_delta(host.geom, st)
        return uf.lower_bound_from_cft(host.geom, st.cft)

    ov = jnp.asarray(omega_np)
    lb_single, g_single = jax.value_and_grad(single_lb)(ov)

    # sharded learned rollout (4-device mesh)
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    s = ShardedUniformSolver(
        pre.collection, V, pre.objective_vector(), mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables, dtype=jnp.float64,
    )

    def sharded_lb(ov):
        omegas = s.omega_from_per_var(ov)
        out = s._learned_run(
            s.geom_stacked, s.state_stacked, s.isotropic_alphas(), omegas, 6
        )
        return s._lb(s.geom_stacked, out)

    lb_shard, g_shard = jax.value_and_grad(sharded_lb)(ov)
    assert float(lb_shard) == pytest.approx(float(lb_single), abs=1e-9)
    np.testing.assert_allclose(
        np.asarray(g_shard), np.asarray(g_single), atol=1e-9
    )
    # the stateful wrapper runs the same program
    s.learned_iteration_block(s.isotropic_alphas(), s.omega_from_per_var(ov), 6)
    assert s.lower_bound() == pytest.approx(float(lb_single), abs=1e-9)


def test_sharded_solver_via_api_config():
    """'relaxation solver': 'sharded mma' runs the mesh-sharded backend from
    the JSON pipeline, with rounding, matching the uniform backend's result."""
    import pytest as _pytest

    from bdd_tpu.api import BddSolver

    lp = fixtures.MATCHING_3x3
    results = {}
    for name in ("uniform mma", "sharded mma"):
        s = BddSolver({
            "relaxation solver": name,
            "termination criteria": {"maximum iterations": 150},
            "use native preprocessing": False,
        })
        s.read_ilp(lp_string=lp)
        results[name] = s.solve(verbose=False)
    a, b = results["uniform mma"], results["sharded mma"]
    assert b["status"] == "solved"
    assert b["lower_bound"] == _pytest.approx(a["lower_bound"], abs=1e-4)
    assert b["objective"] == _pytest.approx(a["objective"], abs=1e-6)


def test_sharded_doge_training():
    """End-to-end DOGE training over the mesh (the reference trains on one
    GPU only): the GNN runs replicated on the global view, the rollout runs
    sharded with psum consensus. (a) view features match the single-host
    features id-for-id; (b) training decreases the loss; (c) the learned
    rollout improves the bound round over round."""
    from bdd_tpu.learn import features as ft
    from bdd_tpu.learn.sharded import ShardedDogeTrainer
    from bdd_tpu.learn.train import Instance, TrainConfig
    from bdd_tpu.utils.problems import independent_set

    ilp = independent_set(25, edge_prob=0.15, seed=6)
    inst = Instance.from_ilp(ilp)  # single-host reference (normalizes a copy)
    ilp2 = independent_set(25, edge_prob=0.15, seed=6)
    ilp2.normalize()
    pre = BddPreprocessor(ilp2)
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    s = ShardedUniformSolver(
        pre.collection, pre.total_nr_variables(), pre.objective_vector(),
        mesh=mesh, nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
    )
    cfg = TrainConfig(dim=16, nr_rounds=3, iters_per_round=4, grad_rounds=1,
                      free_update=True)
    tr = ShardedDogeTrainer(s, pre.objective_vector(), cfg)
    tr.init()
    vf_s, bf_s, _ = tr._features(tr.state0)
    # same feature options as the sharded trainer: spec without the static
    # ILP columns (it builds its own from the global view), zero prev_lb
    spec1 = ft.graph_spec(inst.host)
    vf_1, bf_1, _ = ft.compute_features(
        inst.host, spec1, inst.state0, inst.objective, cfg.smoothing,
        smooth_temps=cfg.smooth_temps,
        prev_lb_per_bdd=jnp.zeros((inst.host.nr_bdds + 1,), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(vf_s), np.asarray(vf_1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bf_s), np.asarray(bf_1), atol=1e-5)
    losses = [tr.train_step()["loss"] for _ in range(4)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    lbs = tr.run_learned_rounds(3)
    assert all(np.isfinite(lbs)) and lbs[-1] >= lbs[0]


def test_sharded_lbfgs():
    """L-BFGS outer loop over the mesh-sharded backend: global reductions
    (net costs exchange, zero-sum projection) ride the psum; the bound must
    be finite, monotone-ish, and at least as good as plain MMA at the same
    budget (L-BFGS falls back to MMA until history fills)."""
    from bdd_tpu.solver.lbfgs import LbfgsSolver

    ilp = grid_mrf(3, 3, 2, seed=9)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))

    def make_sharded():
        return ShardedUniformSolver(
            pre.collection, pre.total_nr_variables(), pre.objective_vector(),
            mesh=mesh, nr_primal_vars=pre.nr_primal_variables,
            dtype=jnp.float64,
        )

    lb_solver = LbfgsSolver(make_sharded())
    for _ in range(30):
        lb_solver.iteration()
    lb_lbfgs = lb_solver.lower_bound_with_deferred()

    plain = make_sharded()
    plain.iteration_block(30)
    lb_plain = plain.lower_bound_with_deferred()
    assert np.isfinite(lb_lbfgs)
    assert lb_lbfgs >= lb_plain - 1e-6


def test_sharded_subgradient_via_api():
    """Subgradient ascent over the sharded backend (reuses the L-BFGS ops
    with psum reductions) reaches the LP bound on an LP-tight instance."""
    from bdd_tpu.api import BddSolver

    s = BddSolver({"relaxation solver": "subgradient sharded mma",
                   "termination criteria": {"maximum iterations": 80},
                   "perturbation rounding": False,
                   "use native preprocessing": False})
    s.read_ilp(lp_string=fixtures.MATCHING_3x3)
    r = s.solve(verbose=False)
    assert r["status"] == "solved"
    assert r["lower_bound"] == pytest.approx(-6.0, abs=1e-3)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_sharded_parity_fuzz(seed):
    """Randomized parity: random small ILPs, sharded (8-dev) per-iteration
    bounds equal the numpy oracle bit-for-bit in float64."""
    rng = np.random.RandomState(seed)
    ilp = None
    from bdd_tpu.ilp.model import ILPInput, Ineq

    ilp = ILPInput()
    nv = 10
    for v in range(nv):
        ilp.add_to_objective(float(rng.randn()), f"x_{v}")
    for _ in range(6):
        k = rng.randint(2, 5)
        vs = sorted(rng.choice(nv, size=k, replace=False).tolist())
        coeffs = rng.randint(-3, 4, size=k).tolist()
        if all(c == 0 for c in coeffs):
            coeffs[0] = 1
        ineq = [Ineq.LEQ, Ineq.GEQ, Ineq.EQ][rng.randint(3)]
        # rhs chosen so the constraint is satisfiable
        lo = sum(min(c, 0) for c in coeffs)
        hi = sum(max(c, 0) for c in coeffs)
        rhs = int(rng.randint(lo, hi + 1))
        ilp.add_linear_constraint(coeffs, [ilp.get_var_index(f"x_{v}") for v in vs], ineq, rhs)
    ilp.normalize()
    try:
        _, s, ref = make(ilp=ilp, n_dev=8)
    except Exception:
        pytest.skip("infeasible random instance")
    for it in range(10):
        s.iteration_block(1)
        ref.iteration(0.5)
        a = s.lower_bound()
        b = ref.lower_bound_with_deferred()
        assert a == pytest.approx(b, abs=1e-10), (it, a, b)


def test_sharded_doge_lstm_variant():
    """The per-variable LSTM head (ref model.py:244-282) also works in the
    sharded trainer: state carried across rounds, training stays finite."""
    from bdd_tpu.learn.sharded import ShardedDogeTrainer
    from bdd_tpu.learn.train import TrainConfig
    from bdd_tpu.utils.problems import independent_set

    ilp = independent_set(20, edge_prob=0.2, seed=8)
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:2]), ("b",))
    s = ShardedUniformSolver(
        pre.collection, pre.total_nr_variables(), pre.objective_vector(),
        mesh=mesh, nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
    )
    cfg = TrainConfig(dim=8, nr_rounds=3, iters_per_round=3, grad_rounds=1,
                      use_lstm_var=True)
    tr = ShardedDogeTrainer(s, pre.objective_vector(), cfg)
    tr.init()
    losses = [tr.train_step()["loss"] for _ in range(2)]
    assert all(np.isfinite(losses))
    lbs = tr.run_learned_rounds(2)
    assert all(np.isfinite(lbs))


def test_batched_sharded_doge_training():
    """The three scaling axes compose: several ILPs batched into one
    collection, sharded over the mesh, trained with the sharded DOGE
    trainer."""
    from bdd_tpu.learn.sharded import ShardedDogeTrainer
    from bdd_tpu.learn.train import TrainConfig
    from bdd_tpu.utils.batching import BatchedInstances
    from bdd_tpu.utils.problems import independent_set

    ilps = [independent_set(14, edge_prob=0.25, seed=s) for s in (0, 1, 2)]
    for ilp in ilps:
        ilp.normalize()
    bat = BatchedInstances(ilps)
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    s = ShardedUniformSolver(
        bat.collection, bat.nr_vars, bat.objective, mesh=mesh,
        dtype=jnp.float32,
    )
    cfg = TrainConfig(dim=8, nr_rounds=2, iters_per_round=3, grad_rounds=1)
    tr = ShardedDogeTrainer(s, bat.objective, cfg)
    tr.init()
    losses = [tr.train_step()["loss"] for _ in range(3)]
    assert all(np.isfinite(losses))
    lbs = tr.run_learned_rounds(2)
    assert all(np.isfinite(lbs)) and lbs[-1] >= lbs[0] - 1e-4


def test_mincut_partition_properties():
    """refine_partition_mincut: disjoint cover of all BDDs, shared width
    never above the block partition, node balance cap respected."""
    from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp
    from bdd_tpu.solver.sharding import (
        partition_bdds,
        refine_partition_mincut,
        shared_width,
    )
    from bdd_tpu.utils.problems import graph_matching

    ilp = construct_graph_matching_ilp(
        graph_matching(14, 14, seed=5, candidates=4, nr_quadratic=120)
    )[0]
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    col = pre.collection
    nb = col.nr_bdds()
    sizes = [col.nr_bdd_nodes(b) for b in range(nb)]
    for D in (2, 4):
        block = partition_bdds(col, D)
        ref = refine_partition_mincut(col, block)
        flat = sorted(b for p in ref for b in p)
        assert flat == list(range(nb))  # disjoint cover
        assert shared_width(col, ref) <= shared_width(col, block)
        cap = 1.1 * sum(sizes) / D + max(sizes)
        assert all(sum(sizes[b] for b in p) <= cap for p in ref)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_mincut_partition_parity(n_dev):
    """The mincut partition is a drop-in: the sharded trajectory still
    reproduces the f64 oracle (partition choice must not affect semantics,
    only the exchange cost)."""
    from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp
    from bdd_tpu.utils.problems import graph_matching

    ilp = construct_graph_matching_ilp(
        graph_matching(12, 12, seed=3, candidates=4, nr_quadratic=80)
    )[0]
    pre = BddPreprocessor(ilp)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("b",))
    s = ShardedUniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        mesh=mesh,
        nr_primal_vars=pre.nr_primal_variables,
        dtype=jnp.float32,
        partition="mincut",
    )
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    ref = RefSolver(flat, pre.objective_vector())
    for it in range(8):
        s.iteration()
        ref.iteration(0.5)
        assert s.lower_bound() == pytest.approx(
            ref.lower_bound_with_deferred(), abs=2e-3
        ), f"iter {it}"
