"""DOGE-equivalent learned solver: features, GNN, training loop.

(ref analogues: DOGE tests / test_learned_dist_weights.py,
test_learned_omega_vec.py at fixture scale)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.learn import DogeTrainer, TrainConfig
from bdd_tpu.learn import features as ft
from bdd_tpu.learn.train import Instance, dual_metrics
from bdd_tpu.solver import uniform as uf
from bdd_tpu.utils.problems import independent_set, grid_mrf
from tests import fixtures


def make_instance(lp=None, ilp=None):
    if ilp is None:
        ilp = parse_lp_string(lp)
    return Instance.from_ilp(ilp, dtype=jnp.float32)


def test_graph_spec_and_features():
    inst = make_instance(fixtures.MATCHING_3x3)
    spec = inst.spec
    assert spec.nr_vars == 9
    assert spec.nr_bdds == 6
    v = np.asarray(spec.layer_var)
    valid = np.asarray(spec.layer_valid)
    assert np.all(v[valid] < 9)
    var_f, bdd_f, layer_f = ft.compute_features(
        inst.host, spec, inst.state0, inst.objective
    )
    assert var_f.shape[0] == 10 and np.all(np.isfinite(np.asarray(var_f)))
    assert bdd_f.shape[0] == 7 and np.all(np.isfinite(np.asarray(bdd_f)))
    assert layer_f.shape[0] == spec.E and np.all(np.isfinite(np.asarray(layer_f)))
    # degree feature: every variable occurs in 2 assignment constraints
    assert np.allclose(np.asarray(var_f)[:9, 1], 2.0)


def test_trainer_init_and_step_runs():
    inst = make_instance(fixtures.MATCHING_3x3)
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=2, iters_per_round=3, epochs=1))
    tr.init(inst)
    m = tr.train_step(inst)
    assert np.isfinite(m["loss"])


def test_training_improves_over_epochs():
    """Loss (negated bound) should not blow up and should tend to improve on a
    small MIS instance (DOGE MIS protocol at toy scale)."""
    ilp = independent_set(12, edge_prob=0.4, seed=1)
    inst = make_instance(ilp=ilp)
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=2, iters_per_round=4))
    tr.init(inst)
    losses = [tr.train_step(inst)["loss"] for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    assert min(losses[4:]) <= losses[0] + 1e-6


def test_learned_rounds_monotone_lb():
    inst = make_instance(fixtures.MATCHING_3x3)
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=4, iters_per_round=5))
    tr.init(inst)
    lbs = tr.run_learned_rounds(inst)
    assert len(lbs) == 4
    assert all(np.isfinite(l) for l in lbs)
    # the dual bound never decreases across rounds (valid updates)
    for a, b in zip(lbs, lbs[1:]):
        assert b >= a - 1e-4


def test_checkpoint_roundtrip(tmp_path):
    inst = make_instance(fixtures.MATCHING_3x3)
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=2, iters_per_round=2))
    tr.init(inst)
    tr.train_step(inst)
    lbs1 = tr.run_learned_rounds(inst)
    p = str(tmp_path / "doge.ckpt")
    tr.save(p)
    tr2 = DogeTrainer()
    tr2.load(p, inst)
    lbs2 = tr2.run_learned_rounds(inst)
    np.testing.assert_allclose(lbs1, lbs2, atol=1e-5)


def test_dual_metrics():
    m = dual_metrics([-10.0, -8.0, -7.5], reference_lb=-7.0)
    assert m["final_gap"] == pytest.approx(0.5 / 7.0)


def test_batched_training_instance():
    """Several ILPs batched into one Instance (ref batches solvers by layer
    ranges): training runs, and the batched dual loss at init equals the sum
    of the single-instance losses (disjoint variable spaces never mix)."""
    from bdd_tpu.solver import learned as ln

    ilps = [independent_set(12, 0.3, seed=s) for s in (0, 1)]
    singles = [Instance.from_ilp(parse_lp_string(i.write_lp())) for i in ilps]
    batched = Instance.from_ilps([parse_lp_string(i.write_lp()) for i in ilps])

    def init_lb(inst):
        return float(
            uf.lower_bound_with_deferred(inst.host.geom, inst.state0)
        )

    assert init_lb(batched) == pytest.approx(
        sum(init_lb(s) for s in singles), abs=1e-4
    )
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=2, iters_per_round=2, epochs=1))
    tr.init(batched)
    metrics = tr.train_step(batched)
    assert np.isfinite(metrics["loss"])
    lbs = tr.run_learned_rounds(batched)
    assert all(np.isfinite(l) for l in lbs)
    for a, b in zip(lbs, lbs[1:]):
        assert b >= a - 1e-4


def test_lstm_var_hidden_state_over_rounds():
    """use_lstm_var (ref DOGE model.py:244-247, 278-282): a per-variable LSTM
    cell whose hidden state is carried across dual rounds and concatenated
    into the prediction head. Training and rollout must run, and the carried
    state must actually change the per-round predictions (round 2 differs
    from a fresh-state round 2)."""
    import jax.numpy as jnp

    inst = Instance.from_ilp(parse_lp_string(independent_set(12, 0.3, seed=2).write_lp()))
    tr = DogeTrainer(TrainConfig(
        dim=16, nr_rounds=3, iters_per_round=2, epochs=1, use_lstm_var=True
    ))
    tr.init(inst)
    assert np.isfinite(tr.train_step(inst)["loss"])
    lbs = tr.run_learned_rounds(inst)
    assert all(np.isfinite(l) for l in lbs)
    for a, b in zip(lbs, lbs[1:]):
        assert b >= a - 1e-4

    # the hidden state evolves and feeds back into the policy
    lstm0 = tr._zero_lstm(inst)
    a0, o0, _, lstm1 = tr._predict(tr.params, inst, inst.state0, lstm0)
    assert float(jnp.abs(lstm1[1]).max()) > 0.0
    a1, o1, _, _ = tr._predict(tr.params, inst, inst.state0, lstm1)
    diff = max(
        float(jnp.abs(x - y).max()) for x, y in zip(o0, o1)
    )
    assert diff > 0.0


def test_free_update_head():
    """Free-update head (ref model.py:318-334): per-layer direct dual step,
    zero-sum per primal variable, so the dual bound stays valid."""
    inst = make_instance(fixtures.MATCHING_3x3)
    tr = DogeTrainer(
        TrainConfig(dim=16, nr_rounds=2, iters_per_round=3, free_update=True)
    )
    tr.init(inst)
    _, _, update, _ = tr._predict(tr.params, inst, inst.state0)
    assert update is not None
    # zero-sum per variable over valid layers
    flat = np.concatenate([np.asarray(u).ravel() for u in update])
    lv = np.asarray(inst.spec.layer_var)
    valid = np.asarray(inst.spec.layer_valid)
    assert np.all(flat[~valid] == 0)
    sums = np.zeros(inst.spec.nr_vars + 1)
    np.add.at(sums, lv[valid], flat[valid])
    assert np.allclose(sums, 0.0, atol=1e-5)
    # net per-variable cost is unchanged by the update -> same dual problem
    before = inst.state0
    after = tr._apply_free_update(inst.host.geom, before, update)
    for g, hb, ha in zip(inst.host.geom.buckets, before.hi, after.hi):
        d = np.asarray(ha - hb)
        assert np.all(np.abs(d[~np.asarray(g.layer_valid)]) == 0)
    # training still runs and the bound stays a (finite) lower bound
    m = tr.train_step(inst)
    assert np.isfinite(m["loss"])
    lbs = tr.run_learned_rounds(inst, nr_rounds=2)
    assert all(np.isfinite(lbs))


def test_cell_tracking_family_and_presets():
    """Cell-tracking generator (reference CT family) trains under the CT
    preset (free-update-only regime: 1 dual iteration per round)."""
    from bdd_tpu.learn import config_ct, config_mis
    from bdd_tpu.utils.problems import cell_tracking

    ilp = cell_tracking(3, 4, seed=1)
    # the ILP is well-formed and the all-zero solution is feasible
    assert ilp.feasible([0] * ilp.nr_variables())
    cfg = config_ct(nr_rounds=3, dim=16)
    assert cfg.free_update and cfg.iters_per_round == 1
    assert config_mis().nr_rounds == 20
    inst = make_instance(ilp=ilp)
    tr = DogeTrainer(cfg)
    tr.init(inst)
    m = tr.train_step(inst)
    assert np.isfinite(m["loss"])


def test_training_with_forced_variables_stays_finite():
    """Gradients through instances with forced variables (infinite
    min-marginals, the ±inf def_mm contract) must stay finite: the
    double-where in uniform._hop_cost_update keeps inf primals out of the
    alpha/omega multiplies whose VJP would produce NaN (regression: GM
    instances with forced quadratic vars trained to NaN)."""
    lp = """Minimize
x1 + x2 - 2 x3 + x4
Subject To
x1 + x2 = 2
x1 + x3 + x4 <= 2
x3 + x4 >= 1
End"""
    ilp = parse_lp_string(lp)
    inst = Instance.from_ilp(ilp)
    # the equality forces x1 = x2 = 1 -> infinite min-marginals appear
    s = uf.iterations(inst.host.geom, inst.state0, 3, 0.5)
    m0, _ = uf.min_marginals_all(inst.host.geom, s)[0]
    valid = np.asarray(inst.host.geom.buckets[0].layer_valid)
    assert np.isinf(np.asarray(m0)[valid]).any()
    assert np.isinf(np.asarray(s.def_mm[0])).any()
    cfg = TrainConfig(nr_rounds=3, iters_per_round=3, dim=8, grad_rounds=1,
                      free_update=True, epochs=1)
    tr = DogeTrainer(cfg)
    tr.init(inst)
    for _ in range(2):
        m = tr.train_step(inst)
        assert np.isfinite(m["loss"])
    lbs = tr.run_learned_rounds(inst, nr_rounds=2)
    assert all(np.isfinite(lbs))


def test_replay_buffer_training():
    """use_replay (ref DOGE replay_buffer.py + doge.py:469-493): epochs may
    resume from a replayed end-state; training stays finite and the buffer
    actually accumulates states."""
    inst = make_instance(ilp=independent_set(12, edge_prob=0.3, seed=4))
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=2, iters_per_round=3,
                                 use_replay=True, seed=1))
    tr.init(inst)
    losses = [tr.train_step(inst)["loss"] for _ in range(5)]
    assert all(np.isfinite(losses))
    assert len(tr.replay._store) == 1  # keyed by this instance
    assert len(next(iter(tr.replay._store.values()))) >= 2


def test_history_features_training():
    """EMA history features (ref bdd_cuda_learned_mma.cu:185-270 sol_avg /
    lb first+second-order diff averages, fed to the next round's GNN as in
    solver_utils.py:78-148): training runs, features change predictions."""
    inst = make_instance(fixtures.MATCHING_3x3)
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=3, iters_per_round=4,
                                 history_features=True))
    tr.init(inst)
    losses = [tr.train_step(inst)["loss"] for _ in range(3)]
    assert all(np.isfinite(losses))
    lbs = tr.run_learned_rounds(inst)
    assert all(np.isfinite(lbs))
    for a, b in zip(lbs, lbs[1:]):
        assert b >= a - 1e-4
    # the history input actually reaches the policy: predictions at the same
    # state differ between zero history and a rolled-out history
    from bdd_tpu.solver import learned as ln
    from bdd_tpu.solver import uniform as uf

    al = ln.isotropic_alpha(inst.host.geom)
    om = tuple(jnp.full_like(a, 0.5) for a in al)
    _, sol_avg, fo, so = ln.learned_iterations_with_stats(
        inst.host.geom, inst.state0, al, om, 4, history_itr=4
    )
    a0, o0, _, _ = tr._predict(tr.params, inst, inst.state0,
                               history=tr._zero_history(inst))
    a1, o1, _, _ = tr._predict(tr.params, inst, inst.state0,
                               history=(sol_avg, fo, so))
    diff = max(float(jnp.abs(x - y).max()) for x, y in zip(o0, o1))
    assert diff > 0.0


def test_fused_rollout_matches_streamed():
    """run_learned_rounds(fused=True) scans all rounds in one program; the
    per-round bounds must match the streamed per-round loop exactly (same
    jitted round function, composed under lax.scan)."""
    inst = make_instance(fixtures.MATCHING_3x3)
    tr = DogeTrainer(TrainConfig(dim=16, nr_rounds=3, iters_per_round=4))
    tr.init(inst)
    streamed = tr.run_learned_rounds(inst, fused=False)
    fused = tr.run_learned_rounds(inst, fused=True)
    assert len(fused) == len(streamed) == 3
    np.testing.assert_allclose(fused, streamed, rtol=1e-6, atol=1e-6)
