"""Smooth sweeps, sum marginals, and differentiable learned iterations.

Oracles: smoothed values converge to hard values as T -> 0 (ref:
test_bdd_smooth_mma.cpp); brute-force log-sum-exp marginals on small
instances; finite-difference gradient checks of the learned iterations
(ref: test_bdd_cuda_grad_learned_mma.cu, test_bdd_cuda_learned_omega.cu).
"""
import math

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bdd_tpu.bdd import BddPreprocessor
from bdd_tpu.ilp import parse_lp_string
from bdd_tpu.solver import smooth as sm
from bdd_tpu.solver import learned as ln
from bdd_tpu.solver import uniform as uf
from tests import fixtures


def build(lp):
    ilp = parse_lp_string(lp)
    pre = BddPreprocessor(ilp)
    host = uf.flatten_uniform(
        pre.collection,
        pre.total_nr_variables(),
        pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    state = uf.init_uniform_state(host, pre.objective_vector(), dtype=jnp.float64)
    return ilp, pre, host, state


def brute_force_smooth_lb(ilp, pre, host, state, T):
    """-T log sum over bdd solutions of exp(-cost/T), summed over bdds."""
    col = pre.collection
    total = 0.0
    # recover per-layer costs by (bdd, var)
    costs = {}
    for g, lo, hi, lbdd in zip(
        host.geom.buckets, state.lo, state.hi, host.layer_bdd
    ):
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        lvar = np.asarray(g.layer_var)
        lval = np.asarray(g.layer_valid)
        lbdd = np.asarray(lbdd)
        for h in range(g.H):
            for c in range(g.B):
                if lval[h, c]:
                    costs[(int(lbdd[h, c]), int(lvar[h, c]))] = (lo[h, c], hi[h, c])
    for b in range(col.nr_bdds()):
        support = col.level_variables(b)
        acc = 0.0
        for sol in col.solutions(b):
            cost = sum(costs[(b, v)][sol[v]] for v in support)
            acc += math.exp(-cost / T)
        total += -T * math.log(acc)
    return total


@pytest.mark.parametrize("lp", [fixtures.TWO_SIMPLEX, fixtures.COVERING])
def test_smooth_lower_bound_vs_brute_force(lp):
    ilp, pre, host, state = build(lp)
    for T in (1.0, 0.3):
        lb = float(sm.smooth_lower_bound(host.geom, state, T))
        expected = brute_force_smooth_lb(ilp, pre, host, state, T)
        assert lb == pytest.approx(expected, abs=1e-8), f"T={T}"


def test_smooth_converges_to_hard_min():
    ilp, pre, host, state = build(fixtures.MATCHING_3x3)
    hard = float(uf.lower_bound(host.geom, state))
    prev = -np.inf
    for T in (1.0, 0.1, 0.01):
        lb = float(sm.smooth_lower_bound(host.geom, state, T))
        assert lb <= hard + 1e-9
        assert lb >= prev - 1e-9  # monotone in T
        prev = lb
    assert prev == pytest.approx(hard, abs=1e-2)


def test_smooth_solution_in_unit_interval():
    ilp, pre, host, state = build(fixtures.MATCHING_3x3)
    probs = sm.smooth_solution(host.geom, state, 0.5)
    for g, p in zip(host.geom.buckets, probs):
        p = np.asarray(p)[np.asarray(g.layer_valid)]
        assert np.all((p >= 0) & (p <= 1))


def test_learned_isotropic_matches_plain():
    """alpha = isotropic, omega = 0.5 must reproduce the plain iteration."""
    ilp, pre, host, state = build(fixtures.MATCHING_3x3)
    alphas = ln.isotropic_alpha(host.geom)
    omegas = tuple(jnp.full_like(a, 0.5) for a in alphas)
    s1 = ln.learned_iterations(host.geom, state, alphas, omegas, 7)
    s2 = uf.iterations(host.geom, state, 7, 0.5)
    for a, b in zip(s1.lo, s2.lo):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_normalize_alpha_sums_to_one():
    ilp, pre, host, state = build(fixtures.MATCHING_3x3)
    raw = tuple(
        jnp.where(g.layer_valid, jnp.abs(jnp.sin(g.layer_var * 1.7)) + 0.1, 0.0)
        for g in host.geom.buckets
    )
    alphas = ln.normalize_alpha(host.geom, raw)
    V = host.nr_vars
    total = np.zeros(V + 1)
    for g, a in zip(host.geom.buckets, alphas):
        np.add.at(
            total, np.asarray(g.layer_var).ravel(), np.asarray(a).ravel()
        )
    assert np.allclose(total[:V], 1.0, atol=1e-9)


def test_learned_gradients_finite_difference():
    """d(dual_loss)/d(omega) via autodiff vs central differences."""
    ilp, pre, host, state = build(fixtures.TWO_SIMPLEX)
    alphas = ln.isotropic_alpha(host.geom)
    omegas = [jnp.full_like(a, 0.4) for a in alphas]

    def loss(om0):
        oms = (om0,) + tuple(omegas[1:])
        return ln.dual_loss(host.geom, state, alphas, oms, 3)

    g = jax.grad(loss)(omegas[0])
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # check a few coordinates by central differences
    rng = np.random.RandomState(0)
    lval = np.asarray(host.geom.buckets[0].layer_valid)
    coords = np.argwhere(lval)
    eps = 1e-6
    for (h, b) in coords[rng.choice(len(coords), size=min(4, len(coords)), replace=False)]:
        e = jnp.zeros_like(omegas[0]).at[h, b].set(eps)
        fd = (float(loss(omegas[0] + e)) - float(loss(omegas[0] - e))) / (2 * eps)
        assert g[h, b] == pytest.approx(fd, abs=1e-4), (h, b)


def test_learned_gradients_wrt_costs():
    ilp, pre, host, state = build(fixtures.COVERING)
    alphas = ln.isotropic_alpha(host.geom)
    omegas = tuple(jnp.full_like(a, 0.5) for a in alphas)

    def loss(lo0):
        st = state._replace(lo=(lo0,) + state.lo[1:])
        return ln.dual_loss(host.geom, st, alphas, omegas, 2)

    g = np.asarray(jax.grad(loss)(state.lo[0]))
    assert np.all(np.isfinite(g))
    lval = np.asarray(host.geom.buckets[0].layer_valid)
    coords = np.argwhere(lval)
    eps = 1e-6
    for (h, b) in coords[:3]:
        e = jnp.zeros_like(state.lo[0]).at[h, b].set(eps)
        fd = (float(loss(state.lo[0] + e)) - float(loss(state.lo[0] - e))) / (2 * eps)
        assert g[h, b] == pytest.approx(fd, abs=1e-4), (h, b)


def test_learned_training_step_improves_bound():
    """A few gradient steps on (alpha logits, omega logits) should tighten the
    bound faster than they loosen it (sanity of the learned parameterization)."""
    ilp, pre, host, state = build(fixtures.MATCHING_3x3)
    raw0 = tuple(jnp.zeros_like(g.alpha) for g in host.geom.buckets)
    om0 = tuple(jnp.zeros_like(g.alpha) for g in host.geom.buckets)

    def loss_fn(params):
        raw, om = params
        alphas = ln.normalize_alpha(
            host.geom,
            tuple(jnp.where(g.layer_valid, jnp.exp(r), 0.0)
                  for g, r in zip(host.geom.buckets, raw)),
        )
        omegas = tuple(jax.nn.sigmoid(o) for o in om)
        return ln.dual_loss(host.geom, state, alphas, omegas, 5)

    params = (raw0, om0)
    l0 = float(loss_fn(params))
    grads = jax.grad(loss_fn)(params)
    lr = 0.05
    params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    l1 = float(loss_fn(params))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 <= l0 + 1e-9


def test_smooth_packed_matches_unpacked():
    """Column packing (root-restart masks) must not change smoothed values:
    lb and per-slot solution probabilities agree with the unpacked layout.
    set_cover(30, 60) produces heterogeneous depths -> multi-segment columns."""
    from bdd_tpu.utils.problems import set_cover

    ilp = set_cover(30, 60, seed=3)
    pre = BddPreprocessor(ilp)
    args = (pre.collection, pre.total_nr_variables(), pre.nr_primal_variables)
    hp = uf.flatten_uniform(*args, dtype=jnp.float32, pack=True)
    hu = uf.flatten_uniform(*args, dtype=jnp.float32, pack=False)
    assert any(
        g.root_mask is not None and bool(np.asarray(g.root_mask)[1:].any())
        for g in hp.geom.buckets
    ), "fixture must produce multi-segment packed columns"
    obj = pre.objective_vector()
    sp = uf.iterations(hp.geom, uf.init_uniform_state(hp, obj), 10, 0.5)
    su = uf.iterations(hu.geom, uf.init_uniform_state(hu, obj), 10, 0.5)
    for T in (1.0, 0.1):
        lbp = float(sm.smooth_lower_bound(hp.geom, sp, T))
        lbu = float(sm.smooth_lower_bound(hu.geom, su, T))
        assert lbp == pytest.approx(lbu, rel=1e-5, abs=1e-5)
    # per-(bdd, var) smoothed solution probabilities
    def probs(host, state):
        out = {}
        for g, lbdd, p in zip(
            host.geom.buckets, host.layer_bdd,
            sm.smooth_solution(host.geom, state, 0.5),
        ):
            lval = np.asarray(g.layer_valid)
            lvar = np.asarray(g.layer_var)
            lb = np.asarray(lbdd)
            p = np.asarray(p)
            for h, c in np.argwhere(lval):
                out[(int(lb[h, c]), int(lvar[h, c]))] = p[h, c]
        return out

    pp, pu = probs(hp, sp), probs(hu, su)
    assert pp.keys() == pu.keys()
    for k in pp:
        assert pp[k] == pytest.approx(pu[k], abs=1e-4), k


def test_smooth_solution_sharpens_with_temperature():
    """Gibbs marginals carry the 1/T scaling: as T -> 0 the soft solution
    converges to the hard argmin indicator (regression: sigmoid(m0-m1)
    without /T never sharpened)."""
    from bdd_tpu.solver import smooth as sm

    inst_lp = fixtures.MATCHING_3x3
    ilp = parse_lp_string(inst_lp)
    pre = BddPreprocessor(ilp)
    host = uf.flatten_uniform(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables,
        dtype=jnp.float64,
    )
    state = uf.init_uniform_state(host, pre.objective_vector(),
                                  dtype=jnp.float64)
    state = uf.iterations(host.geom, state, 200, 0.5)
    hard = uf.bdds_solution(host.geom, state)
    probs_cold = sm.smooth_solution(host.geom, state, 1e-3)
    probs_warm = sm.smooth_solution(host.geom, state, 1.0)
    sharp = unsharp = 0.0
    for g, pc, pw, h in zip(host.geom.buckets, probs_cold, probs_warm, hard):
        v = np.asarray(g.layer_valid)
        pc, pw, h = np.asarray(pc)[v], np.asarray(pw)[v], np.asarray(h)[v]
        # cold probabilities agree with the hard argmin choices
        sharp = max(sharp, np.abs(pc - h).max() if pc.size else 0.0)
        unsharp = max(unsharp, np.abs(pw - 0.5).min() if pw.size else 1.0)
    assert sharp < 1e-2  # T -> 0 recovers the hard solution
