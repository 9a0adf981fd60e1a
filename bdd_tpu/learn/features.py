"""Solver-state features for the learned solver.

TPU counterpart of DOGE/model/solver_utils.py:13-157: per-variable,
per-subproblem (BDD) and per-layer (edge) feature tensors computed from the
current solver state, in the uniform bucket layout (layers flattened across
buckets as [sum H*B]).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bdd_tpu.solver import learned as ln
from bdd_tpu.solver import smooth as sm
from bdd_tpu.solver import uniform as uf

_CLIP = 1e4


class GraphSpec(NamedTuple):
    """Static bipartite graph of the ILP: layer e connects variable
    layer_var[e] with bdd layer_bdd[e]. Flattened over buckets."""

    layer_var: jnp.ndarray  # int32 [E] (V sentinel at padding)
    layer_bdd: jnp.ndarray  # int32 [E] (nr_bdds sentinel at padding)
    layer_valid: jnp.ndarray  # bool [E]
    nr_vars: int
    nr_bdds: int

    @property
    def E(self) -> int:
        return self.layer_var.shape[0]


def graph_spec(host: uf.UniformHost) -> GraphSpec:
    lv, lb, lval = [], [], []
    for g, lbdd in zip(host.geom.buckets, host.layer_bdd):
        lv.append(np.asarray(g.layer_var).ravel())
        valid = np.asarray(g.layer_valid)
        bdd = np.asarray(lbdd).copy()
        bdd[~valid] = host.nr_bdds
        bdd[bdd < 0] = host.nr_bdds
        lb.append(bdd.ravel())
        lval.append(valid.ravel())
    return GraphSpec(
        layer_var=jnp.asarray(np.concatenate(lv), jnp.int32),
        layer_bdd=jnp.asarray(np.concatenate(lb), jnp.int32),
        layer_valid=jnp.asarray(np.concatenate(lval)),
        nr_vars=host.nr_vars,
        nr_bdds=host.nr_bdds,
    )


def _flatten(per_bucket: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    return jnp.concatenate([x.ravel() for x in per_bucket])


def compute_features(
    host: uf.UniformHost,
    spec: GraphSpec,
    state: uf.UniformState,
    objective: jnp.ndarray,
    smoothing: float = 1.0,
    history=None,
):
    """Returns (var_f [V+1, Fv], bdd_f [nb+1, Fb], layer_f [E, Fe]).
    Sentinel rows (index V / nb) are zero. Features follow DOGE's lists
    (solver_utils.py var/con/edge lp_f): objective, degree, costs, min-marginal
    differences, per-BDD lower bounds, smoothed solutions.

    ``history``: optional (sol_avg, lb_fo_avg, lb_so_avg) per-bucket tuples
    from ``learned.learned_iterations_with_stats`` — appended as the
    reference's prev_sol_avg edge feature and lb_first/sec_order_avg con
    features (solver_utils.py:132-148)."""
    geom = host.geom
    lo = _flatten(state.lo)
    hi = _flatten(state.hi)
    mmdiff = _flatten(ln.all_min_marginal_differences(geom, state))
    probs = _flatten(sm.smooth_solution(geom, state, smoothing))
    valid = spec.layer_valid
    E = spec.E
    V, nb = spec.nr_vars, spec.nr_bdds

    def seg_v(x):
        return jax.ops.segment_sum(
            jnp.where(valid, x, 0.0), spec.layer_var, num_segments=V + 1
        )

    def seg_b(x):
        return jax.ops.segment_sum(
            jnp.where(valid, x, 0.0), spec.layer_bdd, num_segments=nb + 1
        )

    deg_v = seg_v(jnp.ones((E,), lo.dtype))
    deg_b = seg_b(jnp.ones((E,), lo.dtype))
    obj = jnp.concatenate([objective.astype(lo.dtype), jnp.zeros((1,), lo.dtype)])

    lbs = ln.per_bdd_lower_bound(geom, state)  # per bucket [H, B] root costs
    lb_per_bdd = jnp.zeros((nb + 1,), lo.dtype)
    for g, cft_lb, lbdd in zip(geom.buckets, lbs, host.layer_bdd):
        roots = np.asarray(uf.root_rows(g))
        ids_np = np.where(roots & (np.asarray(lbdd) >= 0), np.asarray(lbdd), nb)
        ids = jnp.asarray(ids_np.ravel(), jnp.int32)
        lb_per_bdd = lb_per_bdd.at[ids].add(cft_lb.ravel())
    lb_per_bdd = lb_per_bdd.at[nb].set(0.0)

    c = lambda x: jnp.clip(x, -_CLIP, _CLIP)
    var_f = jnp.stack(
        [c(obj), deg_v, c(seg_v(mmdiff)), c(seg_v(probs)), c(seg_v(hi - lo))],
        axis=-1,
    )
    bdd_cols = [deg_b, c(lb_per_bdd), c(seg_b(mmdiff))]
    layer_cols = [c(lo), c(hi), c(mmdiff), c(probs), valid.astype(lo.dtype)]
    if history is not None:
        sol_avg, fo_avg, so_avg = history
        layer_cols.append(c(_flatten(sol_avg)))

        def per_bdd_from_roots(vals):
            out = jnp.zeros((nb + 1,), lo.dtype)
            for g, v_b, lbdd in zip(geom.buckets, vals, host.layer_bdd):
                roots = np.asarray(uf.root_rows(g))
                ids_np = np.where(
                    roots & (np.asarray(lbdd) >= 0), np.asarray(lbdd), nb
                )
                out = out.at[jnp.asarray(ids_np.ravel(), jnp.int32)].add(
                    v_b.ravel()
                )
            return out.at[nb].set(0.0)

        bdd_cols.append(c(per_bdd_from_roots(fo_avg)))
        bdd_cols.append(c(per_bdd_from_roots(so_avg)))
    bdd_f = jnp.stack(bdd_cols, axis=-1)
    layer_f = jnp.stack(layer_cols, axis=-1)
    return var_f, bdd_f, layer_f


def split_like(host: uf.UniformHost, flat: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Inverse of _flatten: split an [E] vector into per-bucket [H, B]."""
    out = []
    off = 0
    for g in host.geom.buckets:
        n = g.H * g.B
        out.append(flat[off : off + n].reshape(g.H, g.B))
        off += n
    return tuple(out)
