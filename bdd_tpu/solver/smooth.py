"""Smooth (log-sum-exp) sweeps and sum marginals on the uniform layout.

Temperature-smoothed counterparts of the min-plus sweeps (ref: smooth sweeps in
include/bdd_solver/bdd_branch_instruction_smooth.h:48-283 and the scatter_
logsumexp path of bdd_torch_base.py:121-232): every min is replaced by
    smin_T(x) = -T * log(sum exp(-x / T))
which lower-bounds the hard min and converges to it as T -> 0. Used for
smoothed lower bounds, sum marginals, soft solutions (sigmoid of marginal
differences) and the differentiable features of the learned solver.

Temperature ``smoothing`` is a scalar or a per-column vector [B] per bucket.
With packed columns (uniform.pack_uniform_host) several BDDs share a column,
so a per-column temperature applies to all of them; per-BDD temperatures
require an unpacked host (flatten_uniform(pack=False)).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from bdd_tpu.solver.uniform import (
    ARC_BOT,
    ARC_INTERNAL,
    ARC_TOP,
    BucketGeom,
    UniformGeom,
    UniformState,
    _child_cft,
    _restart_cfr,
    root_rows,
)

INF = jnp.inf
_BIG = 1e30


def _smin(x, axis, T):
    """-T * logsumexp(-x / T) along axis; inf-safe (masked lanes carry +inf)."""
    neg = -jnp.where(jnp.isfinite(x), x, _BIG)
    m = jnp.max(neg, axis=axis, keepdims=True)
    out = m + T * jnp.log(
        jnp.sum(jnp.exp((neg - m) / T), axis=axis, keepdims=True)
    )
    out = -jnp.squeeze(out, axis=axis)
    return jnp.where(out >= _BIG / 2, INF, out)


def _smin2(a, b, T):
    """Smoothed elementwise minimum of two arrays."""
    na = -jnp.where(jnp.isfinite(a), a, _BIG)
    nb = -jnp.where(jnp.isfinite(b), b, _BIG)
    m = jnp.maximum(na, nb)
    out = -(m + T * jnp.log(jnp.exp((na - m) / T) + jnp.exp((nb - m) / T)))
    return jnp.where(out >= _BIG / 2, INF, out)


def bucket_smooth_backward_run(
    g: BucketGeom, lo: jnp.ndarray, hi: jnp.ndarray, smoothing
) -> jnp.ndarray:
    """Smoothed cost-from-terminal, [H, P, B]."""
    P = g.P
    T = jnp.broadcast_to(jnp.asarray(smoothing, lo.dtype), (g.B,))

    def step(cft_next, xs):
        (nvalid, lo_k, lo_s, hi_k, hi_s, lo_row, hi_row) = xs
        t_lo = _child_cft(lo_k, lo_s, cft_next, P)
        t_hi = _child_cft(hi_k, hi_s, cft_next, P)
        cft_row = jnp.where(
            nvalid, _smin2(lo_row[None] + t_lo, hi_row[None] + t_hi, T[None]), INF
        )
        return cft_row, cft_row

    xs = (g.node_valid, g.lo_kind, g.lo_slot, g.hi_kind, g.hi_slot, lo, hi)
    init = jnp.full((P, g.B), INF, dtype=lo.dtype)
    _, cft = jax.lax.scan(step, init, xs, reverse=True)
    return cft


def bucket_smooth_forward_run(
    g: BucketGeom, lo: jnp.ndarray, hi: jnp.ndarray, smoothing
) -> jnp.ndarray:
    """Smoothed cost-from-root, [H, P, B]."""
    P = g.P
    T = jnp.broadcast_to(jnp.asarray(smoothing, lo.dtype), (g.B,))
    cfr0 = jnp.where(g.node_valid[0], 0.0, INF).astype(lo.dtype)
    packed = g.root_mask is not None

    def relax(vals, kind, slot, valid):
        iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1, 1), 0)
        mask = (slot[None] == iota) & (kind[None] == ARC_INTERNAL) & valid[None]
        return jnp.where(mask, vals[None], INF)  # [P(k), P(p), B]

    def step(cfr_row, xs):
        (nvalid, lo_k, lo_s, hi_k, hi_s, lo_row, hi_row, root_row) = xs
        if packed:
            # root restart (column packing): exact — the carry entering a
            # restart row is all-INF, the previous segment's last layer has
            # only terminal arcs
            cfr_row = _restart_cfr(cfr_row, root_row, P)
        cand = jnp.concatenate(
            [
                relax(cfr_row + lo_row[None], lo_k, lo_s, nvalid),
                relax(cfr_row + hi_row[None], hi_k, hi_s, nvalid),
            ],
            axis=1,
        )  # [P(k), 2P, B]
        nxt = _smin(cand, 1, T[None])
        return nxt, cfr_row

    xs = (g.node_valid, g.lo_kind, g.lo_slot, g.hi_kind, g.hi_slot, lo, hi,
          root_rows(g))
    _, cfr = jax.lax.scan(step, cfr0, xs)
    return cfr


def bucket_sum_marginals(
    g: BucketGeom, lo: jnp.ndarray, hi: jnp.ndarray, smoothing
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smoothed per-layer marginals (m0, m1) [H, B]
    (ref: sum_marginals, bdd_branch_instruction_smooth.h:226-283)."""
    P = g.P
    T = jnp.broadcast_to(jnp.asarray(smoothing, lo.dtype), (g.B,))
    cfr = bucket_smooth_forward_run(g, lo, hi, smoothing)
    cft = bucket_smooth_backward_run(g, lo, hi, smoothing)
    cft_next = jnp.concatenate(
        [cft[1:], jnp.full((1, P, g.B), INF, dtype=lo.dtype)], axis=0
    )

    def per_hop(cfr_row, cft_next_row, nvalid, lo_k, lo_s, hi_k, hi_s, lo_row, hi_row):
        t_lo = _child_cft(lo_k, lo_s, cft_next_row, P)
        t_hi = _child_cft(hi_k, hi_s, cft_next_row, P)
        lo_path = jnp.where(nvalid, cfr_row + lo_row[None] + t_lo, INF)
        hi_path = jnp.where(nvalid, cfr_row + hi_row[None] + t_hi, INF)
        m0 = _smin(lo_path, 0, T[None])
        m1 = _smin(hi_path, 0, T[None])
        return m0, m1

    return jax.vmap(per_hop)(
        cfr, cft_next, g.node_valid, g.lo_kind, g.lo_slot, g.hi_kind, g.hi_slot, lo, hi
    )


def smooth_lower_bound(geom: UniformGeom, state: UniformState, smoothing) -> jnp.ndarray:
    """Smoothed dual bound: sum of smoothed per-BDD root costs (<= hard lb)."""
    lb = jnp.asarray(0.0, dtype=state.lo[0].dtype)
    for g, lo, hi in zip(geom.buckets, state.lo, state.hi):
        cft = bucket_smooth_backward_run(g, lo, hi, smoothing)
        # one root (slot 0) per segment-start row (packed columns hold
        # several BDDs stacked vertically)
        lb = lb + jnp.sum(jnp.where(root_rows(g), cft[:, 0, :], 0.0))
    return lb


def smooth_solution(
    geom: UniformGeom, state: UniformState, smoothing
) -> Tuple[jnp.ndarray, ...]:
    """Per-layer probability of value 1 per bucket [H, B]: softmax over the
    negated smoothed marginals (ref: bdd_torch_base.smooth_solution)."""
    out = []
    T = jnp.maximum(jnp.asarray(smoothing, state.lo[0].dtype), 1e-12)
    for g, lo, hi in zip(geom.buckets, state.lo, state.hi):
        m0, m1 = bucket_sum_marginals(g, lo, hi, smoothing)
        d = jnp.where(
            jnp.isfinite(m0) & jnp.isfinite(m1),
            m0 - m1,
            jnp.where(jnp.isfinite(m1), _BIG, -_BIG),
        )
        # Gibbs marginal: m = -T log Z_x, so p(x=1) = sigmoid((m0-m1)/T) —
        # without the 1/T the probabilities fail to sharpen as T -> 0
        out.append(jax.nn.sigmoid(d / T))
    return tuple(out)
