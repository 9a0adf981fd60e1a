"""Smoothed dual-ascent MMA (sum-marginal averaging) on the uniform layout.

The reference's smoothed parallel solver
(include/bdd_solver/bdd_parallel_mma_base_smooth.h:286-560, tested in
test/test_bdd_smooth_parallel_mma.cpp) runs the SAME deferred-averaging
iteration as hard MMA with min-marginals replaced by temperature-T smoothed
sum-marginals: per layer, m_x = -T log Σ_paths exp(-path_x / T); the update
removes ω·relu(m0-m1) from lo (resp. ω·relu(m1-m0) from hi), defers the
removed amount into the per-variable delta, and adds back the averaged delta
from the previous half-sweep (forward_sm: ..._smooth.h:351-485). The
reference stores costs pre-scaled by 1/T (update_costs, _smooth.h:219) —
mathematically an exact reparametrization; here costs stay unscaled and the
logsumexp carries the temperature, so annealing T needs no cost rescaling.

The smoothed dual bound Σ_bdds -T log Z_root lower-bounds the hard MMA bound
and converges to it as T→0; each iteration is block-coordinate ascent on the
smoothed dual, so the smooth bound is monotone nondecreasing at fixed T.

Wired to the JSON config as relaxation solver "smooth mma" with keys
  "smoothing": initial temperature (reference key, bdd_solver.cpp:127),
  "smoothing decay factor" / "min smoothing": annealing schedule applied
  once per termination-check block.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bdd_tpu.solver import uniform as uf
from bdd_tpu.solver.smooth import _smin, _smin2
from bdd_tpu.solver.uniform import (
    ARC_INTERNAL,
    BucketGeom,
    UniformGeom,
    UniformState,
    _child_cft,
    _hop_cost_update,
    _restart_cfr,
    exchange_delta,
    root_rows,
)

INF = jnp.inf


def _srelax_cand(vals, kind, slot, valid, P):
    """Candidate matrix for the smoothed frontier relaxation: [P(k), P(p), B]
    with +inf at non-contributing lanes (smin-reduced by the caller)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1, 1), 0)
    mask = (slot[None] == iota) & (kind[None] == ARC_INTERNAL) & valid[None]
    return jnp.where(mask, vals[None], INF)


def bucket_smooth_forward_iteration(
    g: BucketGeom,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    cft: jnp.ndarray,
    omega,
    din_lo: jnp.ndarray,
    din_hi: jnp.ndarray,
    smoothing,
    alpha=None,
):
    """One smoothed forward half-sweep of a bucket (forward_sm semantics,
    bdd_parallel_mma_base_smooth.h:368-485). ``cft`` must be a SMOOTH
    backward run of (lo, hi)."""
    if alpha is None:
        alpha = g.alpha
    alpha = jnp.broadcast_to(alpha, lo.shape).astype(lo.dtype)
    din_lo = din_lo.astype(lo.dtype)
    din_hi = din_hi.astype(lo.dtype)
    P = g.P
    T = jnp.broadcast_to(jnp.asarray(smoothing, lo.dtype), (g.B,))
    cft_next = jnp.concatenate(
        [cft[1:], jnp.full((1, P, g.B), INF, dtype=lo.dtype)], axis=0
    )
    cfr0 = jnp.where(g.node_valid[0], 0.0, INF).astype(lo.dtype)
    omega_arr = jnp.broadcast_to(jnp.asarray(omega, dtype=lo.dtype), lo.shape)
    packed = g.root_mask is not None

    def step(cfr_row, xs):
        (nvalid, lo_k, lo_s, hi_k, hi_s, lo_row, hi_row, om, al, dlo, dhi,
         lval, cftn, root_row) = xs
        if packed:
            cfr_row = _restart_cfr(cfr_row, root_row, P)
        t_lo = _child_cft(lo_k, lo_s, cftn, P)
        t_hi = _child_cft(hi_k, hi_s, cftn, P)
        lo_path = jnp.where(nvalid, cfr_row + lo_row[None] + t_lo, INF)
        hi_path = jnp.where(nvalid, cfr_row + hi_row[None] + t_hi, INF)
        m0 = _smin(lo_path, 0, T[None])
        m1 = _smin(hi_path, 0, T[None])
        new_lo, new_hi, mm = _hop_cost_update(
            lo_row, hi_row, m0, m1, om, al, dlo, dhi, lval
        )
        cand = jnp.concatenate(
            [
                _srelax_cand(cfr_row + new_lo[None], lo_k, lo_s, nvalid, P),
                _srelax_cand(cfr_row + new_hi[None], hi_k, hi_s, nvalid, P),
            ],
            axis=1,
        )  # [P(k), 2P, B]
        nxt = _smin(cand, 1, T[None])
        return nxt, (new_lo, new_hi, mm, cfr_row)

    xs = (
        g.node_valid, g.lo_kind, g.lo_slot, g.hi_kind, g.hi_slot,
        lo, hi, omega_arr, alpha, din_lo, din_hi, g.layer_valid, cft_next,
        root_rows(g),
    )
    _, (new_lo, new_hi, new_mm, cfr) = jax.lax.scan(step, cfr0, xs)
    return new_lo, new_hi, new_mm, cfr


def bucket_smooth_backward_iteration(
    g: BucketGeom,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    cfr: jnp.ndarray,
    omega,
    din_lo: jnp.ndarray,
    din_hi: jnp.ndarray,
    smoothing,
    alpha=None,
):
    """Smoothed backward half-sweep (backward_sm,
    bdd_parallel_mma_base_smooth.h:488-560). ``cfr`` from the preceding
    smoothed forward half-sweep."""
    if alpha is None:
        alpha = g.alpha
    alpha = jnp.broadcast_to(alpha, lo.shape).astype(lo.dtype)
    din_lo = din_lo.astype(lo.dtype)
    din_hi = din_hi.astype(lo.dtype)
    P = g.P
    T = jnp.broadcast_to(jnp.asarray(smoothing, lo.dtype), (g.B,))
    omega_arr = jnp.broadcast_to(jnp.asarray(omega, dtype=lo.dtype), lo.shape)

    def step(cft_next, xs):
        (nvalid, lo_k, lo_s, hi_k, hi_s, lo_row, hi_row, om, al, dlo, dhi,
         lval, cfr_row) = xs
        t_lo = _child_cft(lo_k, lo_s, cft_next, P)
        t_hi = _child_cft(hi_k, hi_s, cft_next, P)
        lo_path = jnp.where(nvalid, cfr_row + lo_row[None] + t_lo, INF)
        hi_path = jnp.where(nvalid, cfr_row + hi_row[None] + t_hi, INF)
        m0 = _smin(lo_path, 0, T[None])
        m1 = _smin(hi_path, 0, T[None])
        new_lo, new_hi, mm = _hop_cost_update(
            lo_row, hi_row, m0, m1, om, al, dlo, dhi, lval
        )
        cft_row = jnp.where(
            nvalid,
            _smin2(new_lo[None] + t_lo, new_hi[None] + t_hi, T[None]),
            INF,
        )
        return cft_row, (new_lo, new_hi, mm, cft_row)

    xs = (
        g.node_valid, g.lo_kind, g.lo_slot, g.hi_kind, g.hi_slot,
        lo, hi, omega_arr, alpha, din_lo, din_hi, g.layer_valid, cfr,
    )
    init = jnp.full((P, g.B), INF, dtype=lo.dtype)
    _, (new_lo, new_hi, new_mm, cft) = jax.lax.scan(step, init, xs, reverse=True)
    return new_lo, new_hi, new_mm, cft


def smooth_iteration(
    geom: UniformGeom, state: UniformState, omega, smoothing, delta_reduce=None
) -> UniformState:
    """One full smoothed dual iteration (forward + backward half-sweeps with
    delta consensus between them; iterate(), _smooth.h:286-348). The state's
    cft tuple holds SMOOTH backward runs."""
    din_lo, din_hi = exchange_delta(geom, state.def_mm, delta_reduce)
    new_lo, new_hi, new_mm, cfrs = [], [], [], []
    for g, lo, hi, cft, dl, dh in zip(
        geom.buckets, state.lo, state.hi, state.cft, din_lo, din_hi
    ):
        nl, nh, mm, cfr = bucket_smooth_forward_iteration(
            g, lo, hi, cft, omega, dl, dh, smoothing
        )
        new_lo.append(nl)
        new_hi.append(nh)
        new_mm.append(mm)
        cfrs.append(cfr)
    state = UniformState(tuple(new_lo), tuple(new_hi), tuple(new_mm), state.cft)

    din_lo, din_hi = exchange_delta(geom, state.def_mm, delta_reduce)
    new_lo, new_hi, new_mm, cfts = [], [], [], []
    for g, lo, hi, cfr, dl, dh in zip(
        geom.buckets, state.lo, state.hi, cfrs, din_lo, din_hi
    ):
        nl, nh, mm, cft = bucket_smooth_backward_iteration(
            g, lo, hi, cfr, omega, dl, dh, smoothing
        )
        new_lo.append(nl)
        new_hi.append(nh)
        new_mm.append(mm)
        cfts.append(cft)
    return UniformState(tuple(new_lo), tuple(new_hi), tuple(new_mm), tuple(cfts))


@functools.partial(jax.jit, static_argnames=("n",))
def smooth_iterations(
    geom: UniformGeom, state: UniformState, n: int, omega, smoothing
) -> UniformState:
    def body(s, _):
        return smooth_iteration(geom, s, omega, smoothing), ()

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


@jax.jit
def smooth_backward_all(geom: UniformGeom, lo, hi, smoothing):
    from bdd_tpu.solver.smooth import bucket_smooth_backward_run

    return tuple(
        bucket_smooth_backward_run(g, l, h, smoothing)
        for g, l, h in zip(geom.buckets, lo, hi)
    )


@jax.jit
def smooth_lower_bound_from_cft(geom: UniformGeom, cft) -> jnp.ndarray:
    """Σ_bdds of smoothed root costs (compute_smooth_lower_bound_after_
    backward_pass, _smooth.h:150-172). ≤ the hard bound of the same costs."""
    acc_t = jnp.float64 if jax.config.jax_enable_x64 else cft[0].dtype
    lb = jnp.asarray(0.0, dtype=acc_t)
    for g, c in zip(geom.buckets, cft):
        lb = lb + jnp.sum(
            jnp.where(root_rows(g), c[:, 0, :], 0.0), dtype=acc_t
        )
    return lb.astype(cft[0].dtype)


@jax.jit
def smooth_distribute_delta(
    geom: UniformGeom, state: UniformState, smoothing
) -> UniformState:
    """Fold deferred deltas into costs; refresh the SMOOTH cft."""
    din_lo, din_hi = exchange_delta(geom, state.def_mm)
    from bdd_tpu.solver.smooth import bucket_smooth_backward_run

    lo_l, hi_l, mm_l, cft_l = [], [], [], []
    for g, lo, hi, dl, dh in zip(geom.buckets, state.lo, state.hi, din_lo, din_hi):
        nl = jnp.where(g.layer_valid, lo + g.alpha * dl, 0.0)
        nh = jnp.where(g.layer_valid, hi + g.alpha * dh, 0.0)
        lo_l.append(nl)
        hi_l.append(nh)
        mm_l.append(jnp.zeros_like(lo))
        cft_l.append(bucket_smooth_backward_run(g, nl, nh, smoothing))
    return UniformState(tuple(lo_l), tuple(hi_l), tuple(mm_l), tuple(cft_l))


@jax.jit
def smooth_lower_bound_with_deferred(
    geom: UniformGeom, state: UniformState, smoothing
) -> jnp.ndarray:
    s = smooth_distribute_delta(geom, state, smoothing)
    return smooth_lower_bound_from_cft(geom, s.cft)


@jax.jit
def hard_lower_bound_with_deferred(
    geom: UniformGeom, state: UniformState
) -> jnp.ndarray:
    """The valid (hard min-plus) bound of the smooth solver's current costs —
    what the run loop terminates on."""
    s = uf._distribute_delta_impl(geom, state, None)
    return uf.lower_bound_from_cft(geom, s.cft)


class SmoothSolver:
    """Duck-compatible smoothed dual solver (UniformSolver interface) with
    geometric temperature annealing per iteration block.

    ``lower_bound*`` report the HARD bound of the current costs (always a
    valid dual bound; the smoothed bound is available via smooth_bound()) so
    the run_solver termination criteria match the reference protocol."""

    default_block_size = 25

    def __init__(
        self,
        collection,
        nr_vars: int,
        objective,
        nr_primal_vars: Optional[int] = None,
        dtype=jnp.float32,
        omega: float = 0.5,
        smoothing: float = 0.1,
        smoothing_decay: float = 0.5,
        min_smoothing: float = 1e-3,
    ) -> None:
        # Annealing note (measured, grid 6x6x3): the iteration converges to a
        # fixed point at every fixed T, but the fixed point's HARD bound
        # degrades quickly with T (T=0.5: -204, T=0.05: -39 vs LP ~-35), so
        # production runs start at moderate T and anneal toward min_smoothing
        # where the trajectory coincides with hard MMA.
        self.host = uf.flatten_uniform(collection, nr_vars, nr_primal_vars, dtype=dtype)
        self.geom = self.host.geom
        state = uf.init_uniform_state(self.host, objective, dtype=dtype)
        self.smoothing = float(smoothing)
        self.smoothing_decay = float(smoothing_decay)
        self.min_smoothing = float(min_smoothing)
        self.omega = omega
        self.dtype = dtype
        # replace the hard cft with the smooth one
        self.state = UniformState(
            state.lo,
            state.hi,
            state.def_mm,
            smooth_backward_all(self.geom, state.lo, state.hi, self._T()),
        )
        from bdd_tpu.solver.uniform_wrapper import UniformLayerView

        self.f = UniformLayerView(self.host)

    def _T(self):
        return jnp.asarray(self.smoothing, dtype=self.dtype)

    # ------------------------------------------------------------------- dual
    def iteration(self) -> None:
        self.state = smooth_iterations(
            self.geom, self.state, 1, self.omega, self._T()
        )

    def iteration_block(self, n: int) -> None:
        self.state = smooth_iterations(
            self.geom, self.state, n, self.omega, self._T()
        )
        # anneal once per block; refresh the smooth cft at the new temperature
        new_T = max(self.smoothing * self.smoothing_decay, self.min_smoothing)
        if new_T != self.smoothing:
            self.smoothing = new_T
            self.state = UniformState(
                self.state.lo,
                self.state.hi,
                self.state.def_mm,
                smooth_backward_all(
                    self.geom, self.state.lo, self.state.hi, self._T()
                ),
            )

    def lower_bound(self) -> float:
        cft = uf._backward_all(self.geom, self.state.lo, self.state.hi)
        return float(uf.lower_bound_from_cft(self.geom, cft))

    def lower_bound_with_deferred(self) -> float:
        return float(hard_lower_bound_with_deferred(self.geom, self.state))

    def smooth_bound(self) -> float:
        return float(
            smooth_lower_bound_with_deferred(self.geom, self.state, self._T())
        )

    def lower_bound_per_bdd(self) -> np.ndarray:
        cft = uf._backward_all(self.geom, self.state.lo, self.state.hi)
        out = np.zeros(self.host.nr_bdds)
        for g, c, lbdd in zip(self.geom.buckets, cft, self.host.layer_bdd):
            roots = np.asarray(root_rows(g))
            vals = np.asarray(c[:, 0, :])
            bdds = np.asarray(lbdd)
            m = roots & (bdds >= 0)
            out[bdds[m]] = vals[m]
        return out

    # -------------------------------------------------------------- marginals
    def min_marginals(self) -> Tuple[np.ndarray, np.ndarray]:
        """HARD min marginals of the current costs (rounding interface)."""
        cft = uf._backward_all(self.geom, self.state.lo, self.state.hi)
        st = UniformState(self.state.lo, self.state.hi, self.state.def_mm, cft)
        mm = uf.min_marginals_all(self.geom, st)
        m0 = np.concatenate([np.asarray(a).ravel() for (a, b) in mm])
        m1 = np.concatenate([np.asarray(b).ravel() for (a, b) in mm])
        return m0, m1

    def sum_marginals(self) -> Tuple[np.ndarray, np.ndarray]:
        from bdd_tpu.solver.smooth import bucket_sum_marginals

        m0_l, m1_l = [], []
        for g, lo, hi in zip(self.geom.buckets, self.state.lo, self.state.hi):
            m0, m1 = bucket_sum_marginals(g, lo, hi, self._T())
            m0_l.append(np.asarray(m0).ravel())
            m1_l.append(np.asarray(m1).ravel())
        return np.concatenate(m0_l), np.concatenate(m1_l)

    # ------------------------------------------------------------------ costs
    def distribute_delta(self) -> None:
        self.state = smooth_distribute_delta(self.geom, self.state, self._T())

    def update_layer_costs(self, lo_delta, hi_delta) -> None:
        dl_l, dh_l = [], []
        off = 0
        for g in self.geom.buckets:
            n = g.H * g.B
            dl_l.append(jnp.asarray(
                np.asarray(lo_delta[off : off + n]).reshape(g.H, g.B),
                self.dtype,
            ))
            dh_l.append(jnp.asarray(
                np.asarray(hi_delta[off : off + n]).reshape(g.H, g.B),
                self.dtype,
            ))
            off += n
        self.state = _update_layer_costs_smooth(
            self.geom, self.state, tuple(dl_l), tuple(dh_l), self._T()
        )

    def update_costs(self, lo_per_var, hi_per_var) -> None:
        lo_u = jnp.asarray(
            np.append(np.asarray(lo_per_var, np.float64), 0.0), dtype=self.dtype
        )
        hi_u = jnp.asarray(
            np.append(np.asarray(hi_per_var, np.float64), 0.0), dtype=self.dtype
        )
        st = uf.update_costs_per_var(self.geom, self.state, lo_u, hi_u)
        self.state = UniformState(
            st.lo,
            st.hi,
            st.def_mm,
            smooth_backward_all(self.geom, st.lo, st.hi, self._T()),
        )


@jax.jit
def _update_layer_costs_smooth(geom, state, dls, dhs, smoothing):
    from bdd_tpu.solver.smooth import bucket_smooth_backward_run

    lo_l, hi_l, cft_l = [], [], []
    for g, lo, hi, dl, dh in zip(geom.buckets, state.lo, state.hi, dls, dhs):
        nl = jnp.where(g.layer_valid, lo + dl, 0.0)
        nh = jnp.where(g.layer_valid, hi + dh, 0.0)
        lo_l.append(nl)
        hi_l.append(nh)
        cft_l.append(bucket_smooth_backward_run(g, nl, nh, smoothing))
    return UniformState(tuple(lo_l), tuple(hi_l), state.def_mm, tuple(cft_l))
