"""L-BFGS outer loop maximizing the Lagrange dual.

Faithful port of the reference's templated lbfgs wrapper (include/bdd_solver/
lbfgs.h:22-33, src/bdd_solver/lbfgs_impl.h; algorithm of Roetzer et al. 2023):

  x      = per-layer net solver costs (hi - lo + deferred share)
  grad f = per-BDD argmin solutions in {0,1} (a supergradient of the dual)
  history of (s = x_k - x_{k-1}, y = grad_{k-1} - grad_k, rho_inv = s.y),
  curvature skip when rho_inv <= 1e-8; two-loop recursion with initial
  Hessian-diagonal scaling rho_inv_last / |y_last|^2; the direction is
  zero-sum-projected per primal variable (make_dual_feasible) and applied to
  the hi costs with an adaptive step-size search (up to 6 trials, geometric
  decrease on failure / increase on weak success); falls back to plain MMA
  iterations until the history is full or after repeated failures.

Host-side control flow orchestrating jitted device primitives.
"""
from __future__ import annotations

import collections
from typing import Any, Deque, NamedTuple

import jax
import jax.numpy as jnp

from bdd_tpu.solver import jax_solver as js
from bdd_tpu.solver.wrapper import JaxSolver


def _tree_vdot(a, b) -> float:
    return float(
        sum(jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))
    )


def _tree_axpy(alpha, x, y):
    """y + alpha * x over pytrees."""
    return jax.tree.map(lambda xx, yy: yy + alpha * xx, x, y)


class _Ops:
    """Backend dispatch: dense JaxSolver vs uniform bucketed solver vs the
    mesh-sharded solver (stacked pytrees; global reductions via psum)."""

    def __init__(self, base) -> None:
        self.base = base
        self.dense = isinstance(base, JaxSolver)
        self.sharded = hasattr(base, "state_stacked")

    def grad(self):
        if self.dense:
            sol = js.bdds_solution(self.base.geom, self.base.state.lo, self.base.state.hi)
            return jnp.where(
                self.base.geom.layer_valid,
                sol.astype(self.base.state.lo.dtype),
                0.0,
            )
        if self.sharded:
            b = self.base
            sols = b._sols(b.geom_stacked, b.state_stacked)
            return tuple(
                s.astype(l.dtype)
                for s, l in zip(sols, b.state_stacked.lo)
            )
        from bdd_tpu.solver import uniform as uf

        sols = uf.bdds_solution(self.base.geom, self.base.state)
        return tuple(
            s.astype(l.dtype) for s, l in zip(sols, self.base.state.lo)
        )

    def net_costs(self):
        if self.dense:
            return js.net_solver_costs(self.base.geom, self.base.state)
        if self.sharded:
            b = self.base
            return b._netc(b.geom_stacked, b.state_stacked)
        from bdd_tpu.solver import uniform as uf

        return uf.net_solver_costs(self.base.geom, self.base.state)

    def make_dual_feasible(self, g):
        if self.dense:
            return js.make_dual_feasible(self.base.geom, g)
        if self.sharded:
            b = self.base
            return b._feas(b.geom_stacked, g)
        from bdd_tpu.solver import uniform as uf

        return uf.make_dual_feasible(self.base.geom, g)

    def gradient_step(self, g, step):
        if self.dense:
            self.base.state = js.gradient_step(self.base.geom, self.base.state, g, step)
        elif self.sharded:
            b = self.base
            b.state_stacked = b._gstep(
                b.geom_stacked, b.state_stacked, g, step
            )
        else:
            from bdd_tpu.solver import uniform as uf

            self.base.state = uf.gradient_step(self.base.geom, self.base.state, g, step)


class _HistEntry(NamedTuple):
    s: Any  # pytree of per-layer arrays
    y: Any
    rho_inv: float


class LbfgsSolver:
    """Wraps a JaxSolver; duck interface compatible with run_solver/rounding."""

    default_block_size = 1  # outer iterations need host control flow

    def __init__(
        self,
        base: JaxSolver,
        history_size: int = 5,
        init_step_size: float = 1e-6,
        required_relative_lb_increase: float = 1e-6,
        step_size_decrease_factor: float = 0.8,
        step_size_increase_factor: float = 1.1,
    ) -> None:
        self.base = base
        self.f = base.f
        self.m = history_size
        self.step_size = init_step_size
        self.req_rel_lb_increase = required_relative_lb_increase
        self.dec = step_size_decrease_factor
        self.inc = step_size_increase_factor
        self.history: Deque[_HistEntry] = collections.deque()
        self.ops = _Ops(base)
        self.prev_x = None
        self.prev_grad = None
        self.num_unsuccessful = 0
        self.lb_history: list = []

    # ----------------------------------------------------------- base passthru
    def lower_bound(self) -> float:
        return self.base.lower_bound()

    def lower_bound_with_deferred(self) -> float:
        return self.base.lower_bound_with_deferred()

    def min_marginals(self):
        return self.base.min_marginals()

    def distribute_delta(self) -> None:
        self.base.distribute_delta()

    def update_costs(self, lo_per_var, hi_per_var) -> None:
        self._flush()
        self.base.update_costs(lo_per_var, hi_per_var)

    def _flush(self) -> None:
        self.history.clear()
        self.prev_x = None
        self.prev_grad = None
        self.num_unsuccessful = 0

    # -------------------------------------------------------------- lbfgs core
    def _grad(self):
        return self.ops.grad()

    def _store_iterate(self, cur_grad) -> None:
        cur_x = self.ops.net_costs()
        if self.prev_x is not None:
            s = jax.tree.map(lambda a, b: a - b, cur_x, self.prev_x)
            y = jax.tree.map(lambda a, b: a - b, self.prev_grad, cur_grad)
            rho_inv = _tree_vdot(s, y)
            if rho_inv > 1e-8:
                self.history.append(_HistEntry(s, y, rho_inv))
                if len(self.history) > self.m:
                    self.history.popleft()
        self.prev_x = cur_x
        self.prev_grad = cur_grad

    def _update_possible(self) -> bool:
        return len(self.history) >= self.m and self.num_unsuccessful <= 5

    def _compute_direction(self, cur_grad):
        """Two-loop recursion (lbfgs_impl.h:227-316); gradients negated
        implicitly by the y convention (maximization)."""
        d = cur_grad
        alphas = []
        for h in reversed(self.history):
            a = _tree_vdot(h.s, d) / h.rho_inv
            alphas.append(a)
            d = _tree_axpy(-a, h.y, d)
        alphas.reverse()
        last = self.history[-1]
        y_norm = _tree_vdot(last.y, last.y)
        h0 = last.rho_inv / (1e-8 + y_norm)
        # r = H0 * q between the loops (lbfgs_impl.h / Nocedal alg. 7.4) —
        # scaling only the oldest entry's rho instead mis-weights every
        # curvature correction and leaves the raw-gradient component
        # unscaled, degrading toward mis-scaled supergradient ascent
        d = jax.tree.map(lambda x: h0 * x, d)
        for i, h in enumerate(self.history):
            rho = 1.0 / h.rho_inv
            beta = rho * _tree_vdot(h.y, d)
            d = _tree_axpy(alphas[i] - beta, h.s, d)
        return d

    def _search_step_size_and_apply(self, direction: jnp.ndarray) -> None:
        lb_pre = self.base.lower_bound()

        def rel_change() -> float:
            cur = self.base.lower_bound() - lb_pre
            if len(self.lb_history) >= self.m:
                past = self.lb_history[-(self.m - 1)] - self.lb_history[-self.m]
            else:
                past = 0.0
            return cur / (1e-9 + max(past, 0.0))

        prev_step = 0.0

        def apply(step: float) -> None:
            nonlocal prev_step
            net = step - prev_step
            if net != 0.0:
                self.ops.gradient_step(direction, net)
            prev_step = step

        num_updates = 0
        best_step, best_rel = 0.0, 0.0
        while True:
            apply(self.step_size)
            cur_rel = rel_change()
            if best_rel < cur_rel:
                best_rel, best_step = cur_rel, self.step_size
            if cur_rel <= 0.0:
                self.step_size *= self.dec
            elif cur_rel < self.req_rel_lb_increase:
                self.step_size *= self.inc
            if num_updates > 5:
                if best_rel > self.req_rel_lb_increase / 10.0:
                    apply(best_step)
                else:
                    apply(0.0)
                    self.num_unsuccessful += 1
                return
            num_updates += 1
            if cur_rel >= self.req_rel_lb_increase:
                break
        if num_updates == 1 and self.num_unsuccessful == 0:
            self.step_size *= self.inc
        self.num_unsuccessful = 0

    # --------------------------------------------------------------- iteration
    def iteration(self) -> None:
        if self.num_unsuccessful > 5:
            # permanently disabled after repeated failed step searches
            # (ref lbfgs_impl.h:410-419): plain MMA, without paying the
            # gradient/net-cost/history machinery every iteration
            self.base.iteration()
            return
        if not self.lb_history:
            self.lb_history.append(self.base.lower_bound())
        cur_grad = self._grad()
        self._store_iterate(cur_grad)
        if self._update_possible():
            d = self._compute_direction(cur_grad)
            d = self.ops.make_dual_feasible(d)
            self._search_step_size_and_apply(d)
            self.base.iteration()
        else:
            self.base.iteration()
        self.lb_history.append(self.base.lower_bound())
