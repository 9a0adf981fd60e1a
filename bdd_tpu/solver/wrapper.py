"""JaxSolver — object wrapper over the functional JAX backend.

Shares the duck interface of RefSolver (iteration / lower_bound /
min_marginals / update_costs / distribute_delta / ...), so the run loop,
rounding and outer solvers work with either backend. Analogue of the
reference's bdd_cuda_parallel_mma class (include/bdd_solver/bdd_cuda_parallel_mma.h).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bdd_tpu.solver import jax_solver as js
from bdd_tpu.solver.flatten import DenseBdds, FlatBdds, densify

INF = np.inf


class JaxSolver:
    default_block_size = 10

    def __init__(
        self,
        flat: FlatBdds,
        objective,
        dtype=jnp.float32,
        omega: float = 0.5,
        dense: Optional[DenseBdds] = None,
    ) -> None:
        self.f = flat
        self.dense = dense if dense is not None else densify(flat)
        self.geom = js.geom_from_dense(self.dense, dtype=dtype)
        self.state = js.init_state(self.geom, self.dense, objective, dtype=dtype)
        self.omega = omega
        self.dtype = dtype

    # ------------------------------------------------------------------- dual
    def iteration(self) -> None:
        self.state = js.iteration(self.geom, self.state, self.omega)

    def iteration_block(self, n: int) -> None:
        self.state = js.iterations(self.geom, self.state, n, self.omega)

    def lower_bound(self) -> float:
        return float(js.lower_bound_from_cft(self.geom, self.state.cft))

    def lower_bound_with_deferred(self) -> float:
        return float(js.lower_bound_with_deferred(self.geom, self.state))

    def lower_bound_per_bdd(self) -> np.ndarray:
        per_slot = np.asarray(js.lower_bound_per_root_slot(self.geom, self.state.cft))
        return per_slot[self.dense.root_slot_bdd]

    # -------------------------------------------------------------- marginals
    def min_marginals(self) -> Tuple[np.ndarray, np.ndarray]:
        m0d, m1d = js.min_marginals(self.geom, self.state.lo, self.state.hi, self.state.cft)
        m0 = np.full(self.f.nr_layers, INF)
        m1 = np.full(self.f.nr_layers, INF)
        mask = self.dense.flat_layer_index >= 0
        idx = self.dense.flat_layer_index[mask]
        m0[idx] = np.asarray(m0d)[mask]
        m1[idx] = np.asarray(m1d)[mask]
        return m0, m1

    # ------------------------------------------------------------------ costs
    def distribute_delta(self) -> None:
        self.state = js.distribute_delta(self.geom, self.state)

    def update_costs(self, lo_per_var, hi_per_var) -> None:
        lo_u = jnp.asarray(np.append(np.asarray(lo_per_var, dtype=np.float64), 0.0), dtype=self.dtype)
        hi_u = jnp.asarray(np.append(np.asarray(hi_per_var, dtype=np.float64), 0.0), dtype=self.dtype)
        self.state = _dense_update_costs(self.geom, self.state, lo_u, hi_u)

    def get_flat_costs(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        lo = self.dense.unpack_costs(np.asarray(self.state.lo), self.f.nr_layers)
        hi = self.dense.unpack_costs(np.asarray(self.state.hi), self.f.nr_layers)
        mm = self.dense.unpack_costs(np.asarray(self.state.def_mm), self.f.nr_layers)
        return lo, hi, mm

    def set_flat_costs(self, lo, hi, def_mm=None) -> None:
        lo_d = jnp.asarray(self.dense.pack_costs(np.asarray(lo, np.float64)), self.dtype)
        hi_d = jnp.asarray(self.dense.pack_costs(np.asarray(hi, np.float64)), self.dtype)
        mm_d = (
            jnp.asarray(self.dense.pack_costs(np.asarray(def_mm, np.float64)), self.dtype)
            if def_mm is not None
            else jnp.zeros_like(self.state.def_mm)
        )
        cft = js._backward_run_jit(self.geom, lo_d, hi_d)
        self.state = js.SolverState(lo=lo_d, hi=hi_d, def_mm=mm_d, cft=cft)


@jax.jit
def _dense_update_costs(geom, state, lo_u, hi_u):
    lv = geom.layer_var
    lo = state.lo + geom.alpha * lo_u[lv]
    hi = state.hi + geom.alpha * hi_u[lv]
    cft = js.backward_run(geom, lo, hi)
    return state._replace(lo=lo, hi=hi, cft=cft)
