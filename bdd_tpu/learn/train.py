"""DOGE-style training loop: learn per-layer MMA parameters with a GNN.

TPU counterpart of DOGE/doge.py + train_doge.py: for each instance and each of
``nr_rounds`` dual rounds, the GNN reads solver-state features and predicts
per-layer (alpha, omega); the solver runs ``iters_per_round`` differentiable
iterations; the loss is the negated sum of per-BDD lower bounds after delta
distribution (doge.py:356-369), with gradients flowing only through the last
round(s) (doge.py:412-459). Optimizer: optax adam. Checkpointing via
flax serialization (orbax-free fallback).
"""
from __future__ import annotations

import dataclasses
import pickle
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bdd_tpu.learn import features as ft
from bdd_tpu.learn.model import DogePredictor
from bdd_tpu.solver import learned as ln
from bdd_tpu.solver import uniform as uf


@dataclasses.dataclass
class TrainConfig:
    """Hyperparameters (ref: DOGE/configs/defaults.py:26-108)."""

    dim: int = 32
    nr_rounds: int = 3  # dual rounds per instance per epoch
    iters_per_round: int = 5  # differentiable MMA iterations per round
    grad_rounds: int = 1  # rounds (from the end) contributing gradients
    lr: float = 1e-3
    epochs: int = 5
    smoothing: float = 1.0
    seed: int = 0
    use_lstm_var: bool = False  # per-variable LSTM over rounds (ref model.py:244-247)
    free_update: bool = False  # direct zero-sum dual step head (ref model.py:318-334)


class Instance:
    """A preprocessed training instance (pickled-solver analogue,
    ref: DOGE/data/ilp_converters.py create_bdd_repr)."""

    def __init__(self, host: uf.UniformHost, objective, dtype=jnp.float32):
        self.host = host
        self.objective = jnp.asarray(np.asarray(objective), dtype)
        self.spec = ft.graph_spec(host)
        self.state0 = uf.init_uniform_state(host, objective, dtype=dtype)

    @classmethod
    def from_ilp(cls, ilp, dtype=jnp.float32):
        from bdd_tpu.bdd.preprocessor import BddPreprocessor

        ilp.normalize()
        pre = BddPreprocessor(ilp)
        host = uf.flatten_uniform(
            pre.collection,
            pre.total_nr_variables(),
            pre.nr_primal_variables,
            dtype=dtype,
        )
        obj = pre.objective_vector()
        return cls(host, obj, dtype=dtype)

    @classmethod
    def from_ilps(cls, ilps, dtype=jnp.float32):
        """Batch several ILPs into ONE training instance (the reference
        concatenates layer ranges of several pickled solvers per batch,
        bdd_cuda_torch.py:102-133; here the batching is structural: disjoint
        variable spaces in one collection, so the GNN message passing and the
        delta exchange never mix instances and the loss is the sum of the
        per-instance dual losses)."""
        from bdd_tpu.utils.batching import BatchedInstances

        for ilp in ilps:
            ilp.normalize()
        bi = BatchedInstances(ilps)
        host = uf.flatten_uniform(
            bi.collection, bi.nr_vars, bi.nr_vars, dtype=dtype
        )
        return cls(host, bi.objective, dtype=dtype)


class ReplayBuffer:
    """Stores per-instance solver states keyed by round so later epochs can
    resume mid-trajectory (ref: DOGE/data/replay_buffer.py:3-26)."""

    def __init__(self, capacity_per_key: int = 4) -> None:
        self.capacity = capacity_per_key
        self._store: Dict[Tuple[int, int], List[Any]] = {}

    def add(self, instance_id: int, round_nr: int, state) -> None:
        lst = self._store.setdefault((instance_id, round_nr), [])
        lst.append(jax.tree.map(jax.lax.stop_gradient, state))
        if len(lst) > self.capacity:
            lst.pop(0)

    def sample(self, instance_id: int, round_nr: int, rng: np.random.RandomState):
        lst = self._store.get((instance_id, round_nr))
        if not lst:
            return None
        return lst[rng.randint(len(lst))]


class DogeTrainer:
    def __init__(self, config: TrainConfig = TrainConfig()):
        self.cfg = config
        self.model = DogePredictor(
            dim=config.dim,
            use_lstm_var=config.use_lstm_var,
            free_update=config.free_update,
        )
        self.params = None
        self.opt = optax.adam(config.lr)
        self.opt_state = None

    # ----------------------------------------------------------------- setup
    def _zero_lstm(self, instance: Instance):
        if not self.cfg.use_lstm_var:
            return None
        return self.model.zero_lstm_state(instance.spec.nr_vars)

    def init(self, instance: Instance) -> None:
        rng = jax.random.PRNGKey(self.cfg.seed)
        var_f, bdd_f, edge_f = ft.compute_features(
            instance.host, instance.spec, instance.state0, instance.objective,
            self.cfg.smoothing,
        )
        self.params = self.model.init(
            rng, instance.spec, var_f, bdd_f, edge_f,
            lstm_state=self._zero_lstm(instance),
        )
        self.opt_state = self.opt.init(self.params)

    # ------------------------------------------------------------- internals
    def _predict(self, params, instance: Instance, state, lstm=None):
        var_f, bdd_f, edge_f = ft.compute_features(
            instance.host, instance.spec, state, instance.objective,
            self.cfg.smoothing,
        )
        out = self.model.apply(
            params, instance.spec, var_f, bdd_f, edge_f, lstm_state=lstm
        )
        out = list(out)
        a_logits, o_logits = out[0], out[1]
        update = None
        if self.cfg.free_update:
            update = ft.split_like(instance.host, out[2])
        if self.cfg.use_lstm_var:
            lstm = out[-1]
        raw = ft.split_like(instance.host, jnp.exp(jnp.clip(a_logits, -10, 10)))
        alphas = ln.normalize_alpha(
            instance.host.geom,
            tuple(
                jnp.where(g.layer_valid, r, 0.0)
                for g, r in zip(instance.host.geom.buckets, raw)
            ),
        )
        omegas = tuple(
            jax.nn.sigmoid(o)
            for o in ft.split_like(instance.host, o_logits)
        )
        return alphas, omegas, update, lstm

    @staticmethod
    def _apply_free_update(state, update):
        """hi_costs += zero-sum-per-variable direct step (ref model.py:329).
        The per-variable net cost is unchanged, so the state stays a valid
        reparametrization of the same Lagrange dual."""
        if update is None:
            return state
        return state._replace(
            hi=tuple(h + u for h, u in zip(state.hi, update))
        )

    def _round_loss(self, params, instance: Instance, state, lstm=None):
        alphas, omegas, update, lstm = self._predict(
            params, instance, state, lstm
        )
        state = self._apply_free_update(state, update)
        loss = ln.dual_loss(
            instance.host.geom, state, alphas, omegas, self.cfg.iters_per_round
        )
        new_state = ln.learned_iterations(
            instance.host.geom, state, alphas, omegas, self.cfg.iters_per_round
        )
        return loss, new_state, lstm

    # ---------------------------------------------------------------- training
    def _get_jitted(self, instance: Instance):
        """Per-instance jitted (train_step, rollout_round) — the whole epoch
        body runs as one compiled program (eager flax on a remote backend
        triggers a remote compile per op)."""
        key = id(instance)
        cached = getattr(self, "_jit_cache", None)
        if cached is None:
            cached = self._jit_cache = {}
        if key in cached:
            return cached[key]
        cfg = self.cfg

        def step(params, opt_state, state0, lstm0):
            state, lstm = state0, lstm0
            for _ in range(cfg.nr_rounds - cfg.grad_rounds):
                _, state, lstm = self._round_loss(params, instance, state, lstm)
            state = jax.lax.stop_gradient(state)
            if lstm is not None:
                lstm = jax.lax.stop_gradient(lstm)

            def loss_fn(p):
                s, l = state, lstm
                total = 0.0
                for _ in range(cfg.grad_rounds):
                    loss, s, l = self._round_loss(p, instance, s, l)
                    total = total + loss
                return total

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return loss, params, opt_state

        def rollout_round(params, state, lstm):
            alphas, omegas, update, lstm = self._predict(
                params, instance, state, lstm
            )
            state = self._apply_free_update(state, update)
            state = ln.learned_iterations(
                instance.host.geom, state, alphas, omegas, cfg.iters_per_round
            )
            lb = uf.lower_bound_with_deferred(instance.host.geom, state)
            return state, lb, lstm

        fns = (jax.jit(step), jax.jit(rollout_round))
        cached[key] = fns
        return fns

    def train_step(self, instance: Instance) -> Dict[str, float]:
        """One epoch on one instance: advance rounds, backprop last rounds."""
        step, _ = self._get_jitted(instance)
        loss, self.params, self.opt_state = step(
            self.params, self.opt_state, instance.state0,
            self._zero_lstm(instance),
        )
        return {"loss": float(loss)}

    def run_learned_rounds(
        self, instance: Instance, nr_rounds: Optional[int] = None
    ) -> List[float]:
        """Inference: run rounds with the trained policy; returns the lb after
        each round (DualMetrics per-round lb, ref: DOGE/metrics/dual_metrics.py)."""
        _, rollout = self._get_jitted(instance)
        state = instance.state0
        lstm = self._zero_lstm(instance)
        lbs = []
        for _ in range(nr_rounds or self.cfg.nr_rounds):
            state, lb, lstm = rollout(self.params, state, lstm)
            lbs.append(float(lb))
        return lbs

    # ------------------------------------------------------------ checkpoints
    def save(self, path: str) -> None:
        from flax import serialization

        with open(path, "wb") as fh:
            pickle.dump(
                {
                    "config": dataclasses.asdict(self.cfg),
                    "params": serialization.to_bytes(self.params),
                },
                fh,
            )

    def load(self, path: str, example_instance: Instance) -> None:
        from flax import serialization

        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        self.cfg = TrainConfig(**blob["config"])
        self.model = DogePredictor(
            dim=self.cfg.dim,
            use_lstm_var=self.cfg.use_lstm_var,
            free_update=self.cfg.free_update,
        )
        self.init(example_instance)
        self.params = serialization.from_bytes(self.params, blob["params"])


def dual_metrics(lbs: List[float], reference_lb: float) -> Dict[str, Any]:
    """Per-round relative dual gap vs a reference bound
    (ref: DOGE/metrics/dual_metrics.py:7-119)."""
    gaps = [
        abs(reference_lb - lb) / max(abs(reference_lb), 1e-9) for lb in lbs
    ]
    return {"lb_per_round": lbs, "rel_gap_per_round": gaps, "final_gap": gaps[-1]}
