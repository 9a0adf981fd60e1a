"""Top-level solver pipeline + CLI.

JSON-config compatible with the reference schema (README.md:24-76; pipeline
bdd_solver.h:37-43 / src/bdd_solver/bdd_solver.cpp):

    read ILP -> variable reorder -> normalize -> ILP->BDD -> dual solver ->
    perturbation rounding.

Relaxation solver names (reference names map to TPU backends):
    "sequential mma" / "parallel mma"      -> numpy oracle backend (host)
    "cuda parallel mma" / "jax mma" / "mma" -> JAX dense-scan backend (TPU)
"""
from __future__ import annotations

import json
import math
import sys
from typing import Dict, Optional

import numpy as np

from bdd_tpu.bdd.preprocessor import BddPreprocessor, InfeasibleError
from bdd_tpu.ilp.lp_parser import parse_lp_file, parse_lp_string
from bdd_tpu.solver.flatten import flatten_collection
from bdd_tpu.solver.ref_solver import RefSolver
from bdd_tpu.solver.rounding import incremental_mm_rounding
from bdd_tpu.solver.run import run_solver
from bdd_tpu.solver.wrapper import JaxSolver
from bdd_tpu.utils.logging import bdd_log

DEFAULT_CONFIG = {
    "variable order": "input",  # input|bfs|minimum degree|cuthill
    "normalize constraints": True,
    "precision": "double",  # float|double
    "relaxation solver": "uniform mma",
    "split chunk size": None,  # cap BDD depth (sequence parallelism)
    "termination criteria": {
        "maximum iterations": 1000,
        "improvement slope": 1e-6,
        "minimum improvement": 1e-9,
        "time limit": 3600,
    },
    "perturbation rounding": {
        "initial perturbation": math.inf,
        "perturbation growth rate": 1.1,
        "inner iterations": 100,
        "outer iterations": 100,
    },
}


def _merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            out[k] = _merge(base[k], v)
        else:
            out[k] = v
    return out


class BddSolver:
    """The orchestration class (ref: include/bdd_solver/bdd_solver.h:45-103)."""

    def __init__(self, config: Optional[dict] = None, **kwargs) -> None:
        config = _merge(DEFAULT_CONFIG, config or {})
        config = _merge(config, kwargs)
        self.config = config
        self.ilp = None
        self.solver = None
        self.infeasible = False

    # ------------------------------------------------------------------ input
    def read_ilp(self, ilp=None, path: Optional[str] = None, lp_string: Optional[str] = None):
        if ilp is not None:
            self.ilp = ilp
        elif lp_string is not None:
            self.ilp = parse_lp_string(lp_string)
        elif path is not None:
            if path.endswith(".opb"):
                from bdd_tpu.ilp.opb_parser import parse_opb_file

                self.ilp = parse_opb_file(path)
            else:
                self.ilp = parse_lp_file(path)
        else:
            path = self.config.get("input")
            if path is None:
                raise ValueError("no input given")
            return self.read_ilp(path=path)
        return self

    def process_ilp(self):
        order = self.config["variable order"]
        if order == "bfs":
            self.ilp.reorder_bfs()
        elif order == "cuthill":
            self.ilp.reorder_cuthill_mckee()
        elif order in ("minimum degree", "mindegree"):
            self.ilp.reorder_minimum_degree()
        elif order != "input":
            raise ValueError(f"unknown variable order {order!r}")
        if self.config["normalize constraints"]:
            self.ilp.normalize()
        return self

    def transform_to_bdds(self):
        self.pre = BddPreprocessor(
            self.ilp, split_chunk_size=self.config["split chunk size"]
        )
        self.flat = flatten_collection(
            self.pre.collection,
            self.pre.total_nr_variables(),
            self.pre.nr_primal_variables,
        )
        bdd_log(
            f"[bdd solver] {self.flat.nr_bdds} BDDs, {self.flat.nr_nodes} nodes, "
            f"{self.flat.nr_layers} layers, {self.flat.nr_hops} hops, "
            f"{self.flat.nr_vars} variables"
        )
        return self

    def construct_solver(self):
        name = self.config["relaxation solver"]
        double = self.config["precision"] == "double"
        obj = self.pre.objective_vector()
        if name in ("sequential mma", "parallel mma", "ref mma"):
            self.solver = RefSolver(
                self.flat, obj, dtype=np.float64 if double else np.float32
            )
        elif name in ("cuda parallel mma", "jax mma", "mma", "uniform mma",
                      "lbfgs parallel mma", "lbfgs cuda parallel mma",
                      "lbfgs jax mma", "subgradient", "dense mma"):
            import jax.numpy as jnp

            if double:
                import jax

                jax.config.update("jax_enable_x64", True)
            dt = jnp.float64 if double else jnp.float32
            if name == "dense mma" or name.startswith("lbfgs") or name == "subgradient":
                # outer loops need the dense backend's solution primitives
                base = JaxSolver(self.flat, obj, dtype=dt)
            else:
                from bdd_tpu.solver.uniform_wrapper import UniformSolver

                base = UniformSolver(
                    self.pre.collection,
                    self.pre.total_nr_variables(),
                    obj,
                    nr_primal_vars=self.pre.nr_primal_variables,
                    dtype=dt,
                )
            if name.startswith("lbfgs"):
                from bdd_tpu.solver.lbfgs import LbfgsSolver

                base = LbfgsSolver(base, **self.config.get("lbfgs", {}))
            elif name == "subgradient":
                from bdd_tpu.solver.subgradient import SubgradientSolver

                base = SubgradientSolver(base)
            self.solver = base
        else:
            raise ValueError(f"unknown relaxation solver {name!r}")
        return self

    # ------------------------------------------------------------------ solve
    def solve_dual(self, verbose: bool = True) -> float:
        t = self.config["termination criteria"]
        lb = run_solver(
            self.solver,
            max_iter=t["maximum iterations"],
            tolerance=t["minimum improvement"],
            improvement_slope=t["improvement slope"],
            time_limit=t["time limit"],
            verbose=verbose,
            block_size=getattr(self.solver, "default_block_size", 1),
        )
        if math.isinf(lb):
            self.infeasible = True
        return lb

    def round(self, verbose: bool = True) -> Optional[np.ndarray]:
        p = self.config["perturbation rounding"]
        sol = incremental_mm_rounding(
            self.solver,
            init_delta=p["initial perturbation"],
            delta_growth_rate=p["perturbation growth rate"],
            num_itr_lb=p["inner iterations"],
            num_rounding_itr=p["outer iterations"],
            verbose=verbose,
        )
        if sol is None:
            return None
        return sol[: self.ilp.nr_variables()]

    def solve(self, verbose: bool = True) -> Dict:
        """Full pipeline; returns result dict."""
        if self.ilp is None:
            self.read_ilp()
        self.process_ilp()
        try:
            self.transform_to_bdds()
        except InfeasibleError:
            return {"status": "infeasible", "lower_bound": math.inf}
        self.construct_solver()
        lb = self.solve_dual(verbose=verbose)
        if self.infeasible:
            return {"status": "infeasible", "lower_bound": math.inf}
        lb = self.solver.lower_bound_with_deferred() if hasattr(
            self.solver, "lower_bound_with_deferred"
        ) else lb
        sol = self.round(verbose=verbose)
        result = {"status": "solved", "lower_bound": float(lb)}
        if sol is not None:
            x = [int(v) for v in sol]
            result["solution"] = {
                self.ilp.get_var_name(i): x[i] for i in range(self.ilp.nr_variables())
            }
            result["objective"] = float(self.ilp.evaluate(x))
        return result


def main(argv=None) -> int:
    """CLI: ``python -m bdd_tpu.api config.json`` (ref: bdd_solver_cl.cpp)."""
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: python -m bdd_tpu.api <config.json | problem.lp>")
        return 1
    arg = argv[0]
    if arg.endswith(".json"):
        with open(arg) as fh:
            config = json.load(fh)
        solver = BddSolver(config)
    else:
        solver = BddSolver({"input": arg})
    result = solver.solve()
    bdd_log(json.dumps(result, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
