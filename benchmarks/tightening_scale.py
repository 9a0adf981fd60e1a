"""Cut tightening at benchmark scale: gap closed vs meld budget.

The reference intends tightening for the GM/QAP families
(include/bdd_tightening.h:168-274, experimental there). Protocol: solve the
LP relaxation to near-convergence, round a primal solution (upper bound),
meld BDD groups around tight variables under a node budget, re-solve, and
report the integrality gap closed: (lb_after - lb_before) / (ub - lb_before).

Usage: python benchmarks/tightening_scale.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdd_tpu.utils.platform import ensure_device

print(f"# platform: {ensure_device(tpu_retries=8)}", flush=True)

import numpy as np

from bdd_tpu.bdd.preprocessor import BddPreprocessor
from bdd_tpu.solver.rounding_device import incremental_rounding_device
from bdd_tpu.solver.run import run_solver
from bdd_tpu.solver.tighten import tight_variables, tighten_collection
from bdd_tpu.solver.uniform_wrapper import UniformSolver
from bdd_tpu.utils.problems import graph_matching, quadratic_assignment


def solve(col, nr_vars, obj, nr_primal, iters):
    s = UniformSolver(col, nr_vars, obj, nr_primal_vars=nr_primal)
    run_solver(s, max_iter=iters, verbose=False,
               block_size=s.default_block_size)
    s.distribute_delta()
    return s


def upper_bound(s, pre, ilp):
    """Rounded primal objective (+inf when rounding fails)."""
    try:
        sol = incremental_rounding_device(s)
        if sol is None:
            return float("inf")
        x = np.asarray(sol)[: ilp.nr_variables()]
        return float(ilp.evaluate([int(v) for v in x]))
    except Exception as e:
        print(f"#   rounding failed: {e}", flush=True)
        return float("inf")


def run(name, ilp, iters=2000, budgets=(20000, 200000)):
    t0 = time.time()
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    col = pre.collection
    nv, npv = pre.total_nr_variables(), pre.nr_primal_variables
    obj = pre.objective_vector()
    s = solve(col, nv, obj, npv, iters)
    lb0 = s.lower_bound_with_deferred()
    ub = upper_bound(s, pre, ilp)
    print(
        f"[{name}] bdds={col.nr_bdds()} lb={lb0:.4f} ub={ub:.4f} "
        f"(base solve {time.time()-t0:.0f}s)",
        flush=True,
    )
    m0, m1 = s.min_marginals()
    tv = tight_variables(s.f, m0, m1)
    print(f"[{name}] tight vars: {len(tv)} / {nv}", flush=True)
    for budget in budgets:
        t0 = time.time()
        new_col, _, groups = tighten_collection(
            col, tv, node_limit=budget
        )
        melded = sum(1 for g in groups if len(g) > 1)
        t_meld = time.time() - t0
        t0 = time.time()
        s2 = solve(new_col, nv, obj, npv, iters)
        lb1 = s2.lower_bound_with_deferred()
        closed = (
            (lb1 - lb0) / (ub - lb0) if np.isfinite(ub) and ub > lb0 else
            float("nan")
        )
        print(
            f"[{name}] budget {budget}: {melded} groups melded, "
            f"bdds {col.nr_bdds()} -> {new_col.nr_bdds()}, "
            f"lb {lb0:.4f} -> {lb1:.4f} "
            f"(gap closed {100*closed:.1f}%), meld {t_meld:.1f}s "
            f"re-solve {time.time()-t0:.0f}s",
            flush=True,
        )


def main():
    from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp

    run("qap-8", quadratic_assignment(8, seed=0, density=0.3))
    run("qap-12", quadratic_assignment(12, seed=0, density=0.15))
    gm = construct_graph_matching_ilp(
        graph_matching(40, 40, seed=0, candidates=5, nr_quadratic=400)
    )[0]
    run("graph-matching-40", gm)


if __name__ == "__main__":
    main()
