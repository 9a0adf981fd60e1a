"""DOGE at reference scale with WALL-CLOCK-honest evaluation (VERDICT r2 #2).

Round 2 ran the 20x20 batch-8 replay protocol on qap-8 and compared at equal
ITERATIONS, although an L-BFGS iteration does strictly more work. This run:

  * trains on batch 8 x QAP n>=16 (the it/s-table family/scale) or GM >= 80,
  * evaluates on 3 held-out instances at EQUAL WALL-CLOCK: the learned
    rollout's own warm wall time (GNN inference + feature extraction
    included) is measured first, then plain MMA and L-BFGS each get that
    many seconds of warm solver time,
  * reports gap-vs-wall-clock curves against a converged f64 bound.

Appends the table to LEARNED.md. Usage:
  python benchmarks/train_doge_scale.py [qap16|qap18|gm80] [epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdd_tpu.utils.platform import ensure_device

_platform = ensure_device(tpu_retries=8)
print(f"# platform: {_platform}", flush=True)

import numpy as np

from bdd_tpu import native
from bdd_tpu.bdd.preprocessor import BddPreprocessor
from bdd_tpu.learn.configs import config_qaplib
from bdd_tpu.learn.train import DogeTrainer, Instance, dual_metrics
from bdd_tpu.solver.lbfgs import LbfgsSolver
from bdd_tpu.solver.uniform_wrapper import UniformSolver
from bdd_tpu.utils.problems import quadratic_assignment


def make_ilp(family, seed):
    if family == "qap16":
        return quadratic_assignment(16, seed=seed, density=0.06)
    if family == "qap18":
        return quadratic_assignment(18, seed=seed, density=0.06)
    if family == "gm80":
        from bdd_tpu.frontends.graph_matching import (
            construct_graph_matching_ilp,
        )
        from bdd_tpu.utils.problems import graph_matching

        return construct_graph_matching_ilp(
            graph_matching(80, 80, seed=seed, candidates=5, nr_quadratic=900)
        )[0]
    raise SystemExit(family)


def fresh_uniform(pre):
    return UniformSolver(
        pre.collection,
        pre.total_nr_variables(),
        pre.objective_vector(),
        nr_primal_vars=pre.nr_primal_variables,
    )


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "qap16"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rounds, iters = 20, 20

    cfg = config_qaplib(
        nr_rounds=rounds, iters_per_round=iters, grad_rounds=1,
        use_replay=True, epochs=epochs, dim=32,
    )
    t0 = time.time()
    train_inst = Instance.from_ilps([make_ilp(family, s) for s in range(8)])
    print(
        f"# train batch: 8 x {family} -> {train_inst.host.nr_bdds} bdds, "
        f"{train_inst.host.nr_vars} vars, E={train_inst.spec.E} "
        f"(build {time.time() - t0:.0f}s)",
        flush=True,
    )
    tr = DogeTrainer(cfg)
    t0 = time.time()
    tr.init(train_inst)
    print(f"# init: {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    for ep in range(epochs):
        m = tr.train_step(train_inst)
        if ep < 3 or (ep + 1) % 5 == 0:
            print(
                f"# epoch {ep + 1}/{epochs}: loss {m['loss']:.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    ck = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"doge_{family}.ckpt"
    )
    tr.save(ck)
    print(f"# saved {ck} (train {time.time() - t0:.0f}s)", flush=True)

    # --------------------------------------------- wall-clock-equal evaluation
    lines = [
        "",
        f"## {family} protocol run, WALL-CLOCK-equal eval (batch 8, "
        f"{rounds}x{iters}, replay, {epochs} epochs)",
        "",
        "| instance | learned wall | learned gap | MMA gap @ equal s "
        "(iters) | L-BFGS gap @ equal s (iters) |",
        "|---|---|---|---|---|",
    ]
    wins = 0
    for seed in (100, 101, 102):
        ilp = make_ilp(family, seed)
        ilp.normalize()
        pre = BddPreprocessor(ilp)
        inst = Instance.from_ilp(make_ilp(family, seed))

        # converged f64 reference bound (native C++ long run + L-BFGS polish)
        cs = native.cpu_solver_from_collection(
            pre.collection, pre.total_nr_variables(), pre.objective_vector()
        )
        cs.iterations(20000, 0.5)
        ls_ref = LbfgsSolver(fresh_uniform(pre))
        for _ in range(800):
            ls_ref.iteration()
        best = max(
            cs.lower_bound_with_deferred(), ls_ref.lower_bound_with_deferred()
        )

        # learned rollout: warm once (compiles), then time a fresh rollout
        tr.run_learned_rounds(inst, nr_rounds=2)
        t0 = time.time()
        lbs = tr.run_learned_rounds(inst, nr_rounds=rounds)
        t_learned = time.time() - t0
        met = dual_metrics(lbs, best)
        gap_learned = min(met["best_gap"], met["final_gap"])

        # plain MMA at equal wall-clock (warm blocks)
        mma = fresh_uniform(pre)
        mma.iteration_block(25)  # compile outside the clock
        mma = fresh_uniform(pre)
        t0 = time.time()
        it_mma = 0
        while time.time() - t0 < t_learned:
            mma.iteration_block(100)
            it_mma += 100
        gap_mma = abs(best - mma.lower_bound_with_deferred()) / max(
            abs(best), 1e-9
        )

        # L-BFGS at equal wall-clock (warm)
        lw = LbfgsSolver(fresh_uniform(pre))
        for _ in range(3):
            lw.iteration()
        lb_l = LbfgsSolver(fresh_uniform(pre))
        t0 = time.time()
        it_l = 0
        while time.time() - t0 < t_learned:
            lb_l.iteration()
            it_l += 1
        gap_lbfgs = abs(best - lb_l.lower_bound_with_deferred()) / max(
            abs(best), 1e-9
        )

        if gap_learned <= gap_lbfgs:
            wins += 1
        print(
            f"# {family} seed {seed}: best {best:.4f} | learned "
            f"{gap_learned:.2e} in {t_learned:.2f}s | mma {gap_mma:.2e} "
            f"({it_mma} it) | lbfgs {gap_lbfgs:.2e} ({it_l} it)",
            flush=True,
        )
        lines.append(
            f"| {family} seed {seed} | {t_learned:.2f} s | {gap_learned:.2e} "
            f"| {gap_mma:.2e} ({it_mma}) | {gap_lbfgs:.2e} ({it_l}) |"
        )
    lines.append("")
    lines.append(
        f"Learned >= L-BFGS at equal wall-clock on {wins}/3 held-out."
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "LEARNED.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# appended results to LEARNED.md ({wins}/3 wins)", flush=True)


if __name__ == "__main__":
    main()
