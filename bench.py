"""Benchmark: dual MMA iterations/s of the TPU dense hop-scan backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline proxy: the numpy oracle solver (vectorized equivalent of the
reference's parallel CPU MMA, bdd_parallel_mma_base.cpp) on the same instance
and iteration count — the reference's own GPU speedup claim is measured against
its CPU solver (README.md FastDOG [2]). vs_baseline = tpu_iters_per_s /
cpu_ref_iters_per_s.

Instance: grid MRF local-polytope relaxation (color-seg style, SURVEY.md §6)
sized to exercise thousands of BDDs batched per hop.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    from bdd_tpu.utils.platform import ensure_device

    print(f"# platform: {ensure_device(tpu_retries=8)}", file=sys.stderr)

    from bdd_tpu.bdd.preprocessor import BddPreprocessor
    from bdd_tpu.solver import uniform as js_uf
    from bdd_tpu.solver.flatten import densify, flatten_collection
    from bdd_tpu.solver.ref_solver import RefSolver
    from bdd_tpu.utils.problems import grid_mrf

    rows, cols, labels = 12, 12, 4
    block = 50
    n_blocks = 4
    n_iters = block * n_blocks
    t0 = time.time()
    ilp = grid_mrf(rows, cols, labels, seed=0)
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    flat = flatten_collection(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    dense = densify(flat)
    build_s = time.time() - t0
    print(
        f"# instance: {flat.nr_bdds} bdds, {flat.nr_nodes} nodes, "
        f"{flat.nr_layers} layers, H={flat.nr_hops} W={dense.W} L={dense.L}, "
        f"build {build_s:.1f}s",
        file=sys.stderr,
    )

    host = js_uf.flatten_uniform(
        pre.collection, pre.total_nr_variables(), pre.nr_primal_variables
    )
    geom = host.geom
    state = js_uf.init_uniform_state(host, pre.objective_vector())

    def sync(s):
        # the axon remote backend is lazy: block_until_ready returns before
        # execution; pulling a scalar to host forces the queue to drain
        return float(s.lo[0][0, 0])

    # warm-up / compile (same block size as the timed loop -> one executable);
    # the remote tunnel occasionally wedges after unrelated killed clients, so
    # retry the timed section once
    for attempt in range(2):
        try:
            t0 = time.time()
            warm = js_uf.iterations(geom, state, block, 0.5)
            sync(warm)
            print(f"# compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

            t0 = time.time()
            out = warm
            for _ in range(n_blocks):
                out = js_uf.iterations(geom, out, block, 0.5)
            sync(out)
            tpu_time = time.time() - t0
            break
        except Exception as e:  # pragma: no cover - tunnel flake path
            if attempt == 1:
                raise
            print(f"# retrying after error: {e}", file=sys.stderr)
            time.sleep(5)
    tpu_ips = n_iters / tpu_time
    t0 = time.time()
    lb = float(js_uf.lower_bound_with_deferred(geom, out))
    print(f"# lb compile+eval: {time.time() - t0:.1f}s", file=sys.stderr)
    print(
        f"# tpu: {n_iters} iters in {tpu_time:.2f}s = {tpu_ips:.1f} it/s, lb={lb:.4f}",
        file=sys.stderr,
    )

    # CPU reference-baseline proxy (numpy oracle = reference parallel CPU MMA)
    ref = RefSolver(flat, pre.objective_vector(), dtype=np.float64)
    n_ref = 10
    t0 = time.time()
    for _ in range(n_ref):
        ref.iteration(0.5)
    ref_time = time.time() - t0
    ref_ips = n_ref / ref_time
    print(
        f"# cpu ref: {n_ref} iters in {ref_time:.2f}s = {ref_ips:.1f} it/s, "
        f"lb={ref.lower_bound_with_deferred():.4f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "dual MMA iterations/s (grid MRF 12x12x4 local polytope)",
                "value": round(tpu_ips, 2),
                "unit": "iterations/s",
                "vs_baseline": round(tpu_ips / ref_ips, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
