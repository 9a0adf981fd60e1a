"""Quantitative multi-chip scaling projection (VERDICT r2 #5).

Only one physical chip is reachable in this environment, so hardware scaling
cannot be measured directly. This benchmark removes everything speculative
except the collective itself:

  1. measure the single-chip full iteration T1 on the real chip;
  2. build the REAL per-shard geometries for D = 2/4/8 shards
     (uniform_sharded.build_shard_geoms — the exact arrays the mesh would
     run, incl. the globally-shaped exchange plans) and measure ONE shard's
     per-iteration compute on the real chip (shapes are identical across
     shards by construction, so shard 0 is representative of every shard);
  3. model ONLY the two per-iteration psums from the exact payload bytes
     (the stacked [Vp + sum(nv), 2] per-variable delta) and published
     v5e link bandwidths.

Projected iteration time at D chips:
  T_D = T_shard(D) + 2 * t_psum(S, D)
  t_psum = 2*S*(D-1)/D / BW_ICI + (D-1) * LAT_HOP        (1-D ring, ICI)
  2-host row: + 2*S / BW_DCN + LAT_DCN on the host-boundary step.

Assumptions (stated, conservative):
  BW_ICI = 45 GB/s one-way per link (v5e ICI, 1600 Gbps aggregate over 4
  links / 2 axes; jax-ml.github.io/scaling-book lists 4.5e10 B/s one-way),
  LAT_HOP = 1 us per ring step, BW_DCN = 25 GB/s per host, LAT_DCN = 10 us.

Usage: python benchmarks/multichip_projection.py [families...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdd_tpu.utils.platform import ensure_device

_platform = ensure_device(tpu_retries=8)
print(f"# platform: {_platform}", flush=True)

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bdd_tpu.solver import uniform as uf
from bdd_tpu.solver import uniform_sharded as us

BW_ICI = 45e9  # one-way bytes/s per v5e ICI link
LAT_HOP = 1e-6
BW_DCN = 25e9
LAT_DCN = 10e-6


def build(which: str):
    from bdd_tpu.bdd.preprocessor import BddPreprocessor
    from bdd_tpu.utils.problems import grid_mrf, quadratic_assignment

    if which == "gm50k":
        from bdd_tpu import native
        from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp
        from bdd_tpu.utils.problems import graph_matching

        inst = graph_matching(120, 120, seed=0, candidates=6, nr_quadratic=2000)
        gm_ilp = construct_graph_matching_ilp(inst)[0]
        nh = native.NativeHost(gm_ilp.write_lp(), "bfs")
        # rebuild the collection python-side for the shard splitter
        ilp = gm_ilp
        ilp.reorder_bfs()
        ilp.normalize()
        pre = BddPreprocessor(ilp)
        return pre, 600
    if which == "grid12":
        ilp = grid_mrf(12, 12, 4, seed=0)
        n = 4000
    elif which == "grid24":
        ilp = grid_mrf(24, 24, 8, seed=0)
        n = 600
    elif which == "grid32":
        ilp = grid_mrf(32, 32, 12, seed=0)
        n = 100
    elif which == "qap18":
        ilp = quadratic_assignment(18, seed=0, density=0.06)
        n = 2000
    else:
        raise SystemExit(f"unknown instance {which}")
    ilp.reorder_bfs()
    ilp.normalize()
    pre = BddPreprocessor(ilp)
    return pre, n


def time_iteration(geom, state, n, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(s, n):
        def body(s, _):
            return uf.iteration(geom, s), ()

        s, _ = jax.lax.scan(body, s, None, length=n)
        return s

    out = run(state, n)
    float(out.lo[0][0, 0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = run(out, n)
        float(out.lo[0][0, 0])
        ts.append((time.time() - t0) / n)
    return float(np.median(ts))


def payload_bytes(plan, V):
    if plan is None:
        return (V + 1) * 2 * 4
    if plan.split_len or plan.class_shared_counts:
        # split: shared lights + shared class totals ride the psum
        return (plan.split_len + sum(plan.class_shared_counts)) * 2 * 4
    if plan.Vg:  # windowed: the psum rides the [2, Vg] global vector
        return plan.Vg * 2 * 4
    s = plan.Vp + sum(nv for _, _, nv in plan.classes)
    return s * 2 * 4


def t_psum_ici(S, D):
    return 2 * S * (D - 1) / D / BW_ICI + (D - 1) * LAT_HOP


def t_psum_2host(S, D):
    # ring with one DCN boundary: ICI for the intra-host steps plus one
    # reduce-scatter + all-gather crossing of the full payload over DCN
    return t_psum_ici(S, D) + 2 * S / BW_DCN + LAT_DCN


def main() -> int:
    # --partition=block|mincut|auto|both (both: one row per partition mode,
    # for the VERDICT r4 #4 A/B on the quadratically-coupled families)
    partition = "auto"
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--partition="):
            partition = a.split("=", 1)[1]
        else:
            args.append(a)
    families = args or ["grid12", "qap18", "grid24", "gm50k"]
    modes = ["block", "mincut"] if partition == "both" else [partition]
    print(
        f"# model: BW_ICI={BW_ICI/1e9:.0f} GB/s  LAT_HOP={LAT_HOP*1e6:.0f} us  "
        f"BW_DCN={BW_DCN/1e9:.0f} GB/s  LAT_DCN={LAT_DCN*1e6:.0f} us",
        flush=True,
    )
    for which in families:
        pre, n = build(which)
        V = pre.total_nr_variables()
        host = uf.flatten_uniform(pre.collection, V, pre.nr_primal_variables)
        obj = pre.objective_vector()
        state = uf.init_uniform_state(host, obj)
        T1 = time_iteration(host.geom, state, n)
        E1 = sum(g.H * g.B for g in host.geom.buckets)
        plan1 = host.geom.exchange
        print(
            f"## {which}: V={V} E={E1} T1={T1*1e3:.3f} ms/iter "
            f"({1/T1:.1f} it/s)"
            + (f" N1={plan1.key_fwd.shape[0]}" if plan1 else ""),
            flush=True,
        )
        for D in (2, 4, 8):
            for mode in modes:
                geoms, hosts, _, counts = us.build_shard_geoms(
                    pre.collection, V, D, partition=mode
                )
                g0 = geoms[0]
                h0 = uf.UniformHost(
                    geom=g0, bdd_of_col=(), depths=(), nr_vars=V,
                    nr_primal_vars=pre.nr_primal_variables, nr_bdds=0,
                )
                s0 = uf.init_uniform_state(h0, obj)
                Ts = time_iteration(g0, s0, n)
                S = payload_bytes(g0.exchange, V)
                Es = sum(g.H * g.B for g in g0.buckets)
                Ns = g0.exchange.key_fwd.shape[0] if g0.exchange else 0
                tp_ici = t_psum_ici(S, D)
                tp_dcn = t_psum_2host(S, D)
                TD = Ts + 2 * tp_ici
                TD2h = Ts + 2 * tp_dcn
                eff = T1 / (D * TD)
                eff2h = T1 / (D * TD2h)
                tag = f" [{mode}]" if len(modes) > 1 else ""
                print(
                    f"#  D={D}{tag}: shard E={Es} N={Ns} "
                    f"T_shard={Ts*1e3:.3f} ms  "
                    f"psum S={S/1024:.0f} KiB t={tp_ici*1e6:.1f} us  "
                    f"-> T_D={TD*1e3:.3f} ms  {1/TD:.1f} it/s  "
                    f"eff={eff*100:.0f}%  (2-host: {1/TD2h:.1f} it/s, "
                    f"eff={eff2h*100:.0f}%)",
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
