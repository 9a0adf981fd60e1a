"""Sizing for SPLIT exchange plans (private region + globally-shared
compacted region, psum only over the shared slice). See compaction_analysis
for the rejected full-compaction variant (merge sorts dominate)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from bdd_tpu.solver import uniform as uf
from bdd_tpu.solver import uniform_sharded as us
from benchmarks.compaction_analysis import build


def pad(x, lane=128):
    return ((x + lane - 1) // lane) * lane


def main():
    for which in sys.argv[1:] or ["qap18", "gm50k", "grid24"]:
        t0 = time.time()
        pre = build(which)
        V = pre.total_nr_variables()
        print(f"## {which}: V={V}", flush=True)
        for D in (2, 4, 8):
            geoms, hosts, _, counts = us.build_shard_geoms(
                pre.collection, V, D
            )
            touch = np.zeros(V, dtype=np.int32)
            per_shard = []
            for geom in geoms:
                ids = np.concatenate(
                    [np.asarray(g.layer_var).ravel() for g in geom.buckets]
                )
                val = np.concatenate(
                    [np.asarray(g.layer_valid).ravel() for g in geom.buckets]
                )
                rv = ids[val]
                t = np.unique(rv)
                touch[t] += 1
                per_shard.append((ids, val, t))
            shared = np.nonzero(touch >= 2)[0]
            Sg = shared.size
            E_s = per_shard[0][0].size
            # per-shard private counts and count profiles
            Ps_max = 0
            prof_priv = None  # elementwise max of sorted-desc private profiles
            prof_shared = np.zeros(Sg, dtype=np.int64)
            for ids, val, t in per_shard:
                rv = ids[val]
                c = np.bincount(rv, minlength=V)
                is_sh = np.zeros(V, dtype=bool)
                is_sh[shared] = True
                priv = t[~is_sh[t]]
                Ps_max = max(Ps_max, priv.size)
                pp = np.sort(c[priv])[::-1]
                if prof_priv is None:
                    prof_priv = pp
                else:
                    n = max(prof_priv.size, pp.size)
                    a = np.zeros(n, np.int64)
                    b = np.zeros(n, np.int64)
                    a[: prof_priv.size] = prof_priv
                    b[: pp.size] = pp
                    prof_priv = np.maximum(a, b)
                prof_shared = np.maximum(prof_shared, c[shared])
            Vvirt = prof_priv.size + Sg
            layout = np.concatenate([prof_priv, prof_shared])
            # simulate build_exchange_plan's C selection on this layout
            ids0, val0, t0_ = per_shard[0]
            # virtual remap of shard 0 (just for the plan-volume probe)
            is_sh = np.zeros(V, dtype=bool)
            is_sh[shared] = True
            priv0 = t0_[~is_sh[t0_]]
            c0 = np.bincount(ids0[val0], minlength=V)
            o = np.argsort(c0[priv0])[::-1]
            vmap = np.full(V + 1, Vvirt, np.int64)
            vmap[priv0[o]] = np.arange(priv0.size)
            vmap[shared] = prof_priv.size + np.arange(Sg)
            rel = vmap[ids0]
            rel[~val0] = Vvirt
            p = uf.build_exchange_plan(
                rel, val0, Vvirt, max_blowup=64.0, global_counts=layout
            )
            N = int(p.key_fwd.shape[0]) if p else -1
            psum_kib = 2 * pad(Sg) * 4 / 1024
            print(
                f"#  D={D}: E_s={E_s} Sg={Sg} ({Sg/V:.2f}V) Ps_max={Ps_max} "
                f"N_split={N} (C={p.C if p else '-'}) "
                f"sort_total~{3*N} psum={psum_kib:.0f} KiB "
                f"vs full-V psum {2*pad(V+1)*4/1024:.0f} KiB",
                flush=True,
            )


if __name__ == "__main__":
    main()
