"""Pallas TPU kernels for the uniform bucketed sweeps.

One kernel invocation runs a bucket's ENTIRE half-sweep (all H hops) with the
frontier and all per-hop tensors resident in VMEM, eliminating XLA's per-op
HBM round trips: the grid tiles the BDD-column axis (BDDs are independent
within a half-sweep), and the hop loop is unrolled inside the kernel over
[P, BT] tiles — pure VPU work. Slot widths P are tiny (2-8 in all benchmark
families) so the one-hot child selects unroll to a handful of fused selects.

The XLA scan path (uniform.py) remains the reference implementation; these
kernels are bit-compatible with it (same where/min semantics) and are selected
by ``enabled()`` heuristics (small P, moderate H). Interpret mode makes the
kernels testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bdd_tpu.solver.uniform import root_rows  # noqa: F401 (kernel callers)
from bdd_tpu.solver.uniform import (
    ARC_BOT,
    ARC_INTERNAL,
    ARC_TOP,
    BucketGeom,
)

BIG = 1e30  # stand-in for +inf inside kernels (inf arithmetic is avoided)


def _use_interpret() -> bool:
    # real Mosaic compilation on TPU-like backends (incl. the remote axon
    # plugin); interpreter elsewhere (CPU tests). BDD_TPU_PALLAS_INTERPRET
    # forces the interpreter regardless of the default backend — needed when
    # the computation targets CPU devices of a multi-platform process whose
    # default backend is a TPU (e.g. the driver's virtual-mesh dryrun).
    import os

    if os.environ.get("BDD_TPU_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() in ("cpu",)


def enabled(g: BucketGeom) -> bool:
    import os

    if jax.default_backend() == "cpu" and not os.environ.get(
        "BDD_TPU_PALLAS_INTERPRET"
    ):
        return False  # interpret mode is for dedicated parity tests only
    return g.P <= 8 and g.H <= 256


def _tile(B: int) -> int:
    for bt in (2048, 1024, 512, 256, 128):
        if B % bt == 0:
            return bt
    return B


def _hop_update_tile(lo_row, hi_row, m0, m1, omega_row, alpha_row, dlo, dhi, lval):
    """Cost update on [BT] tiles; mirrors uniform._hop_cost_update with BIG
    standing in for inf (kernels avoid inf arithmetic)."""
    fin0 = m0 < BIG / 2
    fin1 = m1 < BIG / 2
    both = fin0 & fin1
    mm_rm = jnp.where(both, omega_row * (m1 - m0), 0.0)
    # forcing deltas (|din| >= BIG/2, the inf stand-in) must NOT be scaled by
    # alpha: alpha*BIG for a variable in >=3 BDDs drops below the BIG/2
    # finiteness threshold and the forcing silently stops propagating —
    # re-add them additively, exactly like uniform._hop_cost_update's
    # double-where does for real infinities
    dfin0 = jnp.abs(dlo) < BIG / 2
    dfin1 = jnp.abs(dhi) < BIG / 2
    c_lo = alpha_row * jnp.where(dfin0, dlo, 0.0) + jnp.where(dfin0, 0.0, dlo)
    c_hi = alpha_row * jnp.where(dfin1, dhi, 0.0) + jnp.where(dfin1, 0.0, dhi)
    new_lo = jnp.where(fin0, lo_row - jnp.maximum(-mm_rm, 0.0), BIG) + c_lo
    new_hi = jnp.where(fin1, hi_row - jnp.maximum(mm_rm, 0.0), BIG) + c_hi
    def_mm = jnp.where(both, mm_rm, jnp.where(fin1, -BIG, BIG))
    new_lo = jnp.where(lval, jnp.minimum(new_lo, BIG), 0.0)
    new_hi = jnp.where(lval, jnp.minimum(new_hi, BIG), 0.0)
    def_mm = jnp.where(lval, def_mm, 0.0)
    return new_lo, new_hi, def_mm


def _child_cft_slot(kind_p, slot_p, cft_next_list, P):
    """cft of the child of one slot's arc; all operands [BT] vectors (the P
    dimension is fully unrolled — Mosaic dislikes sub-tile sublane dims)."""
    gathered = jnp.zeros_like(cft_next_list[0])
    for k in range(P):
        gathered = jnp.where(slot_p == k, cft_next_list[k], gathered)
    return jnp.where(
        kind_p == ARC_TOP, 0.0, jnp.where(kind_p == ARC_BOT, BIG, gathered)
    )


def _relax_slots(vals_list, kind_list, slot_list, valid_list, P):
    """next_cfr[k] = min over source slots p with an internal arc into k."""
    out = []
    for k in range(P):
        acc = jnp.full_like(vals_list[0], BIG)
        for p in range(P):
            mask = (slot_list[p] == k) & (kind_list[p] == ARC_INTERNAL) & valid_list[p]
            acc = jnp.minimum(acc, jnp.where(mask, vals_list[p], BIG))
        out.append(acc)
    return out


def _forward_kernel(
    P: int,
    H: int,
    nvalid_ref,
    lo_k_ref,
    lo_s_ref,
    hi_k_ref,
    hi_s_ref,
    lo_ref,
    hi_ref,
    cft_ref,
    din_lo_ref,
    din_hi_ref,
    alpha_ref,
    lval_ref,
    root_ref,
    omega_ref,
    out_lo_ref,
    out_hi_ref,
    out_mm_ref,
    out_cfr_ref,
):
    cfr = [jnp.full_like(lo_ref[0], BIG) for _ in range(P)]  # P x [BT]
    for h in range(H):
        nvalid = [nvalid_ref[h, p] != 0 for p in range(P)]
        # root restart (column packing): exact, since the carry entering a
        # restart row is all-BIG (the previous BDD's last layer has only
        # terminal arcs); also provides the hop-0 init (roots sit at slot 0)
        root = root_ref[h] != 0
        cfr = [
            jnp.where(root, 0.0 if p == 0 else BIG, cfr[p]) for p in range(P)
        ]
        lo_k = [lo_k_ref[h, p] for p in range(P)]
        lo_s = [lo_s_ref[h, p] for p in range(P)]
        hi_k = [hi_k_ref[h, p] for p in range(P)]
        hi_s = [hi_s_ref[h, p] for p in range(P)]
        lo_row = lo_ref[h]
        hi_row = hi_ref[h]
        lval = lval_ref[h] != 0
        if h + 1 < H:
            cft_next = [cft_ref[h + 1, p] for p in range(P)]
        else:
            cft_next = [jnp.full_like(cfr[0], BIG) for _ in range(P)]
        m0 = jnp.full_like(lo_row, BIG)
        m1 = jnp.full_like(lo_row, BIG)
        t_lo, t_hi = [], []
        for p in range(P):
            tl = _child_cft_slot(lo_k[p], lo_s[p], cft_next, P)
            th = _child_cft_slot(hi_k[p], hi_s[p], cft_next, P)
            t_lo.append(tl)
            t_hi.append(th)
            m0 = jnp.minimum(m0, jnp.where(nvalid[p], cfr[p] + lo_row + tl, BIG))
            m1 = jnp.minimum(m1, jnp.where(nvalid[p], cfr[p] + hi_row + th, BIG))
        m0 = jnp.minimum(m0, BIG)
        m1 = jnp.minimum(m1, BIG)
        new_lo, new_hi, mm = _hop_update_tile(
            lo_row, hi_row, m0, m1, omega_ref[h], alpha_ref[h],
            din_lo_ref[h], din_hi_ref[h], lval,
        )
        out_lo_ref[h] = new_lo
        out_hi_ref[h] = new_hi
        out_mm_ref[h] = mm
        for p in range(P):
            out_cfr_ref[h, p] = cfr[p]
        vals_lo = [jnp.minimum(cfr[p] + new_lo, BIG) for p in range(P)]
        vals_hi = [jnp.minimum(cfr[p] + new_hi, BIG) for p in range(P)]
        nxt_lo = _relax_slots(vals_lo, lo_k, lo_s, nvalid, P)
        nxt_hi = _relax_slots(vals_hi, hi_k, hi_s, nvalid, P)
        cfr = [jnp.minimum(a, b) for a, b in zip(nxt_lo, nxt_hi)]


def _backward_kernel(
    P: int,
    H: int,
    nvalid_ref,
    lo_k_ref,
    lo_s_ref,
    hi_k_ref,
    hi_s_ref,
    lo_ref,
    hi_ref,
    cfr_ref,
    din_lo_ref,
    din_hi_ref,
    alpha_ref,
    lval_ref,
    omega_ref,
    out_lo_ref,
    out_hi_ref,
    out_mm_ref,
    out_cft_ref,
):
    zero = lo_ref[0]
    cft_next = [jnp.full_like(zero, BIG) for _ in range(P)]
    for h in range(H - 1, -1, -1):
        nvalid = [nvalid_ref[h, p] != 0 for p in range(P)]
        lo_k = [lo_k_ref[h, p] for p in range(P)]
        lo_s = [lo_s_ref[h, p] for p in range(P)]
        hi_k = [hi_k_ref[h, p] for p in range(P)]
        hi_s = [hi_s_ref[h, p] for p in range(P)]
        lo_row = lo_ref[h]
        hi_row = hi_ref[h]
        lval = lval_ref[h] != 0
        cfr = [cfr_ref[h, p] for p in range(P)]
        m0 = jnp.full_like(lo_row, BIG)
        m1 = jnp.full_like(lo_row, BIG)
        t_lo, t_hi = [], []
        for p in range(P):
            tl = _child_cft_slot(lo_k[p], lo_s[p], cft_next, P)
            th = _child_cft_slot(hi_k[p], hi_s[p], cft_next, P)
            t_lo.append(tl)
            t_hi.append(th)
            m0 = jnp.minimum(m0, jnp.where(nvalid[p], cfr[p] + lo_row + tl, BIG))
            m1 = jnp.minimum(m1, jnp.where(nvalid[p], cfr[p] + hi_row + th, BIG))
        m0 = jnp.minimum(m0, BIG)
        m1 = jnp.minimum(m1, BIG)
        new_lo, new_hi, mm = _hop_update_tile(
            lo_row, hi_row, m0, m1, omega_ref[h], alpha_ref[h],
            din_lo_ref[h], din_hi_ref[h], lval,
        )
        out_lo_ref[h] = new_lo
        out_hi_ref[h] = new_hi
        out_mm_ref[h] = mm
        cft_next = [
            jnp.where(
                nvalid[p],
                jnp.minimum(
                    jnp.minimum(new_lo + t_lo[p], new_hi + t_hi[p]), BIG
                ),
                BIG,
            )
            for p in range(P)
        ]
        for p in range(P):
            out_cft_ref[h, p] = cft_next[p]


def _specs(H: int, P: int, BT: int):
    node = pl.BlockSpec((H, P, BT), lambda i: (0, 0, i))
    layer = pl.BlockSpec((H, BT), lambda i: (0, i))
    return node, layer


def _clean_inf(x):
    """Convert BIG back to inf on the way out."""
    out = jnp.where(x >= BIG / 2, jnp.inf, jnp.where(x <= -BIG / 2, -jnp.inf, x))
    return out


def _prep_costs(x):
    """inf -> BIG on the way in (NaN stays NaN: masking a NaN to 0 would
    silently diverge from the XLA path, which propagates it to the bound)."""
    return jnp.clip(
        jnp.nan_to_num(x, nan=jnp.nan, posinf=BIG, neginf=-BIG), -BIG, BIG
    )


def bucket_forward_iteration_pallas(
    g: BucketGeom, lo, hi, cft, omega, din_lo, din_hi, alpha=None
):
    if alpha is None:
        alpha = g.alpha
    H, P, B = g.H, g.P, g.B
    BT = _tile(B)
    node, layer = _specs(H, P, BT)
    omega_arr = jnp.broadcast_to(jnp.asarray(omega, lo.dtype), lo.shape)
    kern = functools.partial(_forward_kernel, P, H)
    out_shapes = (
        jax.ShapeDtypeStruct((H, B), lo.dtype),
        jax.ShapeDtypeStruct((H, B), lo.dtype),
        jax.ShapeDtypeStruct((H, B), lo.dtype),
        jax.ShapeDtypeStruct((H, P, B), lo.dtype),
    )
    new_lo, new_hi, mm, cfr = pl.pallas_call(
        kern,
        grid=(B // BT,),
        in_specs=[node, node, node, node, node, layer, layer, node, layer,
                  layer, layer, layer, layer, layer],
        out_specs=(layer, layer, layer, node),
        out_shape=out_shapes,
        interpret=_use_interpret(),
    )(
        g.node_valid.astype(jnp.int32),
        g.lo_kind.astype(jnp.int32),
        g.lo_slot.astype(jnp.int32),
        g.hi_kind.astype(jnp.int32),
        g.hi_slot.astype(jnp.int32),
        _prep_costs(lo),
        _prep_costs(hi),
        _prep_costs(cft),
        _prep_costs(din_lo),
        _prep_costs(din_hi),
        alpha,
        g.layer_valid.astype(jnp.int32),
        root_rows(g).astype(jnp.int32),
        omega_arr,
    )
    return _clean_inf(new_lo), _clean_inf(new_hi), _clean_inf(mm), _clean_inf(cfr)


def bucket_backward_iteration_pallas(
    g: BucketGeom, lo, hi, cfr, omega, din_lo, din_hi, alpha=None
):
    if alpha is None:
        alpha = g.alpha
    H, P, B = g.H, g.P, g.B
    BT = _tile(B)
    node, layer = _specs(H, P, BT)
    omega_arr = jnp.broadcast_to(jnp.asarray(omega, lo.dtype), lo.shape)
    kern = functools.partial(_backward_kernel, P, H)
    out_shapes = (
        jax.ShapeDtypeStruct((H, B), lo.dtype),
        jax.ShapeDtypeStruct((H, B), lo.dtype),
        jax.ShapeDtypeStruct((H, B), lo.dtype),
        jax.ShapeDtypeStruct((H, P, B), lo.dtype),
    )
    new_lo, new_hi, mm, cft = pl.pallas_call(
        kern,
        grid=(B // BT,),
        in_specs=[node, node, node, node, node, layer, layer, node, layer,
                  layer, layer, layer, layer],
        out_specs=(layer, layer, layer, node),
        out_shape=out_shapes,
        interpret=_use_interpret(),
    )(
        g.node_valid.astype(jnp.int32),
        g.lo_kind.astype(jnp.int32),
        g.lo_slot.astype(jnp.int32),
        g.hi_kind.astype(jnp.int32),
        g.hi_slot.astype(jnp.int32),
        _prep_costs(lo),
        _prep_costs(hi),
        _prep_costs(cfr),
        _prep_costs(din_lo),
        _prep_costs(din_hi),
        alpha,
        g.layer_valid.astype(jnp.int32),
        omega_arr,
    )
    return _clean_inf(new_lo), _clean_inf(new_hi), _clean_inf(mm), _clean_inf(cft)
