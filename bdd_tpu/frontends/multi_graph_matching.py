"""Multi-graph matching frontend.

Format (ref: src/specialized_solvers/multi_graph_matching_input.cpp): blocks
``gm <p> <q>`` (p < q), each followed by a Torresani-et-al '.dd' body. The ILP
concatenates every pairwise matching's ILP (variables prefixed
``mgm_<p>_<q>_``) and adds cycle-consistency constraints

    sum_k'' x_ik(x_i, l) * x_jk(x_j, l)  -  x_ij(x_i, x_j)  <=  0

with quadratic monomials over the transit graph k (multi_graph_matching_input
.cpp:161-230); the monomials are linearized by the BDD preprocessor.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from bdd_tpu.frontends.graph_matching import (
    NO_ASSIGNMENT,
    GraphMatchingInstance,
    construct_graph_matching_ilp,
    parse_dd_string,
)
from bdd_tpu.ilp.model import ILPInput, Ineq


def parse_mgm_string(text: str) -> Dict[Tuple[int, int], GraphMatchingInstance]:
    blocks: Dict[Tuple[int, int], GraphMatchingInstance] = {}
    cur_key = None
    cur_lines: List[str] = []
    for raw in text.split("\n") + ["gm -1 -1"]:  # sentinel flushes last block
        line = raw.strip()
        if line.startswith("gm "):
            if cur_key is not None:
                blocks[cur_key] = parse_dd_string("\n".join(cur_lines))
            parts = line.split()
            p, q = int(parts[1]), int(parts[2])
            cur_key = (p, q) if p >= 0 else None
            cur_lines = []
        else:
            cur_lines.append(raw)
    return blocks


def parse_mgm_file(path: str) -> Dict[Tuple[int, int], GraphMatchingInstance]:
    with open(path) as fh:
        return parse_mgm_string(fh.read())


def construct_multi_graph_matching_ilp(
    blocks: Dict[Tuple[int, int], GraphMatchingInstance]
) -> ILPInput:
    nr_graphs = max(max(k) for k in blocks) + 1
    ilp = ILPInput()
    linear_maps: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}

    for (p, q) in sorted(blocks):
        assert p < q, "gm blocks must be given with p < q"
        gm_ilp, lin_map, _ = construct_graph_matching_ilp(blocks[(p, q)])
        offset = ilp.nr_variables()
        for v in range(gm_ilp.nr_variables()):
            nv = ilp.add_new_variable(f"mgm_{p}_{q}_{gm_ilp.get_var_name(v)}")
            ilp.objective_[nv] = gm_ilp.objective_[v]
        for c in gm_ilp.constraints():
            ilp.add_constraint(
                c.coefficients,
                [tuple(offset + v for v in m) for m in c.monomials],
                c.ineq,
                c.rhs,
                f"mgm_{p}_{q}_{c.name}",
            )
        linear_maps[(p, q)] = {k: v + offset for k, v in lin_map.items()}

    # cycle consistency: X_ij * X_jk <= X_ik (quadratic monomials)
    for i in range(nr_graphs):
        for j in range(i + 1, nr_graphs):
            ij_vars = linear_maps[(i, j)]
            for (x_i, x_j), ij_var in sorted(ij_vars.items()):
                if x_i == NO_ASSIGNMENT or x_j == NO_ASSIGNMENT:
                    continue
                for k in range(nr_graphs):
                    if k == i or k == j:
                        continue
                    jk_t = j > k
                    jk_vars = linear_maps[(min(j, k), max(j, k))]
                    a_jk: Dict[int, int] = {}
                    for (a, b), var in jk_vars.items():
                        x_k = a if jk_t else b
                        x_j2 = b if jk_t else a
                        if x_j2 == x_j and x_j2 != NO_ASSIGNMENT:
                            a_jk[x_k] = var
                    ik_t = i > k
                    ik_vars = linear_maps[(min(i, k), max(i, k))]
                    a_ik: Dict[int, int] = {}
                    for (a, b), var in ik_vars.items():
                        x_k = a if ik_t else b
                        x_i2 = b if ik_t else a
                        if x_i2 == x_i and x_i2 != NO_ASSIGNMENT:
                            a_ik[x_k] = var
                    monomials = []
                    for x_k, ik_var in sorted(a_ik.items()):
                        if x_k in a_jk and x_k != NO_ASSIGNMENT:
                            monomials.append((ik_var, a_jk[x_k]))
                    if monomials:
                        ilp.add_constraint(
                            [1] * len(monomials) + [-1],
                            monomials + [(ij_var,)],
                            Ineq.LEQ,
                            0,
                        )
    return ilp
