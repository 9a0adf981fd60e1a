"""Synthetic structured-problem generators (benchmark + test instances).

Mirrors the reference's benchmark families (SURVEY.md §6): binary/multilabel
MRFs (cell tracking / color-seg style), assignment/graph-matching, set cover,
and independent set (DOGE MIS protocol, DOGE/data/generate_independent_set_inst.py).
All generators return an ILPInput directly (no file round-trip).
"""
from __future__ import annotations

import random
from typing import Optional

from bdd_tpu.ilp.model import ILPInput, Ineq


def grid_mrf(
    rows: int,
    cols: int,
    labels: int,
    seed: int = 0,
    potts: Optional[float] = None,
) -> ILPInput:
    """Pairwise MRF on a grid as local-polytope ILP: unary simplexes, pairwise
    simplexes and marginalization constraints (the reference's MRF frontend,
    src/specialized_solvers/mrf_input.cpp:64-160)."""
    rng = random.Random(seed)
    ilp = ILPInput()

    def u(i, j, a):
        return f"mu_{i}_{j}_{a}"

    def p(i, j, i2, j2, a, b):
        return f"mu_{i}_{j}_{i2}_{j2}_{a}_{b}"

    edges = []
    for i in range(rows):
        for j in range(cols):
            for a in range(labels):
                ilp.add_to_objective(rng.uniform(-1.0, 1.0), u(i, j, a))
            if i + 1 < rows:
                edges.append(((i, j), (i + 1, j)))
            if j + 1 < cols:
                edges.append(((i, j), (i, j + 1)))
    for (i, j), (i2, j2) in edges:
        for a in range(labels):
            for b in range(labels):
                if potts is not None:
                    c = 0.0 if a == b else potts
                else:
                    c = rng.uniform(-1.0, 1.0)
                ilp.add_to_objective(c, p(i, j, i2, j2, a, b))

    # unary simplex
    for i in range(rows):
        for j in range(cols):
            vs = [ilp.get_var_index(u(i, j, a)) for a in range(labels)]
            ilp.add_linear_constraint([1] * labels, vs, Ineq.EQ, 1)
    # pairwise simplex + marginalization
    for (i, j), (i2, j2) in edges:
        pvars = [
            ilp.get_var_index(p(i, j, i2, j2, a, b))
            for a in range(labels)
            for b in range(labels)
        ]
        ilp.add_linear_constraint([1] * len(pvars), pvars, Ineq.EQ, 1)
        for a in range(labels):
            vs = [ilp.get_var_index(u(i, j, a))] + [
                ilp.get_var_index(p(i, j, i2, j2, a, b)) for b in range(labels)
            ]
            ilp.add_linear_constraint([1] + [-1] * labels, vs, Ineq.EQ, 0)
        for b in range(labels):
            vs = [ilp.get_var_index(u(i2, j2, b))] + [
                ilp.get_var_index(p(i, j, i2, j2, a, b)) for a in range(labels)
            ]
            ilp.add_linear_constraint([1] + [-1] * labels, vs, Ineq.EQ, 0)
    return ilp


def assignment(n: int, seed: int = 0) -> ILPInput:
    """n x n assignment problem (graph matching without quadratic terms)."""
    rng = random.Random(seed)
    ilp = ILPInput()
    for i in range(n):
        for j in range(n):
            ilp.add_to_objective(rng.uniform(-10.0, 10.0), f"x_{i}_{j}")
    for i in range(n):
        vs = [ilp.get_var_index(f"x_{i}_{j}") for j in range(n)]
        ilp.add_linear_constraint([1] * n, vs, Ineq.EQ, 1)
    for j in range(n):
        vs = [ilp.get_var_index(f"x_{i}_{j}") for i in range(n)]
        ilp.add_linear_constraint([1] * n, vs, Ineq.EQ, 1)
    return ilp


def set_cover(
    nr_elements: int, nr_sets: int, density: float = 0.2, seed: int = 0
) -> ILPInput:
    rng = random.Random(seed)
    ilp = ILPInput()
    members = [[] for _ in range(nr_elements)]
    for s in range(nr_sets):
        ilp.add_to_objective(rng.uniform(0.5, 5.0), f"s_{s}")
        for e in range(nr_elements):
            if rng.random() < density:
                members[e].append(s)
    for e, ms in enumerate(members):
        if not ms:
            ms.append(rng.randrange(nr_sets))
        vs = [ilp.get_var_index(f"s_{s}") for s in ms]
        ilp.add_linear_constraint([1] * len(vs), vs, Ineq.GEQ, 1)
    return ilp


def independent_set(
    nr_nodes: int, edge_prob: float = 0.25, seed: int = 0
) -> ILPInput:
    """Maximum-weight independent set on an Erdos-Renyi graph
    (DOGE MIS protocol, DOGE/data/generate_independent_set_inst.py)."""
    rng = random.Random(seed)
    ilp = ILPInput()
    for v in range(nr_nodes):
        ilp.add_to_objective(-rng.uniform(0.0, 1.0), f"x_{v}")
    for a in range(nr_nodes):
        for b in range(a + 1, nr_nodes):
            if rng.random() < edge_prob:
                ilp.add_linear_constraint(
                    [1, 1],
                    [ilp.get_var_index(f"x_{a}"), ilp.get_var_index(f"x_{b}")],
                    Ineq.LEQ,
                    1,
                )
    return ilp


def quadratic_assignment(n: int, seed: int = 0, density: float = 0.5) -> ILPInput:
    """Small QAPLIB-style instance: assignment constraints + quadratic
    objective terms linearized through product variables (exercises the
    nonlinear-monomial path, ref: specialized_solvers graph matching)."""
    rng = random.Random(seed)
    ilp = assignment(n, seed)
    terms = 0
    for i in range(n):
        for j in range(n):
            for k in range(i + 1, n):
                for l in range(n):
                    if l == j or rng.random() > density:
                        continue
                    c = rng.uniform(-1.0, 1.0)
                    vi = ilp.get_var_index(f"x_{i}_{j}")
                    vk = ilp.get_var_index(f"x_{k}_{l}")
                    # quadratic objective term c * x_ij * x_kl via an explicit
                    # product variable (Fortet linearization)
                    y = ilp.get_or_create_variable(f"y_{i}_{j}_{k}_{l}")
                    ilp.add_to_objective(c, y)
                    ilp.add_linear_constraint([1, -1], [y, vi], Ineq.LEQ, 0)
                    ilp.add_linear_constraint([1, -1], [y, vk], Ineq.LEQ, 0)
                    ilp.add_linear_constraint(
                        [1, -1, -1], [y, vi, vk], Ineq.GEQ, -1
                    )
                    terms += 1
    return ilp
