"""Shared test fixtures: inline LP problems and random-instance generators.

Mirrors the reference's test strategy (SURVEY.md §4): inline MRF-chain /
simplex LP strings (test/test_problems.h) and random inequality + cost
generators (test/test_problem_generator.h:10-62).
"""
import random

SHORT_MRF_CHAIN = """Minimize
2 mu_1_0 + 1 mu_1_1 - 1 mu_2_0 + 0 mu_2_1
+ 1 mu_00 + 2 mu_10 + 1 mu_01 + 0 mu_11
Subject To
mu_1_0 + mu_1_1 = 1
mu_2_0 + mu_2_1 = 1
mu_00 + mu_10 + mu_01 + mu_11 = 1
mu_1_0 - mu_00 - mu_01 = 0
mu_1_1 - mu_10 - mu_11 = 0
mu_2_0 - mu_00 - mu_10 = 0
mu_2_1 - mu_01 - mu_11 = 0
End"""

TWO_SIMPLEX = """Minimize
1 x_1 + 2 x_2 + 1 x_3
+ 2 x_4 + 1 x_5 + 2 x_6
Subject To
x_1 + x_2 + x_3 = 1
x_4 + x_5 + x_6 = 2
End"""

COVERING = """Minimize
2 x_1 + 1 x_2 + 3 x_3
Subject To
x_1 + x_2 + x_3 >= 2
End"""

MATCHING_3x3 = """Minimize
-2 x_11 - 1 x_12 - 1 x_13
-1 x_21 - 2 x_22 - 1 x_23
-1 x_31 - 1 x_32 - 2 x_33
Subject To
x_11 + x_12 + x_13 = 1
x_21 + x_22 + x_23 = 1
x_31 + x_32 + x_33 = 1
x_11 + x_21 + x_31 = 1
x_12 + x_22 + x_32 = 1
x_13 + x_23 + x_33 = 1
End"""

INFEASIBLE = """Minimize
x_1 + x_2
Subject To
x_1 + x_2 = 1
x_1 - x_2 = 1
x_2 - x_1 = 1
End"""


def random_inequality(rng: random.Random, nr_vars: int):
    """Random inequality with coefficients in [-10,10]\\{0} and rhs chosen so
    that the constraint is neither empty nor full (when possible).
    (ref: test/test_problem_generator.h:10-35)"""
    from bdd_tpu.ilp.model import Constraint, Ineq

    coeffs = [rng.choice([c for c in range(-10, 11) if c != 0]) for _ in range(nr_vars)]
    ineq = rng.choice([Ineq.LEQ, Ineq.GEQ, Ineq.EQ])
    neg = sum(c for c in coeffs if c < 0)
    pos = sum(c for c in coeffs if c > 0)
    if ineq == Ineq.EQ:
        # pick an achievable subset sum
        subset = [c for c in coeffs if rng.random() < 0.5]
        rhs = sum(subset)
    else:
        rhs = rng.randint(neg, pos)
    return Constraint(
        coefficients=coeffs,
        monomials=[(v,) for v in range(nr_vars)],
        ineq=ineq,
        rhs=rhs,
    )


def random_costs(rng: random.Random, n: int):
    return [rng.uniform(-10.0, 10.0) for _ in range(n)]


def brute_force_constraint_solutions(constraint, nr_vars: int):
    sols = []
    for bits in range(2 ** nr_vars):
        x = [(bits >> i) & 1 for i in range(nr_vars)]
        if constraint.evaluate(x):
            sols.append(tuple(x))
    return sols


def brute_force_ilp_optimum(ilp):
    import math

    best = math.inf
    best_x = None
    n = ilp.nr_variables()
    for bits in range(2 ** n):
        x = [(bits >> i) & 1 for i in range(n)]
        v = ilp.evaluate(x)
        if v < best:
            best, best_x = v, x
    return best, best_x


def brute_force_min_marginals(ilp, collection, costs_per_layer=None):
    """Exhaustive per-(bdd,var) min marginals given per-BDD Lagrange costs.

    costs_per_layer: dict (bdd_nr, var) -> (lo_cost, hi_cost). Returns dict
    (bdd_nr, var) -> (m0, m1)."""
    import math

    out = {}
    for b in range(collection.nr_bdds()):
        support = collection.level_variables(b)
        for target in support:
            m = [math.inf, math.inf]
            for bits in range(2 ** len(support)):
                x_local = {v: (bits >> i) & 1 for i, v in enumerate(support)}
                full = [0] * (max(support) + 1)
                for v, val in x_local.items():
                    full[v] = val
                if not collection.evaluate(b, full):
                    continue
                cost = sum(
                    costs_per_layer[(b, v)][x_local[v]] for v in support
                )
                m[x_local[target]] = min(m[x_local[target]], cost)
            out[(b, target)] = tuple(m)
    return out


def grid_mrf_optimum(ilp, rows, cols, labels):
    """Exact MRF optimum by enumeration over labelings (not ILP variables)."""
    import itertools, math

    def u(i, j, a):
        return ilp.get_var_index(f"mu_{i}_{j}_{a}")

    edges = []
    for i in range(rows):
        for j in range(cols):
            if i + 1 < rows:
                edges.append(((i, j), (i + 1, j)))
            if j + 1 < cols:
                edges.append(((i, j), (i, j + 1)))

    best = math.inf
    for lab in itertools.product(range(labels), repeat=rows * cols):
        def l(i, j):
            return lab[i * cols + j]

        cost = sum(
            ilp.objective_coeff(u(i, j, l(i, j)))
            for i in range(rows)
            for j in range(cols)
        )
        for (a, b) in edges:
            name = f"mu_{a[0]}_{a[1]}_{b[0]}_{b[1]}_{l(*a)}_{l(*b)}"
            cost += ilp.objective_coeff(ilp.get_var_index(name))
        best = min(best, cost)
    return best


def qap_optimum(ilp, n):
    """Exact QAP optimum by enumeration over permutations."""
    import itertools, math

    best = math.inf
    for perm in itertools.permutations(range(n)):
        cost = sum(
            ilp.objective_coeff(ilp.get_var_index(f"x_{i}_{perm[i]}"))
            for i in range(n)
        )
        for i in range(n):
            for k in range(n):
                if i == k:
                    continue
                name = f"y_{i}_{perm[i]}_{k}_{perm[k]}"
                if ilp.var_exists(name):
                    c = ilp.objective_coeff(ilp.get_var_index(name))
                    if c < 0:  # product variable active only when profitable
                        cost += c
                elif ilp.var_exists(f"y_{k}_{perm[k]}_{i}_{perm[i]}"):
                    pass  # counted from the (k,i) side
        # positive-cost products are forced when both assignments are chosen
        for i in range(n):
            for k in range(i + 1, n):
                name = f"y_{i}_{perm[i]}_{k}_{perm[k]}"
                if ilp.var_exists(name):
                    c = ilp.objective_coeff(ilp.get_var_index(name))
                    if c > 0:
                        cost += c
        best = min(best, cost)
    return best
