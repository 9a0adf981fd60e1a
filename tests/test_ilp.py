"""ILP model + LP parser tests (ref: test/test_ILP_parser.cpp, test_ILP_input.cpp)."""
import math
import random

import pytest

from bdd_tpu.ilp import ILPInput, Ineq, parse_lp_string
from tests import fixtures


def test_parse_short_mrf_chain():
    ilp = parse_lp_string(fixtures.SHORT_MRF_CHAIN)
    assert ilp.nr_variables() == 8
    assert ilp.nr_constraints() == 7
    assert ilp.objective_coeff(ilp.get_var_index("mu_1_0")) == 2.0
    assert ilp.objective_coeff(ilp.get_var_index("mu_2_0")) == -1.0
    assert ilp.objective_coeff(ilp.get_var_index("mu_11")) == 0.0
    c0 = ilp.constraints()[0]
    assert c0.ineq == Ineq.EQ and c0.rhs == 1
    assert c0.coefficients == [1, 1]


def test_parse_inequalities_and_names():
    ilp = parse_lp_string(
        """Minimize
2 x + 3 y - z
Subject To
c1: x + y <= 1
c2: - x - y >= -1
3 x - 2y = 1
End"""
    )
    assert ilp.nr_constraints() == 3
    assert ilp.constraints()[0].name == "c1"
    assert ilp.constraints()[1].ineq == Ineq.GEQ
    assert ilp.constraints()[1].coefficients == [-1, -1]
    assert ilp.constraints()[2].coefficients == [3, -2]
    assert ilp.constraints()[2].rhs == 1


def test_parse_multiline_constraint():
    ilp = parse_lp_string(
        """Minimize
x + y + z
Subject To
x + y
 + z >= 1
End"""
    )
    assert ilp.nr_constraints() == 1
    assert ilp.constraints()[0].coefficients == [1, 1, 1]


def test_parse_bounds_fixations():
    ilp = parse_lp_string(
        """Minimize
x + 2 y + 4 z
Subject To
x + y + z >= 1
Bounds
y = 1
z <= 0
End"""
    )
    # y fixed to 1, z fixed to 0 -> reduced ILP over {x}
    assert ilp.nr_variables() == 1
    assert ilp.constant_ == 2.0
    c = ilp.constraints()[0]
    assert c.rhs == 0  # x >= 1 - 1


def test_parse_monomials():
    ilp = parse_lp_string(
        """Minimize
x + y
Subject To
x*y + x <= 1
2 x * y - y >= 0
End"""
    )
    c = ilp.constraints()[0]
    assert len(c.monomials) == 2
    assert any(len(m) == 2 for m in c.monomials)


def test_parse_coalesce():
    ilp = parse_lp_string(
        """Minimize
x + y
Subject To
c1: x + y <= 1
c2: x - y <= 0
Coalesce
c1 c2
End"""
    )
    assert ilp.coalesce_sets_ == [[0, 1]]


def test_evaluate_and_feasible():
    ilp = parse_lp_string(fixtures.TWO_SIMPLEX)
    x = [0] * 6
    assert not ilp.feasible(x)
    x[0] = 1
    x[3] = 1
    x[4] = 1
    assert ilp.feasible(x)
    assert ilp.evaluate(x) == pytest.approx(1 + 2 + 1)


def test_preprocess_removes_trivial():
    ilp = ILPInput()
    v = ilp.add_new_variable("x")
    ilp.add_linear_constraint([1], [v], Ineq.LEQ, 5)  # always true
    ilp.add_linear_constraint([1], [v], Ineq.GEQ, 0)  # always true
    assert ilp.preprocess()
    assert ilp.nr_constraints() == 0

    ilp2 = ILPInput()
    v = ilp2.add_new_variable("x")
    ilp2.add_linear_constraint([1], [v], Ineq.GEQ, 2)  # impossible
    assert not ilp2.preprocess()


def test_reduce_fixation():
    ilp = parse_lp_string(fixtures.SHORT_MRF_CHAIN)
    i_mu10 = ilp.get_var_index("mu_1_0")
    red = ilp.reduce([], [i_mu10])
    assert red.nr_variables() == 7
    # constraint mu_1_0 + mu_1_1 = 1 becomes mu_1_1 = 0
    c = red.constraints_[0]
    assert c.rhs == 0 and c.coefficients == [1]


def test_reorder_preserves_optimum():
    random.seed(0)
    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    for method in ("reorder_bfs", "reorder_cuthill_mckee", "reorder_minimum_degree"):
        ilp2 = parse_lp_string(fixtures.MATCHING_3x3)
        getattr(ilp2, method)()
        opt2, _ = fixtures.brute_force_ilp_optimum(ilp2)
        assert opt2 == pytest.approx(opt)
        # names permuted consistently
        for name in ilp.var_names:
            assert ilp2.var_exists(name)


def test_write_lp_roundtrip():
    ilp = parse_lp_string(fixtures.MATCHING_3x3)
    text = ilp.write_lp()
    ilp2 = parse_lp_string(text)
    assert ilp2.nr_variables() == ilp.nr_variables()
    assert ilp2.nr_constraints() == ilp.nr_constraints()
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    opt2, _ = fixtures.brute_force_ilp_optimum(ilp2)
    assert opt == pytest.approx(opt2)


def test_connected_components():
    ilp = parse_lp_string(fixtures.TWO_SIMPLEX)
    comps = ilp.connected_components()
    assert len(comps) == 2


def test_write_lp_roundtrip_constant_and_unnamed_coalesce():
    """write_lp emits the objective constant and names coalesce-referenced
    unnamed constraints so its own output parses (regression: round-trip
    raised 'unknown constraint name in Coalesce')."""
    from bdd_tpu.ilp import parse_lp_string
    from bdd_tpu.ilp.model import ILPInput, Ineq

    ilp = ILPInput()
    ilp.add_to_objective(1.0, "x")
    ilp.add_to_objective(2.0, "y")
    ilp.constant_ = 5.0
    ilp.add_linear_constraint([1, 1], [0, 1], Ineq.LEQ, 1)
    ilp.add_linear_constraint([1, -1], [0, 1], Ineq.GEQ, 0)
    ilp.add_coalesce_set([0, 1])
    rt = parse_lp_string(ilp.write_lp())
    assert rt.constant_ == 5.0
    assert rt.coalesce_sets_ == [[0, 1]]
    assert rt.evaluate([1, 0]) == ilp.evaluate([1, 0])


def test_write_opb_rejects_fractional_objective():
    from bdd_tpu.ilp.model import ILPInput, Ineq

    ilp = ILPInput()
    ilp.add_to_objective(0.75, "x")
    ilp.add_linear_constraint([1], [0], Ineq.LEQ, 1)
    with pytest.raises(ValueError):
        ilp.write_opb()


def test_lp_parser_singular_sections_and_multiline_rhs():
    """'Binary'/'General' (singular) sections parse, and a constraint whose
    rhs continues on the next line is accepted (both legal LP forms)."""
    from bdd_tpu.ilp import parse_lp_string

    ilp = parse_lp_string("""Minimize
x + y
Subject To
c1: x + y <=
1
Binary
x
End""")
    assert ilp.nr_constraints() == 1
    assert ilp.feasible([1, 0]) and not ilp.feasible([1, 1])


def test_lp_parser_incomplete_constraint_raises():
    """A constraint missing its relation must not swallow the following
    section into bogus variables (regression: 'Bounds' became a variable)."""
    from bdd_tpu.ilp import parse_lp_string
    from bdd_tpu.ilp.lp_parser import LpParseError

    with pytest.raises(LpParseError):
        parse_lp_string("""Minimize
x
Subject To
c1: x + y
Bounds
z = 1
End""")


def test_mps_objsense_max_rejected():
    """One-line 'OBJSENSE MAX' must raise, not silently minimize."""
    from bdd_tpu.ilp.mps_parser import parse_mps_string

    text = """NAME t
OBJSENSE MAX
ROWS
 N obj
 L c1
COLUMNS
 x obj 1 c1 1
RHS
 r c1 1
ENDATA"""
    with pytest.raises(ValueError):
        parse_mps_string(text)
