"""Specialized frontends: OPB, UAI MRF, graph matching, multi-graph matching.

(ref analogues: test/specialized_solvers/*, test_ILP_parser for OPB)
"""
import math

import numpy as np
import pytest

from bdd_tpu.api import BddSolver
from bdd_tpu.frontends import (
    construct_graph_matching_ilp,
    construct_multi_graph_matching_ilp,
    parse_dd_string,
    parse_mgm_string,
    parse_uai_string,
)
from bdd_tpu.ilp.opb_parser import (
    convert_lp_to_opb,
    convert_opb_to_lp,
    parse_opb_string,
)
from tests import fixtures

UAI_CHAIN = """MARKOV
3
2 2 2
5
1 0
1 1
1 2
2 0 1
2 1 2
2
0.0 2.0
2
1.0 0.0
2
3.0 1.0
4
0.0 2.0 2.0 0.0
4
0.0 2.0 2.0 0.0
"""

DD_SMALL = """c small matching instance
p 2 2 4 2
a 0 0 0 -2.0
a 1 0 1 -1.0
a 2 1 0 -1.0
a 3 1 1 -2.0
e 0 3 -1.0
e 1 2 0.5
"""


def test_opb_roundtrip():
    opb = """* comment
min: 2 x1 + 3 x2 - x3;
+1 x1 +1 x2 >= 1;
2 x1 - 3 x3 = -1;
"""
    ilp = parse_opb_string(opb)
    assert ilp.nr_variables() == 3
    assert ilp.nr_constraints() == 2
    opt, x = fixtures.brute_force_ilp_optimum(ilp)
    # roundtrip through lp and back
    ilp2 = parse_opb_string(parse_opb_string(opb).write_opb())
    opt2, _ = fixtures.brute_force_ilp_optimum(ilp2)
    assert opt == pytest.approx(opt2)


def test_opb_negated_literals():
    ilp = parse_opb_string("min: x1;\n1 ~x1 1 x2 >= 1;\n")
    # ~x1 + x2 >= 1  <=>  -x1 + x2 >= 0
    assert fixtures.brute_force_ilp_optimum(ilp)[0] == 0.0


def test_converters():
    lp = convert_opb_to_lp("min: x1 + x2;\n1 x1 1 x2 >= 1;\n")
    assert "Minimize" in lp
    opb = convert_lp_to_opb("Minimize\nx + y\nSubject To\nx + y >= 1\nEnd")
    assert "min:" in opb


def test_uai_parse_and_solve():
    mrf = parse_uai_string(UAI_CHAIN)
    assert mrf.nr_variables() == 3
    assert len(mrf.pairwise) == 2
    ilp = mrf.convert_to_ilp()
    # brute force MRF optimum directly over labelings
    best = math.inf
    for l0 in range(2):
        for l1 in range(2):
            for l2 in range(2):
                cost = (
                    mrf.unaries[0][l0]
                    + mrf.unaries[1][l1]
                    + mrf.unaries[2][l2]
                    + mrf.pairwise[0][2][l0 * 2 + l1]
                    + mrf.pairwise[1][2][l1 * 2 + l2]
                )
                best = min(best, cost)
    opt, _ = fixtures.brute_force_ilp_optimum(ilp)
    assert opt == pytest.approx(best)
    # end-to-end through the solver (tree MRF -> LP tight)
    s = BddSolver(
        {
            "relaxation solver": "ref mma",
            "termination criteria": {"maximum iterations": 200},
        }
    )
    s.read_ilp(ilp=ilp)
    result = s.solve(verbose=False)
    assert result["lower_bound"] == pytest.approx(best, abs=1e-4)


def test_graph_matching_construct_and_solve():
    inst = parse_dd_string(DD_SMALL)
    assert len(inst.linear) == 4
    assert len(inst.quadratic) == 2
    ilp, lin_map, quad_map = construct_graph_matching_ilp(inst)
    # identity matching (0->0, 1->1) costs -2 -2 + quadratic e(0,3) = -5
    opt, x = fixtures.brute_force_ilp_optimum(ilp)
    assert opt == pytest.approx(-5.0)
    s = BddSolver(
        {
            "relaxation solver": "ref mma",
            "variable order": "bfs",
            "termination criteria": {"maximum iterations": 500},
        }
    )
    s.read_ilp(ilp=ilp)
    result = s.solve(verbose=False)
    assert result["lower_bound"] <= opt + 1e-6
    if "objective" in result:
        assert result["objective"] >= opt - 1e-6


def test_multi_graph_matching():
    # 3 graphs with 2 points each; pairwise identity matchings preferred
    def block(costs):
        lines = ["p 2 2 4 0"]
        a = 0
        for i in range(2):
            for j in range(2):
                lines.append(f"a {a} {i} {j} {costs[i][j]}")
                a += 1
        return "\n".join(lines)

    ident = [[-1.0, 0.0], [0.0, -1.0]]
    swap = [[0.0, -1.0], [-1.0, 0.0]]
    text = "\n".join(
        [
            "gm 0 1",
            block(ident),
            "gm 0 2",
            block(ident),
            "gm 1 2",
            block(swap),  # conflicts with the two identities
        ]
    )
    blocks = parse_mgm_string(text)
    assert set(blocks) == {(0, 1), (0, 2), (1, 2)}
    ilp = construct_multi_graph_matching_ilp(blocks)

    def assign(matchings):
        """matchings: {(p,q): {left_pt: right_pt or 'slack'}} -> 0/1 vector."""
        x = [0] * ilp.nr_variables()
        for (p, q), m in matchings.items():
            used_right = set(m.values())
            for i, j in m.items():
                if j == "s":
                    x[ilp.get_var_index(f"mgm_{p}_{q}_x_{i}_s")] = 1
                else:
                    x[ilp.get_var_index(f"mgm_{p}_{q}_x_{i}_{j}")] = 1
            for j in range(2):
                if j not in used_right:
                    x[ilp.get_var_index(f"mgm_{p}_{q}_x_s_{j}")] = 1
        return x

    ident_m = {0: 0, 1: 1}
    swap_m = {0: 1, 1: 0}
    slack_m = {0: "s", 1: "s"}
    # both identities + the conflicting swap: -6 objective but violates cycle
    # consistency
    x_bad = assign({(0, 1): ident_m, (0, 2): ident_m, (1, 2): swap_m})
    assert ilp.evaluate(x_bad) == math.inf
    # identities + abstaining third matching: ALSO infeasible — consistency
    # forces the transitively implied match (sum x_ik*x_jk <= x_ij)
    x_abstain = assign({(0, 1): ident_m, (0, 2): ident_m, (1, 2): slack_m})
    assert ilp.evaluate(x_abstain) == math.inf
    # the consistent closure: identity everywhere; (1,2)'s identity entries
    # cost 0 under the swap-preferring block, so total is -4
    x_id3 = assign({(0, 1): ident_m, (0, 2): ident_m, (1, 2): ident_m})
    assert ilp.evaluate(x_id3) == pytest.approx(-4.0)
    # all three abstaining is consistent and costs 0
    x_none = assign({k: slack_m for k in blocks})
    assert ilp.evaluate(x_none) == pytest.approx(0.0)


def test_graph_matching_generator():
    from bdd_tpu.frontends.graph_matching import construct_graph_matching_ilp
    from bdd_tpu.utils.problems import graph_matching

    inst = graph_matching(6, 6, seed=1, candidates=3, nr_quadratic=10)
    ilp, lin_map, quad_map = construct_graph_matching_ilp(inst)
    assert ilp.nr_constraints() >= 12  # 6 left + 6 right simplexes
    # solvable end-to-end
    s = BddSolver(
        {
            "relaxation solver": "ref mma",
            "variable order": "bfs",
            "termination criteria": {"maximum iterations": 300},
        }
    )
    s.read_ilp(ilp=ilp)
    r = s.solve(verbose=False)
    assert r["status"] == "solved"
    assert np.isfinite(r["lower_bound"])


def test_mps_round_trip():
    """write_mps -> parse_mps_string must reproduce the instance exactly
    (objective, constraints, evaluation on random points)."""
    import numpy as np

    from bdd_tpu.ilp import parse_lp_string, parse_mps_string
    from bdd_tpu.utils.problems import grid_mrf, set_cover

    for ilp in [
        parse_lp_string(fixtures.TWO_SIMPLEX),
        grid_mrf(3, 3, 2, seed=0),
        set_cover(10, 20, seed=4),
    ]:
        back = parse_mps_string(ilp.write_mps())
        assert back.nr_variables() == ilp.nr_variables()
        assert back.var_names == ilp.var_names
        assert len(back.constraints_) == len(ilp.constraints_)
        assert np.allclose(back.objective(), ilp.objective())
        rng = np.random.default_rng(0)
        for _ in range(20):
            x = rng.integers(0, 2, ilp.nr_variables()).tolist()
            assert back.feasible(x) == ilp.feasible(x)
            if ilp.feasible(x):
                assert back.evaluate(x) == pytest.approx(ilp.evaluate(x))


def test_mps_bounds_and_fixations():
    from bdd_tpu.ilp import parse_mps_string

    mps = """NAME test
ROWS
 N  COST
 L  R0
COLUMNS
    x  COST  1.5
    x  R0  1
    y  COST  -2
    y  R0  1
    z  COST  4
    z  R0  1
RHS
    RHS  R0  2
BOUNDS
 BV BND  x
 FX BND  y  1
 UP BND  z  1
ENDATA
"""
    ilp = parse_mps_string(mps)
    # y fixed to 1: reduced out of the model, objective constant absorbed
    assert ilp.nr_variables() == 2
    assert ilp.constant_ == pytest.approx(-2.0)
    # R0 becomes x + z <= 1
    c = ilp.constraints_[0]
    assert c.rhs == 1

    with pytest.raises(ValueError):
        parse_mps_string("RANGES\n")
    with pytest.raises(ValueError):
        parse_mps_string(
            "ROWS\n N  C\n L  R\nCOLUMNS\n    x  R  1\nBOUNDS\n UP BND  x  3\n"
        )


def test_mps_cli_round_trip(tmp_path):
    import subprocess
    import sys as _sys

    from bdd_tpu.ilp import parse_lp_string

    ilp = parse_lp_string(fixtures.COVERING)
    mps_file = tmp_path / "c.mps"
    mps_file.write_text(ilp.write_mps())
    out = subprocess.run(
        [_sys.executable, "-m", "bdd_tpu.ilp", "mps2lp", str(mps_file)],
        capture_output=True,
        text=True,
        check=True,
    )
    back = parse_lp_string(out.stdout)
    assert back.nr_variables() == ilp.nr_variables()
    assert np.allclose(back.objective(), ilp.objective())


def test_specialized_input_dispatch(tmp_path):
    """CLI-level specialized frontends via 'input type' / extension
    (ref: src/specialized_solvers/*_solver_cl.cpp)."""
    from bdd_tpu.api import BddSolver

    uai = tmp_path / "chain.uai"
    uai.write_text(UAI_CHAIN)
    s = BddSolver(
        {
            "input": str(uai),
            "relaxation solver": "parallel mma",
            "termination criteria": {"maximum iterations": 40},
        }
    )
    res = s.solve(verbose=False)
    assert "lower_bound" in res

    dd = tmp_path / "small.dd"
    dd.write_text(DD_SMALL)
    s2 = BddSolver(
        {
            "input": str(dd),
            "input type": "graph matching",
            "relaxation solver": "parallel mma",
            "termination criteria": {"maximum iterations": 40},
        }
    )
    res2 = s2.solve(verbose=False)
    assert "lower_bound" in res2


def test_mgm_sparse_blocks_and_empty():
    """Sparse multi-graph instances (missing pairwise blocks) construct
    without cycle constraints through the absent pairs (regression:
    KeyError); an empty file raises a clear error."""
    from bdd_tpu.frontends.multi_graph_matching import (
        construct_multi_graph_matching_ilp,
        parse_mgm_string,
    )

    text = """gm 0 1
p 2 2 2 0
a 0 0 0 -1.0
a 1 1 1 -1.0
gm 1 2
p 2 2 2 0
a 0 0 0 -2.0
a 1 1 1 -2.0
"""
    blocks = parse_mgm_string(text)
    assert set(blocks) == {(0, 1), (1, 2)}
    ilp = construct_multi_graph_matching_ilp(blocks)  # no (0, 2) block: OK
    assert ilp.nr_variables() > 0
    with pytest.raises(ValueError):
        construct_multi_graph_matching_ilp({})
