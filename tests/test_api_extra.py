"""Additional API coverage: OPB end-to-end, native fallback, config handling."""
import json

import pytest

from bdd_tpu.api import BddSolver
from tests import fixtures


def test_opb_end_to_end(tmp_path):
    opb = "min: 2 x1 + 1 x2 + 3 x3;\n1 x1 + 1 x2 + 1 x3 >= 2;\n"
    p = tmp_path / "prob.opb"
    p.write_text(opb)
    s = BddSolver({"relaxation solver": "ref mma"})
    s.read_ilp(path=str(p))
    r = s.solve(verbose=False)
    assert r["status"] == "solved"
    assert r["objective"] == pytest.approx(3.0)  # x1 + x2


def test_native_path_used_for_lp(tmp_path):
    lp = fixtures.MATCHING_3x3
    s = BddSolver(
        {
            "relaxation solver": "uniform mma",
            "variable order": "bfs",
            "termination criteria": {"maximum iterations": 200},
        }
    )
    s.read_ilp(lp_string=lp)
    r = s.solve(verbose=False)
    assert r["status"] == "solved"
    # native path attaches the NativeHost
    assert getattr(s, "_native", None) is not None
    assert r["objective"] == pytest.approx(-6.0)


def test_python_fallback_for_nonlinear():
    lp = """Minimize
-2 x - 2 y + 3 z
Subject To
x + y <= 2
x*y - z <= 0
End"""
    s = BddSolver(
        {
            "relaxation solver": "uniform mma",
            "termination criteria": {"maximum iterations": 300},
        }
    )
    s.read_ilp(lp_string=lp)
    r = s.solve(verbose=False)
    assert r["status"] == "solved"
    assert getattr(s, "_native", None) is None  # fell back to python pipeline
    opt, _ = fixtures.brute_force_ilp_optimum(s.ilp)
    assert r["lower_bound"] <= opt + 1e-5


def test_cli_config_file(tmp_path, capsys):
    from bdd_tpu.api import main

    lp = tmp_path / "m.lp"
    lp.write_text(fixtures.COVERING)
    cfg = tmp_path / "cfg.json"
    cfg.write_text(
        json.dumps(
            {
                "input": str(lp),
                "relaxation solver": "ref mma",
                "termination criteria": {"maximum iterations": 200},
            }
        )
    )
    assert main([str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "lower_bound" in out


def test_converter_cli(tmp_path, capsys):
    from bdd_tpu.ilp.__main__ import main

    lp = tmp_path / "m.lp"
    lp.write_text("Minimize\nx + y\nSubject To\nx + y >= 1\nEnd")
    assert main(["lp2opb", str(lp)]) == 0
    assert "min:" in capsys.readouterr().out
    assert main(["lp2mps", str(lp)]) == 0
    assert "ENDATA" in capsys.readouterr().out
