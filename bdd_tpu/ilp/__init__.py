from bdd_tpu.ilp.model import ILPInput, Constraint, Ineq
from bdd_tpu.ilp.lp_parser import parse_lp_string, parse_lp_file

__all__ = ["ILPInput", "Constraint", "Ineq", "parse_lp_string", "parse_lp_file"]
