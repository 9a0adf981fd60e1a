from bdd_tpu.solver.flatten import FlatBdds, flatten_collection
from bdd_tpu.solver.ref_solver import RefSolver

__all__ = ["FlatBdds", "flatten_collection", "RefSolver"]
