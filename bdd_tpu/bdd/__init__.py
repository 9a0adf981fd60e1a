from bdd_tpu.bdd.collection import BddCollection, TOP, BOT
from bdd_tpu.bdd.lineq import bdd_from_inequality
from bdd_tpu.bdd.preprocessor import BddPreprocessor

__all__ = ["BddCollection", "TOP", "BOT", "bdd_from_inequality", "BddPreprocessor"]
