from bdd_tpu.learn.model import DogePredictor
from bdd_tpu.learn.train import DogeTrainer, TrainConfig

__all__ = ["DogePredictor", "DogeTrainer", "TrainConfig"]
