from bdd_tpu.learn.model import DogePredictor
from bdd_tpu.learn.train import DogeTrainer, TrainConfig

__all__ = ["DogePredictor", "DogeTrainer", "TrainConfig"]
from bdd_tpu.learn.configs import config_ct, config_gm, config_mis, config_qaplib
from bdd_tpu.learn.sharded import ShardedDogeTrainer
