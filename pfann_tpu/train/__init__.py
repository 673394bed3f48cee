from pfann_tpu.train.loss import similarity_loss
from pfann_tpu.train.schedule import cosine_warm_restarts

__all__ = ["similarity_loss", "cosine_warm_restarts"]
