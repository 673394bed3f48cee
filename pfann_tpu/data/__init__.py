from pfann_tpu.data.shuffler import TwoStageShuffler, batched
from pfann_tpu.data.mock import MockedDataLoader

__all__ = ["TwoStageShuffler", "batched", "MockedDataLoader"]
