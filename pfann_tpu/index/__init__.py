from pfann_tpu.index.database import Database
from pfann_tpu.index.search import mips_topk, seq_rerank

__all__ = ["Database", "mips_topk", "seq_rerank"]
