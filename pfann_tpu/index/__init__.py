from pfann_tpu.index.database import Database
from pfann_tpu.index.search import mips_topk, seq_rerank


def __getattr__(name):
    # heavier engines load lazily (importing them pulls in pallas)
    if name == "AlignmentEngine":
        from pfann_tpu.index.align import AlignmentEngine

        return AlignmentEngine
    if name == "ScreenedAlignmentEngine":
        from pfann_tpu.index.screen import ScreenedAlignmentEngine

        return ScreenedAlignmentEngine
    raise AttributeError(name)


__all__ = [
    "Database",
    "mips_topk",
    "seq_rerank",
    "AlignmentEngine",
    "ScreenedAlignmentEngine",
]
