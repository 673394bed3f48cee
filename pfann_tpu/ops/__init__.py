from pfann_tpu.ops.melspec import MelSpec, build_mel_spec_layer, mel_filterbank
from pfann_tpu.ops.specaug import SpecAugment

__all__ = ["MelSpec", "build_mel_spec_layer", "mel_filterbank", "SpecAugment"]
