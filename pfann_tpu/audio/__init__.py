from pfann_tpu.audio.io import get_audio, write_wav
from pfann_tpu.audio.resample import resample

__all__ = ["get_audio", "write_wav", "resample"]
