from pfann_tpu.models.fp_network import FpNetwork, build_fp_network

__all__ = ["FpNetwork", "build_fp_network"]
