from kmcex_tpu.core import codec, murmur, occu_bin

__all__ = ["codec", "murmur", "occu_bin"]
