from kanodes_tpu.models.kdense import KDense, KDense1, KANChain
from kanodes_tpu.models.mlp import MLP

__all__ = ["KDense", "KDense1", "KANChain", "MLP"]
