from kanodes_tpu.models.kdense import KDense, KDense1, KANChain
from kanodes_tpu.models.mlp import MLP
from kanodes_tpu.models.bspline import BSplineKAN, BSplineKANChain
from kanodes_tpu.models.hybrid import DataNormalizer, HybridKANMLP

__all__ = ["KDense", "KDense1", "KANChain", "MLP", "BSplineKAN",
           "BSplineKANChain", "DataNormalizer", "HybridKANMLP"]
