"""TPU-native sparse substrate: padded-ELL and block-ELL containers."""

from .ell import SparseELL, ell_matvec
from .bell import BlockELL
from .ops import spgemm, rap, transpose

__all__ = ["SparseELL", "BlockELL", "ell_matvec", "spgemm", "rap", "transpose"]
