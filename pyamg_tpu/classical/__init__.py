"""Classical (Ruge-Stuben) AMG."""

from . import split, cr
from .classical import ruge_stuben_solver
from .interpolate import direct_interpolation, standard_interpolation
from .cr import CR, binormalize

__all__ = ["split", "cr", "ruge_stuben_solver", "direct_interpolation",
           "standard_interpolation", "CR", "binormalize"]
