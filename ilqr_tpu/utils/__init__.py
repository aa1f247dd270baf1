from ilqr_tpu.utils.splines import CubicSpline1D, CubicSpline2D, calc_spline_course
from ilqr_tpu.utils.refline import ReferenceLine, RoutingLine
from ilqr_tpu.utils.timing import TicToc

__all__ = [
    "CubicSpline1D",
    "CubicSpline2D",
    "calc_spline_course",
    "ReferenceLine",
    "RoutingLine",
    "TicToc",
]
