"""S2 geometry constants.

Semantics follow the public S2 geometry model (reference:
/root/reference/S2Geometry/S2Constants.cs, S2Coords.cs:18-78,
S2Metrics.cs, S2Earth.cs:115). Values are the published S2 constants.
"""

from __future__ import annotations

import math

# Cell decomposition (S2Constants.cs:31,37,43)
MAX_LEVEL = 30
LIMIT_IJ = 1 << MAX_LEVEL  # 2^30: number of leaf cells along a face axis
MAX_SITI = 1 << (MAX_LEVEL + 1)  # 2^31
NUM_FACES = 6

# Cell-id bit layout (S2CellId.cs:50-62)
FACE_BITS = 3
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL
LOOKUP_BITS = 4
WRAP_OFFSET = NUM_FACES << POS_BITS

# Hilbert curve orientation masks (S2Constants / S2Coords tables)
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# Sentinel / none ids (S2CellId.cs)
NONE_ID = 0
SENTINEL_ID = (1 << 64) - 1  # ~0UL

# Biasing constant for signed-long storage of unsigned cell ids.
# cell_id_biased = cell_id XOR 2^63 is order-isomorphic to unsigned order
# when compared as a signed 64-bit integer (SURVEY.md §1.1 signedness trap).
BIAS = 1 << 63
U64 = 1 << 64

# Earth model (S2Earth.cs:115-116)
EARTH_RADIUS_METERS = 6371010.0
EARTH_RADIUS_KM = 6371.010

# --- S2 metrics (quadratic projection, S2Metrics.cs) -------------------
# A metric's value at level k is deriv * 2^(-dim*k) with dim=1 (length)
# or dim=2 (area).  Published quadratic-projection derivatives:
KMIN_ANGLE_SPAN_DERIV = 4.0 / 3.0
KMAX_ANGLE_SPAN_DERIV = 1.704897179199218452
KAVG_ANGLE_SPAN_DERIV = math.pi / 2.0
KMIN_WIDTH_DERIV = 2.0 * math.sqrt(2.0) / 3.0
KMAX_WIDTH_DERIV = KMAX_ANGLE_SPAN_DERIV
KAVG_WIDTH_DERIV = 1.434523672886099389
KMIN_EDGE_DERIV = 2.0 * math.sqrt(2.0) / 3.0
KMAX_EDGE_DERIV = KMAX_ANGLE_SPAN_DERIV
KAVG_EDGE_DERIV = 1.459213746386106062
KMIN_DIAG_DERIV = 8.0 * math.sqrt(2.0) / 9.0
KMAX_DIAG_DERIV = 2.438654594434021032
KAVG_DIAG_DERIV = 2.060422738998471683
KMIN_AREA_DERIV = 8.0 * math.sqrt(2.0) / 9.0
KMAX_AREA_DERIV = 2.635799256963161491
KAVG_AREA_DERIV = 4.0 * math.pi / 6.0  # exact: each face is 4pi/6 sr


class LengthMetric:
    """1-dimensional metric (S2Metrics.cs:28-95): value(k) = deriv*2^-k."""

    def __init__(self, deriv: float):
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        return math.ldexp(self.deriv, -level)

    def get_level_for_max_value(self, value: float) -> int:
        """Min level such that value(level) <= value (cells at least this
        small)."""
        if value <= 0:
            return MAX_LEVEL
        # level = floor(log2(deriv / value)) clamped; mirror the reference's
        # exponent arithmetic: ilogb(value/deriv) rounding toward -inf.
        m, x = math.frexp(value / self.deriv)
        level = max(0, min(MAX_LEVEL, -(x - 1)))
        assert level == MAX_LEVEL or self.get_value(level) <= value
        assert level == 0 or self.get_value(level - 1) > value
        return level

    def get_level_for_min_value(self, value: float) -> int:
        """Max level such that value(level) >= value (cells at least this
        big)."""
        if value <= 0:
            return MAX_LEVEL
        m, x = math.frexp(self.deriv / value)
        level = max(0, min(MAX_LEVEL, x - 1))
        assert level == 0 or self.get_value(level) >= value
        assert level == MAX_LEVEL or self.get_value(level + 1) < value
        return level

    def get_closest_level(self, value: float) -> int:
        return self.get_level_for_max_value((math.sqrt(2.0)) * value)


class AreaMetric:
    """2-dimensional metric: value(k) = deriv*4^-k."""

    def __init__(self, deriv: float):
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        return math.ldexp(self.deriv, -2 * level)

    def get_level_for_max_value(self, value: float) -> int:
        if value <= 0:
            return MAX_LEVEL
        m, x = math.frexp(value / self.deriv)
        level = max(0, min(MAX_LEVEL, -((x - 1) >> 1)))
        assert level == MAX_LEVEL or self.get_value(level) <= value
        assert level == 0 or self.get_value(level - 1) > value
        return level

    def get_level_for_min_value(self, value: float) -> int:
        if value <= 0:
            return MAX_LEVEL
        m, x = math.frexp(self.deriv / value)
        level = max(0, min(MAX_LEVEL, (x - 1) >> 1))
        assert level == 0 or self.get_value(level) >= value
        assert level == MAX_LEVEL or self.get_value(level + 1) < value
        return level

    def get_closest_level(self, value: float) -> int:
        return self.get_level_for_max_value(2.0 * value)


KMIN_WIDTH = LengthMetric(KMIN_WIDTH_DERIV)
KMAX_WIDTH = LengthMetric(KMAX_WIDTH_DERIV)
KAVG_WIDTH = LengthMetric(KAVG_WIDTH_DERIV)
KMIN_EDGE = LengthMetric(KMIN_EDGE_DERIV)
KMAX_EDGE = LengthMetric(KMAX_EDGE_DERIV)
KAVG_EDGE = LengthMetric(KAVG_EDGE_DERIV)
KMIN_DIAG = LengthMetric(KMIN_DIAG_DERIV)
KMAX_DIAG = LengthMetric(KMAX_DIAG_DERIV)
KAVG_DIAG = LengthMetric(KAVG_DIAG_DERIV)
KMIN_ANGLE_SPAN = LengthMetric(KMIN_ANGLE_SPAN_DERIV)
KMAX_ANGLE_SPAN = LengthMetric(KMAX_ANGLE_SPAN_DERIV)
KAVG_ANGLE_SPAN = LengthMetric(KAVG_ANGLE_SPAN_DERIV)
KMIN_AREA = AreaMetric(KMIN_AREA_DERIV)
KMAX_AREA = AreaMetric(KMAX_AREA_DERIV)
KAVG_AREA = AreaMetric(KAVG_AREA_DERIV)


def meters_to_radians(meters: float) -> float:
    return meters / EARTH_RADIUS_METERS


def radians_to_meters(radians: float) -> float:
    return radians * EARTH_RADIUS_METERS
