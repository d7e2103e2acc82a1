"""Engine configuration constants.

The reference fixes a single world CRS per job (SURVEY.md §1, probe at
/root/reference/orthority/ortho.py:144-151). We do the same: one projected
planar world frame per job, linked to geographic lat/lon by an exact linear
(equirectangular) map so that geotags extracted from page text and camera
footprints derived from exterior orientation live on the same plane. The
linear map keeps every transform exactly expressible both as Spark Column
arithmetic and ANSI SQL (for the DuckDB oracle) — no pyproj on executors.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# World frame: x = (lon - LON0) * M_PER_DEG ; y = (lat - LAT0) * M_PER_DEG
# (exactly invertible in float64; both directions single mul + add)
# ---------------------------------------------------------------------------
LON0 = 24.0
LAT0 = -34.0
M_PER_DEG = 100000.0  # scaled metres per degree (equirectangular)

# ---------------------------------------------------------------------------
# Tiling grid (H3-style deterministic quad grid, see orthority_spark.grid)
# ---------------------------------------------------------------------------
GRID_RES = 20          # default cell resolution for tile joins
                       # (cell ~0.00034 deg; ~13x10 cells across the fixture
                       # footprint block)
ROLLUP_RESES = (20, 18, 16)  # overview-pyramid resolutions (S17 analogue)

# ---------------------------------------------------------------------------
# Synthetic pages geotag distribution (frozen constants, microdegrees).
# Derived once from the footprint union bbox (sources/footprints.py) and
# hard-coded so engine, numpy oracle, and DuckDB oracle share exact values:
# 60% of pages spread inside the footprint block, 20% shifted outside
# (negative join cases), 20% concentrated in ONE mega-cell (skew/salting
# fixture — a single join key ~40x hotter than the median cell).
# ---------------------------------------------------------------------------
LON_MIN_UDEG = 24_198_400
LON_SPAN_UDEG = 4_700
LAT_MIN_UDEG = -33_701_300
LAT_SPAN_UDEG = 3_900
MEGA_LON_UDEG = 24_199_934   # center of img_0000's footprint
MEGA_LAT_UDEG = -33_700_062
OUTSIDE_SHIFT_UDEG = 500_000  # +0.5 deg lon shift for the 'outside' 20%

# ---------------------------------------------------------------------------
# Skew handling
# ---------------------------------------------------------------------------
N_SALT = 8             # salting factor for skewed mega-cells (SURVEY §4 O9)

# ground plane z for footprints / projection queries (DEM fixture offset,
# /root/reference/tests/conftest.py:45-50 — 825 m plane)
DEM_Z = 825.0

# ---------------------------------------------------------------------------
# Checksum moduli (order-independent, overflow-safe under int64 sums)
# ---------------------------------------------------------------------------
CHECKSUM_MOD = 1_000_000_007          # per-row hash modulus; sum of < 9e9
                                      # rows stays inside int64
MD5_PREFIX_LEN = 15                   # 60-bit hash from md5 hex prefix

# Default shuffle partitioning for local test sessions
SHUFFLE_PARTITIONS = 32
