"""From-scratch UTM / transverse-Mercator forward + inverse on GRS80,
via the public Krüger series in the third flattening n (the standard
published coefficients through n^4; see Karney 2011 "Transverse
Mercator with an accuracy of a few nanometers" for the series family).

This completes SURVEY M1: the reference accepts projected horizontal
CRSs (state-plane/UTM EPSG codes) and splits them into horizontal +
vertical before transforming (``reference/vyperdatum/vypercrs.py:685-812``,
``core.py:198-248``; its golden tests drive UTM and state-plane inputs,
``tests/test_core.py:89-199``). Here the projected-input path is:
inverse-project to geographic NAD83 -> PIP -> datum transform.

Parity discipline (same as core/helmert.py): hyperbolics and inverse
trig are spelled in exp/ln/atan2/sqrt primitives IDENTICALLY in numpy
and in the generated DuckDB SQL; outputs are quantized (easting /
northing to 1e-4 m, recovered lon/lat to 1e-7 deg) so 1-ulp libm noise
cannot flip a comparison.
"""

from __future__ import annotations

import numpy as np

from vyperdatum_ray.core.helmert import A, E2, DEG2RAD, RAD2DEG, sql_rn

K0 = 0.9996
FALSE_EASTING = 500000.0
E_ = np.sqrt(E2)  # first eccentricity
N3 = (1.0 - np.sqrt(1.0 - E2)) / (1.0 + np.sqrt(1.0 - E2))  # third flattening

# rectifying radius
A_BAR = (A / (1.0 + N3)) * (1.0 + N3 * N3 / 4.0 + N3 ** 4 / 64.0)

# Krüger series coefficients (public; through n^4)
ALPHA = (
    N3 / 2.0 - 2.0 / 3.0 * N3 ** 2 + 5.0 / 16.0 * N3 ** 3 + 41.0 / 180.0 * N3 ** 4,
    13.0 / 48.0 * N3 ** 2 - 3.0 / 5.0 * N3 ** 3 + 557.0 / 1440.0 * N3 ** 4,
    61.0 / 240.0 * N3 ** 3 - 103.0 / 140.0 * N3 ** 4,
    49561.0 / 161280.0 * N3 ** 4,
)
BETA = (
    N3 / 2.0 - 2.0 / 3.0 * N3 ** 2 + 37.0 / 96.0 * N3 ** 3 - 1.0 / 360.0 * N3 ** 4,
    N3 ** 2 / 48.0 + N3 ** 3 / 15.0 - 437.0 / 1440.0 * N3 ** 4,
    17.0 / 480.0 * N3 ** 3 - 37.0 / 840.0 * N3 ** 4,
    4397.0 / 161280.0 * N3 ** 4,
)
# conformal -> geodetic latitude series
DELTA = (
    2.0 * N3 - 2.0 / 3.0 * N3 ** 2 - 2.0 * N3 ** 3,
    7.0 / 3.0 * N3 ** 2 - 8.0 / 5.0 * N3 ** 3,
    56.0 / 15.0 * N3 ** 3,
)

E_DECIMALS = 4  # 0.1 mm easting/northing quantization
LL_DECIMALS = 7  # recovered lon/lat quantization


def zone_central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


# exp/ln-spelled hyperbolics — the SAME primitive set the SQL uses, so
# both sides share one expression tree (np.sinh etc. would be a
# different libm path)
def _sinh(x):
    return (np.exp(x) - np.exp(-x)) / 2.0


def _cosh(x):
    return (np.exp(x) + np.exp(-x)) / 2.0


def _atanh(x):
    return 0.5 * np.log((1.0 + x) / (1.0 - x))


def _asin(x):
    return np.arctan2(x, np.sqrt(1.0 - x * x))


def utm_forward(lon, lat, zone: int):
    """Geographic NAD83 -> UTM (meters), quantized to 0.1 mm."""
    lam0 = zone_central_meridian(zone) * DEG2RAD
    phi = lat * DEG2RAD
    lamd = lon * DEG2RAD - lam0
    s = np.sin(phi)
    t = _sinh(_atanh(s) - E_ * _atanh(E_ * s))
    xi = np.arctan2(t, np.cos(lamd))
    eta = _atanh(np.sin(lamd) / np.sqrt(1.0 + t * t))
    xi_s = xi
    eta_s = eta
    for j, a_j in enumerate(ALPHA, start=1):
        xi_s = xi_s + a_j * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        eta_s = eta_s + a_j * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    easting = FALSE_EASTING + K0 * A_BAR * eta_s
    northing = K0 * A_BAR * xi_s
    return np.round(easting, E_DECIMALS), np.round(northing, E_DECIMALS)


def utm_inverse(easting, northing, zone: int):
    """UTM (meters) -> geographic NAD83, quantized to 1e-7 deg."""
    lam0 = zone_central_meridian(zone) * DEG2RAD
    xi = northing / (K0 * A_BAR)
    eta = (easting - FALSE_EASTING) / (K0 * A_BAR)
    xi_p = xi
    eta_p = eta
    for j, b_j in enumerate(BETA, start=1):
        xi_p = xi_p - b_j * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        eta_p = eta_p - b_j * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    chi = _asin(np.sin(xi_p) / _cosh(eta_p))
    phi = chi
    for j, d_j in enumerate(DELTA, start=1):
        phi = phi + d_j * np.sin(2.0 * j * chi)
    lam = lam0 + np.arctan2(_sinh(eta_p), np.cos(xi_p))
    return (np.round(lam * RAD2DEG, LL_DECIMALS),
            np.round(phi * RAD2DEG, LL_DECIMALS))


# ------------------------------------------- Lambert conformal conic 2SP ---
#
# State-plane horizontal input CRS (SURVEY M1 / VERDICT r2 top item): the
# reference's golden suite transforms every region's points in geographic,
# state-plane AND UTM horizontal CRSs (``reference/tests/test_core.py:
# 130-154,231-244``; state-plane goldens ``vdatum_validation.py:1399-1400``
# EPSG:3631 NC, ``:1411-1412`` EPSG:3673 TX South Central, ``:1423-1424``
# EPSG:3495 CA zone 4). The LCC 2SP forward/inverse below follow the public
# Snyder / EPSG Guidance Note 7-2 formulas on GRS80, validated against the
# reference's VDatum-derived state-plane goldens in
# tests/test_helmert_projection.py.


class LCCZone:
    """One SPCS83 LCC 2SP zone: EPSG-published defining parameters in,
    derived projection scalars (n, aF, rF) precomputed once — the SQL
    mirror embeds the derived scalars via repr so both sides share the
    exact same doubles."""

    def __init__(self, name: str, lat1_deg: float, lat2_deg: float,
                 lat0_deg: float, lon0_deg: float,
                 false_easting: float, false_northing: float):
        self.name = name
        self.false_easting = false_easting
        self.false_northing = false_northing
        self.lam0 = lon0_deg * DEG2RAD

        def _m(phi):
            s = np.sin(phi)
            return np.cos(phi) / np.sqrt(1.0 - E2 * s * s)

        def _t(phi):
            s = np.sin(phi)
            return (np.sin(np.pi / 4.0 - phi / 2.0) / np.cos(np.pi / 4.0 - phi / 2.0)
                    ) / np.exp((E_ / 2.0) * np.log((1.0 - E_ * s) / (1.0 + E_ * s)))

        p1 = lat1_deg * DEG2RAD
        p2 = lat2_deg * DEG2RAD
        p0 = lat0_deg * DEG2RAD
        m1, m2 = _m(p1), _m(p2)
        t1, t2 = _t(p1), _t(p2)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        f_cap = m1 / (self.n * np.exp(self.n * np.log(t1)))
        self.aF = A * f_cap
        self.rF = self.aF * np.exp(self.n * np.log(_t(p0)))


def _dms(d: int, m: int) -> float:
    return d + m / 60.0


# ---------------------------------------- SPCS83 zone registry (data) ---
#
# One ROW per zone — EPSG-published defining parameters in their
# defining units (degrees-minutes spelled as _dms(...) for audit
# against the registry; SPCS83 is defined in meters so false origins
# are exact doubles). The projection KERNELS never change when a zone
# is added: growing coverage toward the reference's any-EPSG pyproj
# surface (reference/vyperdatum/vypercrs.py:685-812) is a data
# exercise — append a row. Zones beyond the reference-golden four
# (NC/TX-SC/CA-4/AK-1) were added round 5 from the public EPSG
# registry entries for the NAD83 metric state planes.
#
# LCC 2SP rows (EPSG method 9802):
#   (epsg, name, sp_north_deg, sp_south_deg, lat0_deg, lon0_deg, FE, FN)
SPCS83_LCC_ROWS = [
    (3631, "NC", _dms(36, 10), _dms(34, 20), _dms(33, 45), -79.0,
     609601.22, 0.0),
    (3673, "TX-SC", _dms(30, 17), _dms(28, 23), _dms(27, 50), -99.0,
     600000.0, 4000000.0),
    (3495, "CA-4", _dms(37, 15), 36.0, _dms(35, 20), -119.0,
     2000000.0, 500000.0),
    # round-5 additions (newly registered, no kernel changes)
    (26985, "MD", _dms(39, 27), _dms(38, 18), _dms(37, 40), -77.0,
     400000.0, 0.0),
    (26945, "CA-5", _dms(35, 28), _dms(34, 2), _dms(33, 30), -118.0,
     2000000.0, 500000.0),
    (26946, "CA-6", _dms(33, 53), _dms(32, 47), _dms(32, 10), -_dms(116, 15),
     2000000.0, 500000.0),
    (32139, "TX-C", _dms(31, 53), _dms(30, 7), _dms(29, 40), -_dms(100, 20),
     700000.0, 3000000.0),
    (26958, "FL-N", _dms(30, 45), _dms(29, 35), 29.0, -84.5,
     600000.0, 0.0),
]

STATE_PLANE_LCC = {
    epsg: LCCZone(name, sp_n, sp_s, lat0, lon0, fe, fn)
    for epsg, name, sp_n, sp_s, lat0, lon0, fe, fn in SPCS83_LCC_ROWS
}


def lcc_forward(lon, lat, epsg: int):
    """Geographic NAD83 -> state-plane LCC (meters), quantized 0.1 mm."""
    z = STATE_PLANE_LCC[epsg]
    phi = lat * DEG2RAD
    s = np.sin(phi)
    t = (np.sin(np.pi / 4.0 - phi / 2.0) / np.cos(np.pi / 4.0 - phi / 2.0)
         ) / np.exp((E_ / 2.0) * np.log((1.0 - E_ * s) / (1.0 + E_ * s)))
    r = z.aF * np.exp(z.n * np.log(t))
    th = z.n * (lon * DEG2RAD - z.lam0)
    easting = z.false_easting + r * np.sin(th)
    northing = z.false_northing + z.rF - r * np.cos(th)
    return np.round(easting, E_DECIMALS), np.round(northing, E_DECIMALS)


def lcc_inverse(easting, northing, epsg: int):
    """State-plane LCC (meters) -> geographic NAD83, quantized 1e-7 deg.
    Fixed 5-iteration conformal-latitude recovery (sub-1e-10 deg
    converged) — the iteration count is part of the defined semantics so
    the SQL mirror can unroll it; atan is spelled atan2(x, 1) on both
    sides."""
    z = STATE_PLANE_LCC[epsg]
    de = easting - z.false_easting
    dn = z.rF - (northing - z.false_northing)
    tp = np.exp((1.0 / z.n) * np.log(np.sqrt(de * de + dn * dn) / z.aF))
    phi = np.pi / 2.0 - 2.0 * np.arctan2(tp, 1.0)
    for _ in range(5):
        es = E_ * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan2(
            tp * np.exp((E_ / 2.0) * np.log((1.0 - es) / (1.0 + es))), 1.0)
    lam = np.arctan2(de, dn) / z.n + z.lam0
    return (np.round(lam * RAD2DEG, LL_DECIMALS),
            np.round(phi * RAD2DEG, LL_DECIMALS))


# --------------------------------- transverse-Mercator state plane (SPCS) ---
#
# SPCS83 TM zones (VERDICT r3 item 4): the reference handles the full
# EPSG universe via pyproj (``reference/vyperdatum/vypercrs.py:685-812``);
# here each registered zone reuses the golden-validated Krüger TM kernel
# above with the zone's EPSG-published natural origin / scale / false
# origin. No reference golden exercises a TM state plane (its goldens
# are LCC zones + AK zone 1's oblique Mercator,
# ``vdatum_validation.py:1399-1447``), so validation is (a) parameter
# identity with UTM reproduces utm_forward bit-for-bit and (b) forward
# -> inverse roundtrips to 1e-7 deg (tests/test_helmert_projection.py).


class TMZone:
    """One SPCS83 TM zone: EPSG-published defining parameters in,
    derived scalars (k0*A_BAR and the rectifying origin offset k0*m0)
    precomputed once; the SQL mirror repr-embeds the derived doubles so
    both sides share the exact same constants."""

    def __init__(self, name: str, k0: float, lon0_deg: float, lat0_deg: float,
                 false_easting: float, false_northing: float):
        self.name = name
        self.lam0 = lon0_deg * DEG2RAD
        self.false_easting = false_easting
        self.false_northing = false_northing
        self.ka = k0 * A_BAR
        # rectifying meridian arc at the latitude of natural origin
        # (eta = 0: cosh terms are 1), same series as the forward kernel
        phi0 = lat0_deg * DEG2RAD
        s0 = np.sin(phi0)
        t0 = _sinh(_atanh(s0) - E_ * _atanh(E_ * s0))
        xi0 = np.arctan2(t0, 1.0)
        xi0_s = xi0
        for j, a_j in enumerate(ALPHA, start=1):
            xi0_s = xi0_s + a_j * np.sin(2.0 * j * xi0)
        self.k0m0 = k0 * A_BAR * xi0_s


# SPCS83 metric TM rows (EPSG method 9807):
#   (epsg, name, k0, lon0_deg, lat0_deg, FE, FN)
# Delaware covers the fixture area's meridian band (CM 75deg25'W); the
# Alaska TM family zones 2-9 run CM -142 to -170 in 4-degree steps
# (origin 54N, k0 = 0.9999); the rest are round-5 registry additions.
SPCS83_TM_ROWS = [
    (26957, "DE", 0.999995, -_dms(75, 25), 38.0, 200000.0, 0.0),
    *[(26930 + z, f"AK-{z}", 0.9999, -142.0 - 4.0 * (z - 2), 54.0,
       500000.0, 0.0) for z in range(2, 10)],
    # round-5 additions (newly registered, no kernel changes)
    (32111, "NJ", 0.9999, -74.5, _dms(38, 50), 150000.0, 0.0),
    (26929, "AL-E", 0.99996, -_dms(85, 50), _dms(30, 30), 200000.0, 0.0),
    (26966, "GA-E", 0.9999, -_dms(82, 10), 30.0, 200000.0, 0.0),
    (26983, "ME-E", 0.9999, -68.5, _dms(43, 40), 300000.0, 0.0),
    (26994, "MS-E", 0.99995, -_dms(88, 50), _dms(29, 30), 300000.0, 0.0),
    (26948, "AZ-E", 0.9999, -_dms(110, 10), 31.0, 213360.0, 0.0),
]

STATE_PLANE_TM = {
    epsg: TMZone(name, k0, lon0, lat0, fe, fn)
    for epsg, name, k0, lon0, lat0, fe, fn in SPCS83_TM_ROWS
}


def tm_forward(lon, lat, epsg: int):
    """Geographic NAD83 -> SPCS83 TM (meters), quantized 0.1 mm. Same
    Krüger series/expression tree as ``utm_forward`` with the zone's
    natural origin: with UTM parameters (k0=0.9996, lat0=0, FE=500000,
    FN=0) this IS utm_forward (asserted in tests)."""
    z = STATE_PLANE_TM[epsg]
    phi = lat * DEG2RAD
    lamd = lon * DEG2RAD - z.lam0
    s = np.sin(phi)
    t = _sinh(_atanh(s) - E_ * _atanh(E_ * s))
    xi = np.arctan2(t, np.cos(lamd))
    eta = _atanh(np.sin(lamd) / np.sqrt(1.0 + t * t))
    xi_s = xi
    eta_s = eta
    for j, a_j in enumerate(ALPHA, start=1):
        xi_s = xi_s + a_j * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        eta_s = eta_s + a_j * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    easting = z.false_easting + z.ka * eta_s
    northing = z.false_northing + z.ka * xi_s - z.k0m0
    return np.round(easting, E_DECIMALS), np.round(northing, E_DECIMALS)


def tm_inverse(easting, northing, epsg: int):
    """SPCS83 TM (meters) -> geographic NAD83, quantized 1e-7 deg."""
    z = STATE_PLANE_TM[epsg]
    xi = (northing - z.false_northing + z.k0m0) / z.ka
    eta = (easting - z.false_easting) / z.ka
    xi_p = xi
    eta_p = eta
    for j, b_j in enumerate(BETA, start=1):
        xi_p = xi_p - b_j * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        eta_p = eta_p - b_j * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    chi = _asin(np.sin(xi_p) / _cosh(eta_p))
    phi = chi
    for j, d_j in enumerate(DELTA, start=1):
        phi = phi + d_j * np.sin(2.0 * j * chi)
    lam = z.lam0 + np.arctan2(_sinh(eta_p), np.cos(xi_p))
    return (np.round(lam * RAD2DEG, LL_DECIMALS),
            np.round(phi * RAD2DEG, LL_DECIMALS))


# ------------------------- Hotine oblique Mercator (SPCS83 Alaska zone 1) ---
#
# The reference's fourth state-plane golden drives AK zone 1
# (``vdatum_validation.py:1436-1441``, EPSG:3468) — a Hotine oblique
# Mercator (variant A: false origin at the NATURAL origin, the EPSG
# 9812 method), not a conic/cylindrical. Formulas follow the public
# Snyder / EPSG Guidance Note 7-2 development; the implementation is
# validated to 1 mm against the reference's VDatum-derived golden
# eastings/northings in tests/test_helmert_projection.py.


class OMZone:
    """One Hotine-OM zone: EPSG-published projection-centre /
    azimuth / scale parameters in, derived scalars (B, A, H, gamma0,
    lam0) precomputed once."""

    def __init__(self, name: str, k0: float, latc_deg: float, lonc_deg: float,
                 azimuth_deg: float, rect_skew_deg: float,
                 false_easting: float, false_northing: float):
        self.name = name
        self.false_easting = false_easting
        self.false_northing = false_northing
        phic = latc_deg * DEG2RAD
        alphac = azimuth_deg * DEG2RAD
        self.gammac = rect_skew_deg * DEG2RAD
        sc = np.sin(phic)
        self.B = np.sqrt(1.0 + E2 * np.cos(phic) ** 4 / (1.0 - E2))
        self.A2 = A * self.B * k0 * np.sqrt(1.0 - E2) / (1.0 - E2 * sc * sc)
        t0 = self._t(phic)
        d_cap = (self.B * np.sqrt(1.0 - E2)
                 / (np.cos(phic) * np.sqrt(1.0 - E2 * sc * sc)))
        d2 = max(d_cap * d_cap, 1.0)
        f_cap = d_cap + np.sqrt(d2 - 1.0) * np.sign(phic)
        self.H = f_cap * t0 ** self.B
        g_cap = (f_cap - 1.0 / f_cap) / 2.0
        self.gamma0 = np.arcsin(np.sin(alphac) / d_cap)
        self.lam0 = lonc_deg * DEG2RAD - np.arcsin(g_cap * np.tan(self.gamma0)) / self.B

    @staticmethod
    def _t(phi):
        s = np.sin(phi)
        return (np.tan(np.pi / 4.0 - phi / 2.0)
                / ((1.0 - E_ * s) / (1.0 + E_ * s)) ** (E_ / 2.0))


def _dms3(d: int, m: int, s: float) -> float:
    return d + m / 60.0 + s / 3600.0


# SPCS83 Alaska zone 1 under its NAD83 / NAD83(NSRS2007) EPSG codes
# (same defining parameters; 3468 is the code the reference golden uses)
_AK1 = dict(k0=0.9999, latc_deg=57.0, lonc_deg=-_dms3(133, 40, 0.0),
            azimuth_deg=_dms3(323, 7, 48.3685),
            rect_skew_deg=_dms3(323, 7, 48.3685),
            false_easting=5000000.0, false_northing=-5000000.0)
STATE_PLANE_OM = {
    26931: OMZone("AK-1", **_AK1),
    3468: OMZone("AK-1 (NSRS2007)", **_AK1),
}


def om_forward(lon, lat, epsg: int):
    """Geographic NAD83 -> SPCS83 AK-1 (meters), quantized 0.1 mm."""
    z = STATE_PLANE_OM[epsg]
    t = OMZone._t(np.asarray(lat, np.float64) * DEG2RAD)
    q = z.H / t ** z.B
    s = (q - 1.0 / q) / 2.0
    big_t = (q + 1.0 / q) / 2.0
    dl = z.B * (np.asarray(lon, np.float64) * DEG2RAD - z.lam0)
    v_ = np.sin(dl)
    u_cap = (-v_ * np.cos(z.gamma0) + s * np.sin(z.gamma0)) / big_t
    v = z.A2 * np.log((1.0 - u_cap) / (1.0 + u_cap)) / (2.0 * z.B)
    u = z.A2 * np.arctan2(s * np.cos(z.gamma0) + v_ * np.sin(z.gamma0),
                          np.cos(dl)) / z.B
    easting = v * np.cos(z.gammac) + u * np.sin(z.gammac) + z.false_easting
    northing = u * np.cos(z.gammac) - v * np.sin(z.gammac) + z.false_northing
    return np.round(easting, E_DECIMALS), np.round(northing, E_DECIMALS)


def om_inverse(easting, northing, epsg: int):
    """SPCS83 AK-1 (meters) -> geographic NAD83, quantized 1e-7 deg.
    Fixed 5-iteration isometric-latitude recovery, like lcc_inverse."""
    z = STATE_PLANE_OM[epsg]
    de = np.asarray(easting, np.float64) - z.false_easting
    dn = np.asarray(northing, np.float64) - z.false_northing
    vp = de * np.cos(z.gammac) - dn * np.sin(z.gammac)
    up = dn * np.cos(z.gammac) + de * np.sin(z.gammac)
    qp = np.exp(-z.B * vp / z.A2)
    sp = (qp - 1.0 / qp) / 2.0
    tp_ = (qp + 1.0 / qp) / 2.0
    vv = np.sin(z.B * up / z.A2)
    uu = (vv * np.cos(z.gamma0) + sp * np.sin(z.gamma0)) / tp_
    t = (z.H / np.sqrt((1.0 + uu) / (1.0 - uu))) ** (1.0 / z.B)
    phi = np.pi / 2.0 - 2.0 * np.arctan2(t, 1.0)
    for _ in range(5):
        es = E_ * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan2(
            t * ((1.0 - es) / (1.0 + es)) ** (E_ / 2.0), 1.0)
    lam = z.lam0 - np.arctan2(sp * np.cos(z.gamma0) - vv * np.sin(z.gamma0),
                              np.cos(z.B * up / z.A2)) / z.B
    return (np.round(lam * RAD2DEG, LL_DECIMALS),
            np.round(phi * RAD2DEG, LL_DECIMALS))


# ----------------------------------------------------------- SQL mirror ---


def _s_sinh(x: str) -> str:
    return f"((exp({x}) - exp(0.0 - ({x}))) / 2.0)"


def _s_cosh(x: str) -> str:
    return f"((exp({x}) + exp(0.0 - ({x}))) / 2.0)"


def _s_atanh(x: str) -> str:
    return f"(0.5 * ln((1.0 + ({x})) / (1.0 - ({x}))))"


def sql_lcc_inverse_ctes(prefix: str, src: str, easting: str, northing: str,
                         epsg: int, key_cols: str) -> str:
    """CTE chain mirroring ``lcc_inverse`` for a registered state-plane
    zone: emits ``{prefix}lcc(key_cols, rlon, rlat)`` — the recovered
    geographic coordinates, quantized exactly as the numpy kernel. All
    per-zone scalars (n, aF, rF, lam0) are computed ONCE in Python and
    repr-embedded, so only the per-point expression tree needs parity;
    intermediates are vl_-prefixed against caller column collisions.
    (The FORWARD projection never runs in SQL: the state-plane input
    dataset is materialized by the fixture generator, so both sides read
    identical projected doubles — see fixtures._write_stateplane.)"""
    z = STATE_PLANE_LCC[epsg]
    r2d = "(180.0 / pi())"
    e_ = repr(float(E_))
    eh = repr(float(E_ / 2.0))
    n_ = repr(float(z.n))
    af = repr(float(z.aF))
    rf = repr(float(z.rF))
    lam0 = repr(float(z.lam0))
    fe = repr(float(z.false_easting))
    fn = repr(float(z.false_northing))

    # 5 unrolled inverse-latitude iterations, same recurrence as
    # lcc_inverse (atan spelled atan2(x, 1.0) on both sides)
    phi_iter = ""
    prev_cte = f"{prefix}li0"
    for k in range(1, 6):
        es = f"{e_} * sin(vl_phi{k - 1})"
        phi_iter += f""",
{prefix}li{k} AS (
  SELECT *, pi() / 2.0 - 2.0 * atan2(vl_tp * exp({eh} * ln((1.0 - {es}) / (1.0 + {es}))), 1.0) AS vl_phi{k}
  FROM {prev_cte}
)"""
        prev_cte = f"{prefix}li{k}"

    return f"""
{prefix}l0 AS (
  SELECT {key_cols}, ({easting}) - {fe} AS vl_de,
    {rf} - (({northing}) - {fn}) AS vl_dn
  FROM {src}
),
{prefix}l1 AS (
  SELECT *, exp((1.0 / {n_}) * ln(sqrt(vl_de * vl_de + vl_dn * vl_dn) / {af})) AS vl_tp
  FROM {prefix}l0
),
{prefix}li0 AS (
  SELECT *, pi() / 2.0 - 2.0 * atan2(vl_tp, 1.0) AS vl_phi0 FROM {prefix}l1
){phi_iter},
{prefix}lcc AS (
  SELECT {key_cols},
    {sql_rn(f"(atan2(vl_de, vl_dn) / {n_} + {lam0}) * {r2d}", LL_DECIMALS)} AS rlon,
    {sql_rn(f"vl_phi5 * {r2d}", LL_DECIMALS)} AS rlat
  FROM {prefix}li5
)"""


def sql_tm_inverse_ctes(prefix: str, src: str, easting: str, northing: str,
                        epsg: int, key_cols: str) -> str:
    """CTE chain mirroring ``tm_inverse`` for a registered SPCS83 TM
    zone: emits ``{prefix}tm(key_cols, rlon, rlat)`` — the recovered
    geographic coordinates, quantized exactly as the numpy kernel.
    Zone scalars (ka = k0*A_BAR, k0m0, lam0, false origin) are
    repr-embedded; intermediates are vt_-prefixed against caller
    column collisions. (The FORWARD projection never runs in SQL: the
    fixture materializes the projected input once with tm_forward, so
    both sides read identical doubles — fixtures._write_stateplane_tm.)"""
    z = STATE_PLANE_TM[epsg]
    r2d = "(180.0 / pi())"
    ka = repr(float(z.ka))
    k0m0 = repr(float(z.k0m0))
    lam0 = repr(float(z.lam0))
    fe = repr(float(z.false_easting))
    fn = repr(float(z.false_northing))

    inv_xi = "vt_ixi"
    inv_eta = "vt_ieta"
    for j, b_j in enumerate(BETA, start=1):
        inv_xi = (f"({inv_xi} - {repr(float(b_j))} * sin({2.0 * j} * vt_ixi)"
                  f" * {_s_cosh(f'{2.0 * j} * vt_ieta')})")
        inv_eta = (f"({inv_eta} - {repr(float(b_j))} * cos({2.0 * j} * vt_ixi)"
                   f" * {_s_sinh(f'{2.0 * j} * vt_ieta')})")
    phi = "vt_chi"
    for j, d_j in enumerate(DELTA, start=1):
        phi = f"({phi} + {repr(float(d_j))} * sin({2.0 * j} * vt_chi))"

    return f"""
{prefix}t0 AS (
  SELECT {key_cols},
    (({northing}) - {fn} + {k0m0}) / {ka} AS vt_ixi,
    (({easting}) - {fe}) / {ka} AS vt_ieta
  FROM {src}
),
{prefix}t1 AS (
  SELECT *, {inv_xi} AS vt_xip, {inv_eta} AS vt_etap FROM {prefix}t0
),
{prefix}t2 AS (
  SELECT *, atan2(sin(vt_xip) / {_s_cosh('vt_etap')},
                  sqrt(1.0 - (sin(vt_xip) / {_s_cosh('vt_etap')})
                             * (sin(vt_xip) / {_s_cosh('vt_etap')}))) AS vt_chi
  FROM {prefix}t1
),
{prefix}tm AS (
  SELECT {key_cols},
    {sql_rn(f"({lam0} + atan2({_s_sinh('vt_etap')}, cos(vt_xip))) * {r2d}", LL_DECIMALS)} AS rlon,
    {sql_rn(f"({phi}) * {r2d}", LL_DECIMALS)} AS rlat
  FROM {prefix}t2
)"""


def sql_lcc_roundtrip_ctes(prefix: str, src: str, lon: str, lat: str,
                           epsg: int, key_cols: str) -> str:
    """Forward LCC 2SP then inverse, mirroring ``lcc_forward`` ->
    ``lcc_inverse`` for a registered zone: emits
    ``{prefix}lcc(key_cols, easting, northing, rlon, rlat)``. The
    forward tree is spelled exactly as the numpy kernel (t via
    sin/cos over exp/ln, r = aF * exp(n ln t)) with vf_-prefixed
    intermediates; the inverse reuses ``sql_lcc_inverse_ctes`` on the
    rounded projected doubles, exactly as the engine feeds
    ``lcc_forward``'s rounded output into ``lcc_inverse``."""
    z = STATE_PLANE_LCC[epsg]
    d2r = "(pi() / 180.0)"
    e_ = repr(float(E_))
    eh = repr(float(E_ / 2.0))
    n_ = repr(float(z.n))
    af = repr(float(z.aF))
    rf = repr(float(z.rF))
    lam0 = repr(float(z.lam0))
    fe = repr(float(z.false_easting))
    fn = repr(float(z.false_northing))
    es = f"{e_} * sin(vf_phi)"
    t = (f"((sin(pi() / 4.0 - vf_phi / 2.0) / cos(pi() / 4.0 - vf_phi / 2.0))"
         f" / exp({eh} * ln((1.0 - {es}) / (1.0 + {es}))))")
    fwd = f"""
{prefix}f0 AS (
  SELECT {key_cols}, ({lat}) * {d2r} AS vf_phi,
    {n_} * (({lon}) * {d2r} - {lam0}) AS vf_th
  FROM {src}
),
{prefix}f1 AS (
  SELECT *, {af} * exp({n_} * ln({t})) AS vf_r FROM {prefix}f0
),
{prefix}fw AS (
  SELECT {key_cols},
    {sql_rn(f"{fe} + vf_r * sin(vf_th)", E_DECIMALS)} AS easting,
    {sql_rn(f"{fn} + {rf} - vf_r * cos(vf_th)", E_DECIMALS)} AS northing
  FROM {prefix}f1
)"""
    inv = sql_lcc_inverse_ctes(prefix, f"{prefix}fw", "easting", "northing",
                               epsg, f"{key_cols}, easting, northing")
    return fwd + "," + inv


def sql_tm_roundtrip_ctes(prefix: str, src: str, lon: str, lat: str,
                          epsg: int, key_cols: str) -> str:
    """Forward SPCS83 TM (Krüger) then inverse, mirroring
    ``tm_forward`` -> ``tm_inverse`` for a registered zone: emits
    ``{prefix}tm(key_cols, easting, northing, rlon, rlat)``. Same
    series/expression tree as ``sql_utm_roundtrip_ctes`` with the
    zone's ka / k0m0 / false origin repr-embedded; the inverse reuses
    ``sql_tm_inverse_ctes`` on the rounded projected doubles."""
    z = STATE_PLANE_TM[epsg]
    d2r = "(pi() / 180.0)"
    e_ = repr(float(E_))
    ka = repr(float(z.ka))
    k0m0 = repr(float(z.k0m0))
    lam0 = repr(float(z.lam0))
    fe = repr(float(z.false_easting))
    fn = repr(float(z.false_northing))

    fwd_xi = "vf_xi"
    fwd_eta = "vf_eta"
    for j, a_j in enumerate(ALPHA, start=1):
        fwd_xi = (f"({fwd_xi} + {repr(float(a_j))} * sin({2.0 * j} * vf_xi)"
                  f" * {_s_cosh(f'{2.0 * j} * vf_eta')})")
        fwd_eta = (f"({fwd_eta} + {repr(float(a_j))} * cos({2.0 * j} * vf_xi)"
                   f" * {_s_sinh(f'{2.0 * j} * vf_eta')})")
    fwd = f"""
{prefix}f0 AS (
  SELECT {key_cols}, ({lat}) * {d2r} AS vf_phi,
    ({lon}) * {d2r} - {lam0} AS vf_lamd
  FROM {src}
),
{prefix}f1 AS (
  SELECT *, {_s_sinh(f"{_s_atanh('sin(vf_phi)')} - {e_} * {_s_atanh(f'{e_} * sin(vf_phi)')}")} AS vf_t
  FROM {prefix}f0
),
{prefix}f2 AS (
  SELECT *, atan2(vf_t, cos(vf_lamd)) AS vf_xi,
    {_s_atanh('sin(vf_lamd) / sqrt(1.0 + vf_t * vf_t)')} AS vf_eta
  FROM {prefix}f1
),
{prefix}fw AS (
  SELECT {key_cols},
    {sql_rn(f"{fe} + {ka} * {fwd_eta}", E_DECIMALS)} AS easting,
    {sql_rn(f"{fn} + {ka} * {fwd_xi} - {k0m0}", E_DECIMALS)} AS northing
  FROM {prefix}f2
)"""
    inv = sql_tm_inverse_ctes(prefix, f"{prefix}fw", "easting", "northing",
                              epsg, f"{key_cols}, easting, northing")
    return fwd + "," + inv


def sql_utm_roundtrip_ctes(prefix: str, src: str, lon: str, lat: str,
                           zone: int, key_cols: str) -> str:
    """CTE chain mirroring ``utm_forward`` then ``utm_inverse``: emits
    ``{prefix}utm(key_cols, easting, northing, rlon, rlat)`` — the
    projected coordinates and the recovered geographic ones, both
    quantized exactly as the numpy kernels. All intermediates are
    vp_-prefixed to avoid caller column collisions."""
    lam0 = repr(zone_central_meridian(zone) * (np.pi / 180.0))
    d2r = "(pi() / 180.0)"
    r2d = "(180.0 / pi())"
    e_ = repr(float(E_))
    ka = repr(float(K0 * A_BAR))
    fe = repr(FALSE_EASTING)

    fwd_xi = "vp_xi"
    fwd_eta = "vp_eta"
    for j, a_j in enumerate(ALPHA, start=1):
        fwd_xi = (f"({fwd_xi} + {repr(float(a_j))} * sin({2.0 * j} * vp_xi)"
                  f" * {_s_cosh(f'{2.0 * j} * vp_eta')})")
        fwd_eta = (f"({fwd_eta} + {repr(float(a_j))} * cos({2.0 * j} * vp_xi)"
                   f" * {_s_sinh(f'{2.0 * j} * vp_eta')})")
    inv_xi = "vp_ixi"
    inv_eta = "vp_ieta"
    for j, b_j in enumerate(BETA, start=1):
        inv_xi = (f"({inv_xi} - {repr(float(b_j))} * sin({2.0 * j} * vp_ixi)"
                  f" * {_s_cosh(f'{2.0 * j} * vp_ieta')})")
        inv_eta = (f"({inv_eta} - {repr(float(b_j))} * cos({2.0 * j} * vp_ixi)"
                   f" * {_s_sinh(f'{2.0 * j} * vp_ieta')})")
    phi = "vp_chi"
    for j, d_j in enumerate(DELTA, start=1):
        phi = f"({phi} + {repr(float(d_j))} * sin({2.0 * j} * vp_chi))"

    return f"""
{prefix}p0 AS (
  SELECT {key_cols}, ({lat}) * {d2r} AS vp_phi, ({lon}) * {d2r} - {lam0} AS vp_lamd
  FROM {src}
),
{prefix}p1 AS (
  SELECT *, {_s_sinh(f"{_s_atanh('sin(vp_phi)')} - {e_} * {_s_atanh(f'{e_} * sin(vp_phi)')}")} AS vp_t
  FROM {prefix}p0
),
{prefix}p2 AS (
  SELECT *, atan2(vp_t, cos(vp_lamd)) AS vp_xi,
    {_s_atanh('sin(vp_lamd) / sqrt(1.0 + vp_t * vp_t)')} AS vp_eta
  FROM {prefix}p1
),
{prefix}p3 AS (
  SELECT *, {sql_rn(f"{fe} + {ka} * {fwd_eta}", E_DECIMALS)} AS easting,
            {sql_rn(f"{ka} * {fwd_xi}", E_DECIMALS)} AS northing
  FROM {prefix}p2
),
{prefix}p4 AS (
  SELECT *, northing / {ka} AS vp_ixi, (easting - {fe}) / {ka} AS vp_ieta
  FROM {prefix}p3
),
{prefix}p5 AS (
  SELECT *, {inv_xi} AS vp_xip, {inv_eta} AS vp_etap FROM {prefix}p4
),
{prefix}p6 AS (
  SELECT *, atan2(sin(vp_xip) / {_s_cosh('vp_etap')},
                  sqrt(1.0 - (sin(vp_xip) / {_s_cosh('vp_etap')})
                             * (sin(vp_xip) / {_s_cosh('vp_etap')}))) AS vp_chi
  FROM {prefix}p5
),
{prefix}utm AS (
  SELECT {key_cols}, easting, northing,
    {sql_rn(f"({lam0} + atan2({_s_sinh('vp_etap')}, cos(vp_xip))) * {r2d}", LL_DECIMALS)} AS rlon,
    {sql_rn(f"({phi}) * {r2d}", LL_DECIMALS)} AS rlat
  FROM {prefix}p6
)"""
