"""Property tier for the geo primitives: geohash prefix-locality,
haversine metric axioms, and grid-blocked radius-join completeness,
against pure-python references."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.functions.geo import (
    geohash,
    haversine_km,
    radius_join_blocked,
)

SETTINGS = settings(max_examples=5, deadline=None)

lat_st = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat, lon, precision=8):
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even, ch = 0, [], True, 0
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            ch, rng[0] = ch * 2 + 1, mid
        else:
            ch, rng[1] = ch * 2, mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _off_cell_boundary(lat, lon, nbits=20, eps=1e-6):
    # One-shot quantization and infinite-precision bisection can only
    # disagree within ~1 ULP of a cell edge (sub-micrometer on Earth);
    # exclude those degenerate points — engine-vs-engine parity is
    # unaffected because both evaluate the identical expression.
    for frac in ((lon + 180.0) / 360.0, (lat + 90.0) / 180.0):
        scaled = frac * (1 << nbits)
        if abs(scaled - round(scaled)) < eps:
            return False
    return True


@SETTINGS
@given(st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=8))
def test_geohash_matches_bisection_reference(spark, pts):
    from hypothesis import assume

    # Hypothesis favors integer-valued floats, which sit EXACTLY on
    # cell boundaries (e.g. lat=0 → 0.5 * 2^20) — nudge every point off
    # the lattice instead of assume()-filtering most examples away.
    pts = [
        (min(la + 1.234e-4, 89.95), min(lo + 1.234e-4, 179.95))
        for la, lo in pts
    ]
    assume(all(_off_cell_boundary(la, lo) for la, lo in pts))
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [
        r.gh
        for r in df.select(
            geohash(F.col("lat"), F.col("lon"), 8).alias("gh")
        ).collect()
    ]
    want = [_ref_geohash(la, lo) for la, lo in pts]
    assert sorted(got) == sorted(want)


@SETTINGS
@given(lat_st, lon_st, lat_st, lon_st)
def test_haversine_metric_axioms(spark, la1, lo1, la2, lo2):
    row = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(la1), F.lit(lo1), F.lit(la2), F.lit(lo2)
            ).alias("ab"),
            haversine_km(
                F.lit(la2), F.lit(lo2), F.lit(la1), F.lit(lo1)
            ).alias("ba"),
            haversine_km(
                F.lit(la1), F.lit(lo1), F.lit(la1), F.lit(lo1)
            ).alias("aa"),
        )
        .collect()[0]
    )
    assert abs(row.ab - row.ba) < 1e-9  # symmetry
    assert row.aa < 1e-6  # identity
    assert 0 <= row.ab <= 20037.6  # bounded by half circumference


# ---------------------------------------------------------------------------
# radius_join_blocked completeness vs python brute force (ADVICE r6: the
# old fixed ±1-cell probe missed high-latitude and antimeridian pairs,
# and the oracle's identical blocking made the differential check
# vacuous — these references share NO blocking logic with the operator).
# ---------------------------------------------------------------------------


def _py_haversine(la1, lo1, la2, lo2):
    rad = 0.017453292519943295
    a = (
        math.sin((la2 - la1) * rad / 2) ** 2
        + math.cos(la1 * rad)
        * math.cos(la2 * rad)
        * math.sin((lo2 - lo1) * rad / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def _brute_pairs(pts, radius):
    out = set()
    for i, (ia, la1, lo1) in enumerate(pts):
        for ib, la2, lo2 in pts[i + 1:]:
            if _py_haversine(la1, lo1, la2, lo2) <= radius:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def _blocked_pairs(spark, pts, radius):
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    return {
        (r.id_a, r.id_b)
        for r in radius_join_blocked(df, radius).collect()
    }


def test_radius_join_finds_high_latitude_pairs(spark):
    # At lat 85 a longitude degree is ~9.7 km: these pairs sit 4-7 grid
    # cells apart yet well inside 75 km — the exact class the old
    # ±1-cell probe silently dropped.
    pts = [
        (1, 85.0, 0.3),
        (2, 85.0, 5.1),  # ~46 km from id 1, 5 cells away
        (3, 84.6, 3.2),
        (4, -85.2, -170.4),
        (5, -85.3, -163.9),  # ~54 km from id 4 (southern hemisphere)
        (6, 20.0, 50.0),  # far away control
    ]
    got = _blocked_pairs(spark, pts, 75.0)
    want = _brute_pairs(pts, 75.0)
    assert got == want
    assert (1, 2) in got and (4, 5) in got  # the multi-cell pairs


def test_radius_join_wraps_antimeridian(spark):
    pts = [
        (1, 0.0, 179.9),
        (2, 0.0, -179.9),  # ~22 km from id 1, across ±180
        (3, 62.5, 179.4),
        (4, 62.6, -179.6),  # high-lat AND wrapped
        (5, 0.0, 0.0),  # control
    ]
    got = _blocked_pairs(spark, pts, 75.0)
    want = _brute_pairs(pts, 75.0)
    assert got == want
    assert (1, 2) in got and (3, 4) in got


def test_radius_join_covers_over_the_pole_pairs(spark):
    # Two points on opposite meridians near the pole: lon cells are 180
    # apart but the points are ~67 km apart over the pole; the
    # full-circle probe span (cos φmax < sin(d/2R)) must find them.
    pts = [(1, 89.7, 10.0), (2, 89.7, -170.0), (3, 88.0, 10.0)]
    got = _blocked_pairs(spark, pts, 75.0)
    want = _brute_pairs(pts, 75.0)
    assert got == want
    assert (1, 2) in got


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
            st.floats(min_value=-180.0, max_value=179.999, allow_nan=False),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_radius_join_matches_brute_force(spark, coords):
    # Bias toward the hard region: odd ids are pushed poleward so most
    # random draws exercise the latitude-aware span, not just w=1.
    pts = [
        (i, max(min(la + (55.0 if i % 2 and la >= 0 else 0.0), 89.9), -89.9), lo)
        for i, (la, lo) in enumerate(coords)
    ]
    # Exclude pairs within 1 m of the exact 75.0 km boundary: python and
    # JVM libm may round the last ULP differently there. Completeness of
    # the CANDIDATE set (the thing blocking can break) is unaffected.
    brute = _brute_pairs(pts, 74.999)
    loose = _brute_pairs(pts, 75.001)
    got = _blocked_pairs(spark, pts, 75.0)
    assert brute <= got <= loose


def test_radius_join_generalizes_beyond_one_lat_cell(spark):
    """radius 200 km spans ~1.8 degrees of latitude (wy=2) and wide
    longitude spans at altitude — exercises the generalized half-widths
    rather than the 75 km defaults."""
    pts = [
        (1, 70.0, 10.0),
        (2, 71.5, 10.4),  # ~167 km away: 2 lat cells apart
        (3, 70.0, 14.8),  # ~183 km east: ~5 lon cells at lat 70
        (4, 0.0, 0.0),
        (5, 1.6, 0.9),  # ~205 km: just outside
        (6, -30.0, 120.0),  # far control
    ]
    got = _blocked_pairs(spark, pts, 200.0)
    want = _brute_pairs(pts, 200.0)
    assert got == want
    assert (1, 2) in got and (1, 3) in got
    assert (4, 5) not in got
