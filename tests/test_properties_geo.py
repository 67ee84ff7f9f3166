"""Property tier for the geo primitives: geohash prefix-locality and
haversine metric axioms, against a pure-python bisection reference."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.functions.geo import (
    geohash,
    haversine_km,
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
