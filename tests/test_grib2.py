"""GRIB2 codec + GFS/HRRR source tests.

Round-trips every supported data-representation template through the
pure-Python encoder/decoder, checks the Lambert inverse projection
against HRRR's published grid navigation, and runs the Spark
task-per-file scan + the reference-mirroring GFS/HRRR validation
(reference ``domains/da/sources/gfs.py:83-288``, ``hrrr.py:85-290``).
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pytest

from physicsnemo_curator_spark.sources.grib2 import (
    gfs_path,
    grid_coordinates,
    hrrr_path,
    lambert_forward,
    lambert_inverse,
    read_gfs,
    read_grib2,
    read_grib2_messages,
    read_hrrr,
    variable_key,
    write_grib2,
)

NI, NJ = 24, 13
LATLON = dict(
    type="latlon",
    ni=NI,
    nj=NJ,
    lat1=90.0,
    lon1=0.0,
    lat2=-90.0,
    lon2=345.0,
    di=360.0 / NI,
    dj=180.0 / (NJ - 1),
    scan=0,
)
HRRR_GRID = dict(
    type="lambert",
    nx=18,
    ny=11,
    lat1=21.138123,
    lon1=237.280472,
    lad=38.5,
    lov=262.5,
    dx=3000.0,
    dy=3000.0,
    scan=0x40,
    latin1=38.5,
    latin2=38.5,
)


def _field(seed: int, shape=(NJ, NI)) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.round(rng.normal(280.0, 15.0, shape), 2)


@pytest.mark.parametrize(
    ("packing", "order"),
    [("simple", 0), ("complex", 0), ("complex_diff", 1), ("complex_diff", 2)],
)
def test_packing_round_trip_exact(tmp_path, packing, order):
    vals = _field(7)
    path = str(tmp_path / "m.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 1, 2, 12),
                discipline=0,
                category=0,
                number=0,
                level_type=103,
                level=2,
                grid=LATLON,
                values=vals,
                decimals=2,
                packing=packing,
                order=order,
                nbits=20,
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    # decimals=2 and nbits wide enough -> exact at 2 decimal places
    np.testing.assert_allclose(
        msg["values"].reshape(NJ, NI), vals, rtol=0, atol=1e-9
    )
    assert msg["time"] == datetime(2024, 1, 2, 12)
    assert (msg["level_type"], msg["level"]) == (103, 2)


def test_bitmap_missing_values(tmp_path):
    vals = _field(9)
    vals[0, 0] = np.nan
    vals[5, 17] = np.nan
    path = str(tmp_path / "m.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 6, 1, 0),
                discipline=0,
                category=1,
                number=0,
                level_type=1,
                level=0,
                grid=LATLON,
                values=vals,
                packing="complex_diff",
                order=2,
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    got = msg["values"].reshape(NJ, NI)
    assert np.isnan(got[0, 0]) and np.isnan(got[5, 17])
    finite = np.isfinite(vals)
    np.testing.assert_allclose(got[finite], vals[finite], atol=1e-9)


def test_multi_message_file_and_latlon_coords(tmp_path):
    path = str(tmp_path / "multi.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 1, 1, 6),
                discipline=0,
                category=c,
                number=n,
                level_type=103,
                level=lv,
                grid=LATLON,
                values=_field(c * 10 + n),
            )
            for c, n, lv in [(0, 0, 2), (2, 2, 10), (2, 3, 10)]
        ],
    )
    with open(path, "rb") as fh:
        msgs = read_grib2_messages(fh.read())
    assert [(m["category"], m["number"]) for m in msgs] == [
        (0, 0),
        (2, 2),
        (2, 3),
    ]
    lat, lon = grid_coordinates(msgs[0]["grid"])
    assert lat.shape == (NI * NJ,)
    assert lat[0] == pytest.approx(90.0)  # scan=0: north to south
    assert lat[-1] == pytest.approx(-90.0)
    assert lon[1] == pytest.approx(15.0)


def test_lambert_inverse_matches_hrrr_navigation():
    """Forward∘inverse is identity, and the far-corner latitude of the
    published HRRR CONUS grid (1799x1059, 3 km) is reproduced."""
    kw = dict(latin1=38.5, latin2=38.5, lov=262.5)
    lat = np.array([25.0, 38.5, 47.0])
    lon = np.array([250.0, 262.5, 280.0])
    x, y = lambert_forward(lat, lon, **kw)
    lat2, lon2 = lambert_inverse(x, y, **kw)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)

    x1, y1 = lambert_forward(
        np.array([21.138123]), np.array([237.280472]), **kw
    )
    fx = x1[0] + 3000.0 * (1799 - 1)
    fy = y1[0] + 3000.0 * (1059 - 1)
    flat, flon = lambert_inverse(np.array([fx]), np.array([fy]), **kw)
    assert flat[0] == pytest.approx(47.8424, abs=2e-3)
    assert 295.0 < flon[0] < 300.0  # north-east CONUS corner


def test_lambert_grid_coordinates_round_trip(tmp_path):
    vals = _field(3, (HRRR_GRID["ny"], HRRR_GRID["nx"]))
    path = str(tmp_path / "h.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 3, 3, 15),
                discipline=0,
                category=16,
                number=196,
                level_type=200,
                level=0,
                grid=HRRR_GRID,
                values=vals,
                packing="complex_diff",
                order=2,
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    g = msg["grid"]
    assert g["type"] == "lambert"
    assert (g["nx"], g["ny"]) == (HRRR_GRID["nx"], HRRR_GRID["ny"])
    lat, lon = grid_coordinates(g)
    # first stored point is the grid anchor
    assert lat[0] == pytest.approx(21.138123, abs=1e-4)
    assert lon[0] == pytest.approx(237.280472, abs=1e-4)
    # +j scan: latitudes increase row over row at the anchor column
    assert lat[HRRR_GRID["nx"]] > lat[0]


def test_variable_key_lexicon():
    assert variable_key("t2m") == (0, 0, 0, 103, 2)
    assert variable_key("u10m") == (0, 2, 2, 103, 10)
    assert variable_key("z500") == (0, 3, 5, 100, 50000)
    assert variable_key("t850") == (0, 0, 0, 100, 85000)
    assert variable_key("refc") == (0, 16, 196, 200, 0)
    with pytest.raises(ValueError, match="lexicon"):
        variable_key("banana")


def _write_gfs_mirror(root: str, times, fields) -> None:
    for t in times:
        p = gfs_path(root, t)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        write_grib2(
            p,
            [
                dict(
                    time=t,
                    discipline=d,
                    category=c,
                    number=n,
                    level_type=lt,
                    level=lv,
                    grid=LATLON,
                    values=vals,
                    packing="complex_diff",
                    order=2,
                )
                for (d, c, n, lt, lv), vals in fields.items()
            ],
        )


def test_read_gfs_spark_scan(spark, tmp_path):
    times = [datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 6)]
    t2m, u10m = _field(1), _field(2)
    extra = _field(3)  # a non-requested parameter in the same file
    fields = {
        (0, 0, 0, 103, 2): t2m,
        (0, 2, 2, 103, 10): u10m,
        (0, 16, 224, 1, 0): extra,
    }
    root = str(tmp_path / "mirror")
    _write_gfs_mirror(root, times, fields)

    df = read_gfs(spark, root, times, ["t2m", "u10m"])
    rows = df.groupBy("variable").count().collect()
    counts = {r["variable"]: r["count"] for r in rows}
    # 2 timestamps x full grid, the unrequested parameter filtered out
    assert counts == {"t2m": 2 * NI * NJ, "u10m": 2 * NI * NJ}

    from datetime import timezone

    epoch0 = times[0].replace(tzinfo=timezone.utc).timestamp()
    got = (
        df.filter((df.variable == "t2m") & (df.time == epoch0))
        .orderBy("lat", "lon")
        .toPandas()
    )
    lat, lon = grid_coordinates(
        {**LATLON, "ndata": NI * NJ, "di": LATLON["di"], "dj": LATLON["dj"]}
    )
    import pandas as pd

    want = (
        pd.DataFrame({"lat": lat, "lon": lon, "value": t2m.ravel()})
        .sort_values(["lat", "lon"])
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got["value"].to_numpy(), want["value"], atol=1e-9)


def test_read_gfs_validation(spark, tmp_path):
    root = str(tmp_path / "m")
    with pytest.raises(ValueError, match="6h"):
        read_gfs(spark, root, [datetime(2024, 1, 1, 3)], ["t2m"])
    with pytest.raises(ValueError, match="lexicon"):
        read_gfs(spark, root, [datetime(2024, 1, 1, 6)], ["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        read_gfs(spark, root, [], ["t2m"])
    with pytest.raises(RuntimeError, match="network"):
        read_gfs(
            spark, root, [datetime(2024, 1, 1, 6)], ["t2m"], source="aws"
        )
    with pytest.raises(FileNotFoundError):
        read_gfs(spark, root, [datetime(2024, 1, 1, 6)], ["t2m"])


def test_read_hrrr_spark_scan(spark, tmp_path):
    t = datetime(2024, 5, 5, 14)
    refc = _field(4, (HRRR_GRID["ny"], HRRR_GRID["nx"]))
    p = hrrr_path(str(tmp_path), t)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    write_grib2(
        p,
        [
            dict(
                time=t,
                discipline=0,
                category=16,
                number=196,
                level_type=200,
                level=0,
                grid=HRRR_GRID,
                values=refc,
                packing="complex_diff",
                order=2,
            )
        ],
    )
    df = read_hrrr(spark, str(tmp_path), [t], ["refc"])
    pdf = df.toPandas()
    assert len(pdf) == HRRR_GRID["nx"] * HRRR_GRID["ny"]
    assert set(pdf["variable"]) == {"refc"}
    assert pdf["lat"].between(21.0, 23.0).any()
    with pytest.raises(ValueError, match="1h"):
        read_hrrr(
            spark, str(tmp_path), [datetime(2024, 5, 5, 14, 30)], ["refc"]
        )


def test_unknown_messages_get_synthetic_names(spark, tmp_path):
    """Without a variables filter, non-lexicon params surface rather
    than being silently dropped."""
    t = datetime(2024, 1, 1, 0)
    path = str(tmp_path / "x.grib2")
    write_grib2(
        path,
        [
            dict(
                time=t,
                discipline=2,
                category=0,
                number=192,
                level_type=106,
                level=10,
                grid=LATLON,
                values=_field(5),
            )
        ],
    )
    df = read_grib2(spark, [path])
    names = [r["variable"] for r in df.select("variable").distinct().collect()]
    assert names == ["d2_c0_n192_lt106_10"]


def test_one_message_repeated_groups_and_bitmap_reuse(tmp_path):
    """Real archives pack many fields as repeated section groups inside
    one GRIB envelope; a repeated missing-value mask is emitted as
    bitmap indicator 254 and must resolve to the previous bitmap."""
    v1, v2, v3 = _field(21), _field(22), _field(23)
    v1[2, 3] = np.nan
    v2[2, 3] = np.nan  # same mask as v1 -> encoder emits 254
    path = str(tmp_path / "one.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 2, 2, 6),
                discipline=0,
                category=0,
                number=i,
                level_type=103,
                level=2,
                grid=LATLON,
                values=v,
                packing="complex_diff",
                order=2,
            )
            for i, v in enumerate([v1, v2, v3])
        ],
        one_message=True,
    )
    raw = open(path, "rb").read()
    assert raw.count(b"GRIB") == 1  # single envelope
    msgs = read_grib2_messages(raw)
    assert [m["number"] for m in msgs] == [0, 1, 2]
    for m, v in zip(msgs, [v1, v2, v3]):
        got = m["values"].reshape(NJ, NI)
        finite = np.isfinite(v)
        np.testing.assert_allclose(got[finite], v[finite], atol=1e-9)
        assert np.isnan(got).sum() == np.isnan(v).sum()
    # indicator 254 really present (one full bitmap + one reuse)
    assert raw.count(b"\x00\x00\x00\x06\x06\xfe") == 1


def test_all_nan_field_round_trip(tmp_path):
    """A fully-masked field (legal in GRIB2) encodes as an all-zero
    bitmap + empty data section instead of crashing."""
    vals = np.full((NJ, NI), np.nan)
    path = str(tmp_path / "nan.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 1, 1, 0),
                discipline=0,
                category=0,
                number=0,
                level_type=1,
                level=0,
                grid=LATLON,
                values=vals,
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    assert np.isnan(msg["values"]).all()
    assert msg["values"].shape == (NI * NJ,)


@pytest.mark.parametrize("packing", ["complex", "complex_diff"])
def test_all_nan_field_complex_packing_round_trip(tmp_path, packing):
    """A fully-masked field with complex packing requested must fall
    back to simple packing (the complex packers reduce over the data
    array, which is zero-size here) — regression: the fallback was
    dead code, overwritten by a later read of m['packing']."""
    vals = np.full((NJ, NI), np.nan)
    path = str(tmp_path / f"nan_{packing}.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 1, 1, 0),
                discipline=0,
                category=0,
                number=0,
                level_type=1,
                level=0,
                grid=LATLON,
                values=vals,
                packing=packing,
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    assert np.isnan(msg["values"]).all()
    assert msg["values"].shape == (NI * NJ,)


def test_tiny_field_order_clamped(tmp_path):
    """complex_diff on a field smaller than order+1 points clamps the
    differencing order instead of writing a corrupt header."""
    grid = dict(
        type="latlon", ni=1, nj=1, lat1=0.0, lon1=0.0, lat2=0.0,
        lon2=0.0, di=1.0, dj=1.0, scan=0,
    )
    path = str(tmp_path / "tiny.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 1, 1, 0), discipline=0, category=0,
                number=0, level_type=1, level=0, grid=grid,
                values=np.array([[42.25]]), packing="complex_diff",
                order=2,
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    assert msg["values"][0] == pytest.approx(42.25)


def test_corrupt_length_raises_not_hangs():
    import struct as _s

    bad = b"GRIB" + b"\x00\x00\x00\x02" + _s.pack(">Q", 0) + b"junk"
    with pytest.raises(ValueError, match="corrupt"):
        read_grib2_messages(bad)


def test_one_message_rejects_mixed_times(tmp_path):
    msgs = [
        dict(
            time=datetime(2024, 1, 1, h), discipline=0, category=0,
            number=0, level_type=1, level=0, grid=LATLON,
            values=_field(h),
        )
        for h in (0, 6)
    ]
    with pytest.raises(ValueError, match="identical time"):
        write_grib2(str(tmp_path / "x.grib2"), msgs, one_message=True)


def test_latlon_negative_i_scan(tmp_path):
    """Scanning mode 0x80: i runs east-to-west — longitudes must
    decrease from lon1."""
    grid = {**LATLON, "lon1": 345.0, "lon2": 0.0, "scan": 0x80}
    path = str(tmp_path / "neg.grib2")
    write_grib2(
        path,
        [
            dict(
                time=datetime(2024, 1, 1, 0), discipline=0, category=0,
                number=0, level_type=1, level=0, grid=grid,
                values=_field(31),
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    lat, lon = grid_coordinates(msg["grid"])
    assert lon[0] == pytest.approx(345.0)
    assert lon[1] == pytest.approx(330.0)
