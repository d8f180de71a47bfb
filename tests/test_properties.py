"""Property-based invariants (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has no property testing).

Invariants pinned:
- moment stats agree with numpy on arbitrary data (population semantics);
- Welford power-sum state merge is associative/order-insensitive:
  merge(A, B) finalizes identically to aggregating A∪B directly;
- seeded permutation is a bijection for any mesh size.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings

# every test here is a multi-minute soak (subprocess example runs /
# hypothesis property sweeps) — opt-in, see conftest
pytestmark = pytest.mark.soak
from hypothesis import strategies as st

from physicsnemo_curator_spark.operators import mesh, stats
from physicsnemo_curator_spark.sources.synthetic import random_mesh

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=2,
    max_size=40,
)


@given(xs=values)
@_settings
def test_moment_stats_matches_numpy(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], ["v"])
    row = stats.moment_stats(df, [], "v").collect()[0]
    arr = np.asarray(xs, dtype=np.float64)
    assert row["n"] == len(xs)
    assert math.isclose(row["mean"], arr.mean(), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row["min_v"], arr.min()) and math.isclose(row["max_v"], arr.max())
    assert math.isclose(
        row["var_pop_v"], arr.var(), rel_tol=1e-7, abs_tol=1e-7
    )  # population variance, reference semantics


@given(xs=values, ys=values)
@_settings
def test_welford_state_merge_associative(spark, xs, ys):
    mk = lambda vals: spark.createDataFrame(
        [("g", float(v)) for v in vals], ["k", "v"]
    )
    a = stats.welford_state(mk(xs), ["k"], "v")
    b = stats.welford_state(mk(ys), ["k"], "v")
    merged = stats.finalize_welford_state(
        stats.merge_welford_state(a, b, ["k"]), ["k"]
    ).collect()[0]
    direct = stats.finalize_welford_state(
        stats.welford_state(mk(list(xs) + list(ys)), ["k"], "v"), ["k"]
    ).collect()[0]
    assert merged["n"] == direct["n"]
    assert math.isclose(merged["mean"], direct["mean"], rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(
        merged["var_pop_v"], direct["var_pop_v"], rel_tol=1e-6, abs_tol=1e-6
    )


@given(seed=st.integers(min_value=0, max_value=2**31 - 1), n=st.integers(5, 40))
@_settings
def test_permutation_is_bijection(spark, seed, n):
    points, cells, _ = random_mesh(spark, n_meshes=1, n_points=n, n_cells=n)
    new_points, _ = mesh.random_permutation(points, cells, seed=seed)
    ids = sorted(r["point_id"] for r in new_points.collect())
    assert ids == list(range(n))


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    packing=st.sampled_from(
        [("simple", 0), ("complex", 0), ("complex_diff", 1), ("complex_diff", 2)]
    ),
    decimals=st.integers(min_value=0, max_value=3),
)
def test_grib2_round_trip_property(tmp_path_factory, data, packing, decimals):
    """Any finite field on any small lat/lon lattice survives
    encode→decode exactly at the declared decimal scale, for every
    packing template, with NaN positions preserved via the bitmap."""
    import os
    from datetime import datetime as _dt

    from physicsnemo_curator_spark.sources.grib2 import (
        read_grib2_messages,
        write_grib2,
    )

    ni = data.draw(st.integers(min_value=2, max_value=12))
    nj = data.draw(st.integers(min_value=2, max_value=9))
    vals = np.array(
        data.draw(
            st.lists(
                st.floats(
                    min_value=-5e4,
                    max_value=5e4,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                min_size=ni * nj,
                max_size=ni * nj,
            )
        )
    ).reshape(nj, ni)
    vals = np.round(vals, decimals)
    # sprinkle missing values (never all missing)
    n_nan = data.draw(st.integers(min_value=0, max_value=ni * nj - 1))
    flat = vals.ravel()
    flat[data.draw(st.permutations(list(range(ni * nj))))[:n_nan]] = np.nan
    vals = flat.reshape(nj, ni)

    pk, order = packing
    path = str(tmp_path_factory.mktemp("g2") / "p.grib2")
    write_grib2(
        path,
        [
            dict(
                time=_dt(2024, 3, 1, 12),
                discipline=0,
                category=0,
                number=0,
                level_type=103,
                level=2,
                grid=dict(
                    type="latlon",
                    ni=ni,
                    nj=nj,
                    lat1=90.0,
                    lon1=0.0,
                    lat2=-90.0,
                    lon2=360.0 - 360.0 / ni,
                    di=360.0 / ni,
                    dj=180.0 / max(nj - 1, 1),
                    scan=0,
                ),
                values=vals,
                decimals=decimals,
                packing=pk,
                order=order,
                nbits=24,
            )
        ],
    )
    with open(path, "rb") as fh:
        (msg,) = read_grib2_messages(fh.read())
    os.unlink(path)
    got = msg["values"].reshape(nj, ni)
    finite = np.isfinite(vals)
    assert (np.isfinite(got) == finite).all()
    if pk == "simple" and finite.any():
        # floor quantization: error < 2^E / 10^D with E chosen so the
        # scaled span fits in nbits=24
        span = np.nanmax(vals) - np.nanmin(vals)
        e = max(0, math.ceil(math.log2(max(span * 10**decimals, 1) / (2**24 - 1) + 1e-12)))
        atol = (2**e) / 10**decimals + 1e-9
    else:
        atol = 1e-9  # complex packing is exact at the decimal scale
    np.testing.assert_allclose(got[finite], vals[finite], rtol=0, atol=atol)


def test_moment_stats_degenerate_groups_no_ansi_crash(spark):
    """Constant and near-constant (underflow-variance) groups must not
    raise DIVIDE_BY_ZERO under ANSI mode; zero-variance skew/kurt pin
    to 0 per the reference's finalize semantics (the builtin
    skewness/kurtosis aggregates throw when their internal Σ(x-mean)²
    powers underflow to exactly 0 — hypothesis found this with a
    two-point group at ~1e-56)."""
    rows = [
        ("const", 5.0),
        ("const", 5.0),
        ("tiny", 0.0),
        ("tiny", 2.6025976313385818e-56),
        ("normal", 1.0),
        ("normal", 3.0),
        ("normal", 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in stats.moment_stats(df, ["g"], "v").collect()}
    assert out["const"]["skew_v"] == 0.0 and out["const"]["kurt_v"] == 0.0
    assert math.isfinite(out["tiny"]["skew_v"])
    assert math.isclose(out["normal"]["var_pop_v"], np.var([1.0, 3.0, 9.0]))
    assert out["normal"]["skew_v"] > 0  # right-skewed


_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
    min_size=1,
    max_size=24,
)


@given(docs=st.lists(_words, min_size=1, max_size=8), span=st.integers(1, 4))
@_settings
def test_remove_duplicate_spans_invariant(spark, docs, span):
    """Exactly the spans with df >= 2 disappear (from every doc); all
    other spans survive in document order."""
    from physicsnemo_curator_spark.operators import textops

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in textops.remove_duplicate_spans(
            df, span_words=span, min_df=2
        ).collect()
    }
    spans_by_doc = {
        i: [
            " ".join(ws[s : s + span])
            for s in range(0, len(ws), span)
        ]
        for i, ws in enumerate(docs)
    }
    df_count: dict[str, set] = {}
    for i, sp in spans_by_doc.items():
        for s in sp:
            df_count.setdefault(s, set()).add(i)
    boiler = {s for s, ids in df_count.items() if len(ids) >= 2}
    for i, sp in spans_by_doc.items():
        expect = [s for s in sp if s not in boiler]
        assert out[i]["text"] == " ".join(expect)
        assert out[i]["kept_spans"] == len(expect)
        assert out[i]["removed_spans"] == len(sp) - len(expect)


@given(
    masses=st.lists(st.integers(1, 10**6), min_size=2, max_size=6),
    shares=st.lists(st.integers(1, 9), min_size=2, max_size=6),
)
@_settings
def test_mixing_weights_invariants(spark, masses, shares):
    """Rates stay in [0, 1]; the scarcest targeted domain is taken in
    full under the default budget; expected masses realize the target
    ratios up to rate-1 capping."""
    from physicsnemo_curator_spark.operators import sampling

    k = min(len(masses), len(shares))
    masses, shares = masses[:k], shares[:k]
    rows = [(f"d{i}", float(m)) for i, m in enumerate(masses)]
    df = spark.createDataFrame(rows, "domain string, w double")
    targets = {f"d{i}": float(s) for i, s in enumerate(shares)}
    out = {
        r["domain"]: r
        for r in sampling.mixing_weights(
            df, domain_col="domain", weight_col="w", targets=targets
        ).collect()
    }
    assert all(0.0 <= r["sample_rate"] <= 1.0 for r in out.values())
    scarcest = min(range(k), key=lambda i: masses[i] / shares[i])
    # share * (mass/share) / mass can land one ulp under 1.0
    assert math.isclose(
        out[f"d{scarcest}"]["sample_rate"], 1.0, rel_tol=1e-12
    )
    for i in range(k):
        assert math.isclose(
            out[f"d{i}"]["expected_mass"],
            min(
                masses[i],
                shares[i] * (masses[scarcest] / shares[scarcest]),
            ),
            rel_tol=1e-9,
        )


@given(
    latin1=st.floats(5.0, 70.0),
    latin2=st.floats(5.0, 70.0),
    lov=st.floats(0.0, 359.0),
    lat=st.lists(st.floats(1.0, 80.0), min_size=1, max_size=8),
)
@_settings
def test_lambert_projection_inverse_property(latin1, latin2, lov, lat):
    """forward∘inverse is the identity for any northern-hemisphere
    Lambert conformal parameterization."""
    from physicsnemo_curator_spark.sources.grib2 import (
        lambert_forward,
        lambert_inverse,
    )

    la = np.asarray(lat)
    lo = (np.asarray(lat) * 4.1 + lov) % 360.0  # arbitrary lons
    kw = dict(latin1=latin1, latin2=latin2, lov=lov)
    x, y = lambert_forward(la, lo, **kw)
    la2, lo2 = lambert_inverse(x, y, **kw)
    np.testing.assert_allclose(la2, la, atol=1e-8)
    dlon = (lo2 - lo + 180.0) % 360.0 - 180.0
    np.testing.assert_allclose(dlon, 0.0, atol=1e-8)


keys = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=60,
)


@given(ks=keys, probe=keys)
@_settings
def test_bloom_no_false_negatives_property(spark, ks, probe):
    """For ANY key multiset and probe set: every built key probes true
    (the Bloom contract has no data-dependent exceptions), and both
    hash twins honor it."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches

    build = spark.createDataFrame([("g", k) for k in ks], "g string, k string")
    probes = spark.createDataFrame(
        [("g", k) for k in set(ks) | set(probe)], "g string, k string"
    )
    for hash_fn in ("md5", "xxhash64"):
        bf = sketches.bloom_filters(
            build, ["g"], "k", n_bits=512, k=3, hash_fn=hash_fn
        )
        out = sketches.bloom_might_contain(
            bf, probes, ["g"], "k", n_bits=512, k=3, hash_fn=hash_fn
        )
        missed = (
            out.join(build.select("k").distinct(), "k")
            .filter(~F.col("might_contain"))
            .count()
        )
        assert missed == 0


@given(ks=keys)
@_settings
def test_cms_never_undercounts_property(spark, ks):
    """For ANY key multiset: every estimate >= the true count, and
    splitting the input into two batches and merging the sketches
    yields the identical sketch as building over the union."""
    from collections import Counter

    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import sketches

    truth = Counter(ks)
    df = spark.createDataFrame([("g", k) for k in ks], "g string, k string")
    cms = sketches.cms_sketches(df, ["g"], "k", depth=3, width=64)
    est = sketches.cms_estimate(
        cms, df.select("g", "k").distinct(), ["g"], "k", depth=3, width=64
    )
    for r in est.collect():
        assert r.est_count >= truth[r.k], (r.k, r.est_count, truth[r.k])

    halves = [df.filter(F.pmod(F.xxhash64("k"), F.lit(2)) == i) for i in range(2)]
    mk = lambda b: sketches.cms_sketches(b, ["g"], "k", depth=3, width=64)
    parts = [mk(h) for h in halves if h.count() > 0]
    if len(parts) == 2:
        merged = sketches.merge_cms_tables(
            parts[0].unionByName(parts[1]), ["g"]
        )
        assert merged.collect()[0].cms == cms.collect()[0].cms


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([1, 2, 3, 4]),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(seed, h, w, channels):
    """For ANY uint8 image of any supported channel count and shape
    (including 1-pixel rows/columns), encode→decode is the identity."""
    import numpy as np

    from physicsnemo_curator_spark.sources import png

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    if channels == 1:
        arr = arr[:, :, 0]
    out, meta = png.decode_png(png.encode_png(arr))
    assert (meta["height"], meta["width"]) == (h, w)
    np.testing.assert_array_equal(out.reshape(arr.shape), arr)


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    rgb=st.booleans(),
    quality=st.integers(30, 95),
    sub=st.sampled_from(["444", "420"]),
    rst=st.sampled_from([0, 3]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_decode_total_property(seed, h, w, rgb, quality, sub, rst):
    """For ANY image/config the encoder emits, the decoder must return
    the right shape with bounded error — never crash, never produce
    wrong dimensions (MCU padding must always crop back)."""
    import numpy as np

    from physicsnemo_curator_spark.sources import jpeg

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    # smooth-ish content so the error bound is meaningful at q30
    base = rng.integers(0, 256)
    arr = np.clip(
        base + rng.integers(-20, 21, size=shape), 0, 255
    ).astype(np.uint8)
    data = jpeg.encode_jpeg(
        arr, quality=quality, subsampling=sub if rgb else "444",
        restart_interval=rst,
    )
    out, meta = jpeg.decode_jpeg(data)
    assert out.shape == arr.shape
    assert (meta["height"], meta["width"]) == (h, w)
    err = np.abs(out.astype(int) - arr.astype(int)).mean()
    assert err < 40  # ±20 noise under heavy quantization stays bounded


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 400),
    channels=st.integers(1, 2),
    bits=st.sampled_from([8, 16]),
    rate=st.sampled_from([8000, 22050, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(seed, n, channels, bits, rate):
    """For ANY float signal / channel count / PCM depth the encoder
    supports, encode→decode preserves shape + metadata and stays within
    one quantization step per sample (incl. odd-length 8-bit payloads,
    whose RIFF pad byte must not leak into the frames)."""
    import numpy as np

    from physicsnemo_curator_spark.sources import wav

    rng = np.random.default_rng(seed)
    sig = rng.uniform(-1.0, 1.0, size=(n, channels))
    out, meta = wav.decode_wav(wav.encode_wav(sig, rate, bits=bits))
    assert (meta["sample_rate"], meta["channels"], meta["bits"]) == (
        rate,
        channels,
        bits,
    )
    assert meta["n_frames"] == n
    out = out.reshape(n, channels)  # mono decodes squeezed to (n,)
    # encode quantizes at 1/(2^(b-1)-1), decode normalizes by 2^(b-1)
    # (the offset-binary / i2 conventions) — error ≤ |f|·(scale gap) +
    # half a step of the decode normalization
    step = (1 / 128 + 1 / 256) if bits == 8 else (1 / 32768 + 1 / 65536)
    assert np.abs(out - sig).max() <= step + 1e-12


@given(
    seed=st.integers(0, 2**31 - 1),
    shape=st.sampled_from([(7,), (5, 3), (4, 3, 2), (1, 1), (13, 2)]),
    dtype=st.sampled_from(["<i4", "<i8", "<f4", "<f8"]),
    chunked=st.booleans(),
    deflate=st.sampled_from([None, 1, 6]),
)
@settings(max_examples=40, deadline=None)
def test_hdf5_roundtrip_property(tmp_path_factory, seed, shape, dtype, chunked, deflate):
    """For ANY supported dtype / rank / layout combination, the HDF5
    writer's bytes decode back to the identical array through the
    subset reader — contiguous and chunked (edge chunks included),
    deflate on or off."""
    import numpy as np

    from physicsnemo_curator_spark.sinks import hdf5

    rng = np.random.default_rng(seed)
    if dtype.startswith("<i"):
        arr = rng.integers(-1000, 1000, size=shape).astype(dtype)
    else:
        arr = rng.normal(size=shape).astype(dtype)
    chunks = None
    if chunked:
        # deliberately non-divisor chunk shapes to force edge chunks
        chunks = {"g/v": tuple(max(1, s - 1) for s in shape)}
    p = tmp_path_factory.mktemp("h5prop") / "p.h5"
    hdf5.write_hdf5(
        str(p),
        {"g/v": arr},
        chunks=chunks,
        deflate=deflate if chunked else None,
        attrs={"g/v": {"seed": int(seed)}},
    )
    ds, at = hdf5.read_hdf5(str(p))
    np.testing.assert_array_equal(ds["g/v"], arr)
    assert ds["g/v"].dtype == np.dtype(dtype)
    assert at["g/v"]["seed"] == seed


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    channels=st.sampled_from([1, 3, 4]),
    depth16=st.booleans(),
    interlace=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_png_adam7_and_16bit_roundtrip_property(
    seed, h, w, channels, depth16, interlace
):
    """For ANY shape / channel count / depth / interlace combination
    the encoder supports, encode→decode is the identity — including
    Adam7 pass geometry on images small enough that several passes are
    empty."""
    import numpy as np

    from physicsnemo_curator_spark.sources import png

    rng = np.random.default_rng(seed)
    if depth16:
        arr = rng.integers(0, 65536, size=(h, w, channels), dtype=np.uint16)
    else:
        arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    if channels == 1:
        arr = arr[:, :, 0]
    out, meta = png.decode_png(png.encode_png(arr, interlace=interlace))
    assert meta["bit_depth"] == (16 if depth16 else 8)
    np.testing.assert_array_equal(out.reshape(arr.shape), arr)


@given(
    data=st.data(),
    dtype=st.sampled_from(["<f8", "<f4", "<i8", "<i4"]),
    compress=st.booleans(),
    nan_fill=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_zarr_v2_roundtrip_property(
    tmp_path_factory, data, dtype, compress, nan_fill
):
    """Any array shape x chunk shape (dividing or not) x dtype x
    compressor survives init_array + write_chunk → read_array exactly,
    with unwritten chunks reading back as the fill value — including
    the NaN fill serialized as the string "NaN" per the v2 spec."""
    import numpy as np

    from physicsnemo_curator_spark.sinks import zarr_store as Z

    rank = data.draw(st.integers(1, 3))
    shape = tuple(data.draw(st.integers(1, 9)) for _ in range(rank))
    chunks = tuple(
        data.draw(st.integers(1, s + 2)) for s in shape
    )  # chunk > shape and non-dividing chunks both legal
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    if dtype.startswith("<f"):
        arr = rng.standard_normal(shape).astype(np.dtype(dtype))
    else:
        arr = rng.integers(-1000, 1000, size=shape).astype(np.dtype(dtype))
    fill = float("nan") if (nan_fill and dtype.startswith("<f")) else 0
    comp = {"id": "zlib", "level": 1} if compress else None

    store = str(tmp_path_factory.mktemp("zv2"))
    adir = Z.init_array(
        store, "v", shape=shape, chunks=chunks, dtype=dtype,
        compressor=comp, fill_value=fill,
    )
    ncdim = [max(1, -(-s // c)) for s, c in zip(shape, chunks)]
    skip = data.draw(
        st.sets(
            st.integers(0, int(np.prod(ncdim)) - 1),
            max_size=int(np.prod(ncdim)),
        )
    )
    expect = np.full(shape, fill, dtype=np.dtype(dtype))
    for flat, idx in enumerate(np.ndindex(*ncdim)):
        if flat in skip:
            continue
        block = np.full(chunks, fill, dtype=np.dtype(dtype))
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        sub = arr[sel]
        block[tuple(slice(0, x.stop - x.start) for x in sel)] = sub
        expect[sel] = sub
        Z.write_chunk(adir, idx, block, comp)
    out = Z.read_array(adir)
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, expect)


@given(
    data=st.data(),
    sharded=st.booleans(),
    compress=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_zarr_v3_roundtrip_property(tmp_path_factory, data, sharded, compress):
    """v3 arrays — plain chunks or sharding_indexed shards with the
    crc32c-checked end index — survive write → read_array_v3 exactly,
    including partial edge shards, missing inner chunks (2^64-1 index
    sentinel → fill value) and missing whole shards."""
    import numpy as np

    from physicsnemo_curator_spark.sinks import zarr_store as Z

    nt = data.draw(st.integers(1, 12))
    nlat = data.draw(st.integers(1, 5))
    nlon = data.draw(st.integers(1, 5))
    shape = (nt, nlat, nlon)
    chunk = (1, nlat, nlon)
    shard_t = data.draw(st.integers(1, 6)) if sharded else None
    codec = {"name": "gzip", "configuration": {"level": 1}} if compress else None
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    arr = rng.standard_normal(shape)

    store = str(tmp_path_factory.mktemp("zv3"))
    adir = Z.init_array_v3(
        store, "v", shape=shape, chunk_shape=chunk,
        shard_shape=(shard_t, nlat, nlon) if sharded else None,
        dtype="<f8", codec=codec, fill_value=float("nan"),
    )
    expect = np.full(shape, np.nan)
    written = data.draw(
        st.sets(st.integers(0, nt - 1), min_size=0, max_size=nt)
    )
    if sharded:
        nshards = -(-nt // shard_t)
        for s in range(nshards):
            blocks = {}
            for i in range(shard_t):
                t = s * shard_t + i
                if t < nt and t in written:
                    blocks[i] = arr[t : t + 1]
                    expect[t] = arr[t]
            if blocks:
                Z.write_shard_v3(adir, (s, 0, 0), blocks, shard_t, codec)
    else:
        for t in written:
            Z.write_chunk_v3(adir, (t, 0, 0), arr[t : t + 1], codec)
            expect[t] = arr[t]
    out = Z.read_array_v3(adir)
    np.testing.assert_array_equal(out, expect)


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    rgb=st.booleans(),
    quality=st.sampled_from([25, 50, 75, 90, 95]),
    sub=st.sampled_from(["444", "420"]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_progressive_equals_baseline_property(
    seed, h, w, rgb, quality, sub
):
    """Progressive (SOF2) and baseline encodes of the SAME image share
    quantized coefficients bit-for-bit, so their decodes must be
    PIXEL-IDENTICAL for any image / quality / subsampling — the
    property that pins the EOB-run capping, the refinement-scan
    correction-bit ordering, and the shared DCT summation order."""
    import numpy as np

    from physicsnemo_curator_spark.sources import jpeg

    if not rgb and sub == "420":
        sub = "444"  # grayscale has no chroma to subsample
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    # bias half the examples toward sparse/flat content (long EOB runs)
    if seed % 2:
        mask = rng.random((h, w)) < 0.9
        arr[mask] = 77
    b, mb = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, quality=quality, subsampling=sub))
    p, mp = jpeg.decode_jpeg(
        jpeg.encode_jpeg_progressive(arr, quality=quality, subsampling=sub)
    )
    assert mb == mp
    np.testing.assert_array_equal(b, p)


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 1600),
    channels=st.integers(1, 2),
    smooth=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_wav_adpcm_total_property(seed, n, channels, smooth):
    """IMA ADPCM decode(encode(x)) is TOTAL for any signal: exact
    frame count via the fact chunk (block padding never leaks),
    samples stay in the int16-normalized range, and smooth signals
    stay within the 4-bit quantizer's worst step (the step table tops
    out at 32767/32768 per sample, but a band-limited signal must do
    far better)."""
    import numpy as np

    from physicsnemo_curator_spark.sources import wav

    rng = np.random.default_rng(seed)
    if smooth:
        t = np.arange(n + 8)[:n]
        base = 0.7 * np.sin(2 * np.pi * t / 64)
        sig = np.stack([np.roll(base, c) for c in range(channels)], axis=1)
    else:
        sig = rng.uniform(-1.0, 1.0, size=(n, channels))
    out, meta = wav.decode_wav(wav.encode_wav(sig, 8000, bits=4))
    out = out.reshape(n, channels)
    assert meta["n_frames"] == n and meta["bits"] == 4
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0
    if smooth and n > 32:
        # adaptation settles once the step index saturates — a signal
        # that starts mid-amplitude (phase-rolled channel) needs ~12
        # samples of attack before the 4-bit quantizer catches up, so
        # bound the tail from sample 16
        assert np.abs(out[16:] - np.clip(sig[16:], -1, 1)).max() < 0.25


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(4, 25),
    w=st.integers(4, 25),
    rgb=st.booleans(),
    quality=st.sampled_from([30, 60, 90]),
    sub=st.sampled_from(["444", "420"]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_12bit_total_property(seed, h, w, rgb, quality, sub):
    """12-bit encode->decode is TOTAL for any uint16 image in range:
    shape/dtype/meta preserved, output within the 12-bit range, and
    the decode of a mid-gray constant is exact at any quality."""
    import numpy as np

    from physicsnemo_curator_spark.sources import jpeg

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 4096, shape, dtype=np.uint16)
    out, meta = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=quality, subsampling=sub,
                         precision=12)
    )
    assert out.shape == shape and out.dtype == np.uint16
    assert meta["bits"] == 12 and meta["width"] == w
    assert int(out.max()) <= 4095


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 6),
    h=st.integers(3, 17),
    w=st.integers(3, 17),
    rgb=st.booleans(),
    codec=st.sampled_from(["raw", "mjpeg"]),
    every_n=st.integers(1, 3),
)
@settings(max_examples=30, deadline=None)
def test_avi_container_total_property(seed, n, h, w, rgb, codec, every_n):
    """AVI encode->parse->sample is TOTAL for any frame stack: the
    container round-trips frame count and geometry, raw DIB frames
    bit-exactly, MJPEG frames exactly as the standalone JPEG decode,
    and sampling returns exactly the every_n-th indices."""
    import numpy as np

    from physicsnemo_curator_spark.sources import avi, jpeg

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    frames = [
        rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)
    ]
    data = avi.encode_avi(frames, fps=10, codec=codec)
    out, meta = avi.decode_avi(data)
    assert (meta["width"], meta["height"]) == (w, h)
    assert len(out) == n
    for a, b in zip(frames, out):
        if codec == "raw":
            exp = np.stack([a] * 3, axis=2) if not rgb else a
            np.testing.assert_array_equal(exp, b)
        else:
            ref, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(a, quality=90))
            np.testing.assert_array_equal(ref, b)
    idxs = [i for i, _ in avi.iter_avi_frames(data, every_n=every_n)]
    assert idxs == list(range(0, n, every_n))


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 3000),
    channels=st.integers(1, 2),
    smooth=st.booleans(),
    bs=st.sampled_from([256, 1024, 4096]),
)
@settings(max_examples=25, deadline=None)
def test_flac_lossless_property(seed, n, channels, smooth, bs):
    """FLAC is LOSSLESS: decode(encode(x)) equals the 16-bit-quantized
    input bit-for-bit for any signal, channel count, and block size —
    including the n < block and n % block != 0 edges — and the
    STREAMINFO md5 self-check passes."""
    import numpy as np

    from physicsnemo_curator_spark.sources import flac

    rng = np.random.default_rng(seed)
    if smooth:
        base = 0.7 * np.sin(np.arange(n) / 17.0)
        sig = np.stack([np.roll(base, c) for c in range(channels)], axis=1)
    else:
        sig = rng.uniform(-1.0, 1.0, size=(n, channels))
    out, meta = flac.decode_flac(flac.encode_flac(sig, 8000, block_size=bs))
    assert meta["n_frames"] == n
    q = np.round(np.clip(sig, -1, 1) * 32767.0) / 32768.0
    np.testing.assert_array_equal(out.reshape(n, channels), q)


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    rgb=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(seed, h, w, rgb):
    """For ANY uint8 gray/RGB image, BMP encode→decode is the
    identity (bottom-up rows + 4-byte stride padding included)."""
    import numpy as np

    from physicsnemo_curator_spark.sources import bmp

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out, meta = bmp.decode_bmp(bmp.encode_bmp(arr))
    assert (meta["height"], meta["width"]) == (h, w)
    np.testing.assert_array_equal(out, arr)


@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    channels=st.sampled_from([1, 3, 4]),
    wide=st.booleans(),
    compression=st.sampled_from(["none", "lzw", "deflate", "packbits"]),
    predictor=st.sampled_from([1, 2]),
)
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip_property(
    seed, h, w, channels, wide, compression, predictor
):
    """For ANY uint8/uint16 image across every compression×predictor
    combination, TIFF encode→decode is the identity — the LZW
    early-change boundaries and 16-bit differencing wraps included."""
    import numpy as np

    from physicsnemo_curator_spark.sources import tiff

    if wide and channels == 4:
        channels = 3
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    if wide:
        arr = rng.integers(0, 65536, size=shape).astype(np.uint16)
    else:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    d = tiff.encode_tiff(arr, compression=compression, predictor=predictor)
    out, meta = tiff.decode_tiff(d)
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


@given(
    seed=st.integers(0, 2**31 - 1),
    n_frames=st.integers(1, 5),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    interlace=st.booleans(),
    every_n=st.integers(1, 3),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(seed, n_frames, h, w, interlace, every_n):
    """For ANY uint8 grayscale animation, GIF encode→decode is the
    identity frame by frame, and sampling yields exactly the
    every-n-th indices."""
    import numpy as np

    from physicsnemo_curator_spark.sources import gif

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    d = gif.encode_gif(frames, interlace=interlace, delay_cs=3)
    out, meta = gif.decode_gif(d)
    assert meta["n_frames"] == n_frames
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)
    idxs = [i for i, _ in gif.iter_gif_frames(d, every_n=every_n)]
    assert idxs == list(range(0, n_frames, every_n))


@given(
    seed=st.integers(0, 2**31 - 1),
    n_frames=st.integers(1, 4),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    rgb=st.booleans(),
    container=st.sampled_from(["mp4_raw", "mp4_mjpeg", "mkv_lossless"]),
)
@settings(max_examples=40, deadline=None)
def test_video_container_total_property(
    seed, n_frames, h, w, rgb, container
):
    """For ANY frame stack, the MP4/MKV containers decode to the
    right frame count and geometry; the exact modes (raw sample
    entries, lossless MJPEG blocks) are bit-identical."""
    import numpy as np

    from physicsnemo_curator_spark.sources import mkv, mp4

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    frames = [
        rng.integers(0, 256, size=shape, dtype=np.uint8)
        for _ in range(n_frames)
    ]
    if container == "mp4_raw":
        out, meta = mp4.decode_mp4(mp4.encode_mp4(frames, codec="raw"))
        exact = True
    elif container == "mp4_mjpeg":
        out, meta = mp4.decode_mp4(
            mp4.encode_mp4(frames, codec="mjpeg", quality=90)
        )
        exact = False
    else:
        if rgb:
            frames = [f[:, :, 0] for f in frames]
        out, meta = mkv.decode_mkv(
            mkv.encode_mkv(frames, codec="mjpeg_lossless")
        )
        exact = True
    assert meta["n_frames"] == n_frames
    assert (meta["height"], meta["width"]) == (h, w)
    if exact and container == "mp4_raw":
        for a, b in zip(frames, out):
            exp = np.stack([a] * 3, axis=2) if a.ndim == 2 else a
            np.testing.assert_array_equal(exp, b)
    elif exact:
        for a, b in zip(frames, out):
            np.testing.assert_array_equal(a, b)


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([1, 3, 4]),
    rle=st.booleans(),
)
@_settings
def test_tga_roundtrip_property(seed, h, w, channels, rle):
    """For ANY uint8 image, TGA encode→decode is the identity (both
    uncompressed type 2/3 and RLE type 10/11), and the header probe
    agrees with the decode on geometry."""
    import numpy as np

    from physicsnemo_curator_spark.sources import tga

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = tga.encode_tga(px, rle=rle)
    out, meta = tga.decode_tga(data)
    np.testing.assert_array_equal(out, px)
    probe = tga.probe_tga(data)
    assert (probe["height"], probe["width"]) == (h, w)
    assert probe["channels"] == channels
    # RLE never inflates a constant image: 128-pixel runs pack to
    # 1 + channels bytes each
    if rle:
        flat = tga.encode_tga(np.zeros(shape, dtype=np.uint8), rle=True)
        plain = tga.encode_tga(np.zeros(shape, dtype=np.uint8), rle=False)
        assert len(flat) <= len(plain) or h * w < 2


_cue_line = st.text(
    alphabet=st.sampled_from(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ,.!?'\""
    ),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip() == s and s.strip() != "")


@given(
    cues=st.lists(
        st.tuples(
            st.integers(0, 120 * 3600 * 1000),  # start (incl. 100h+)
            st.integers(1, 3600 * 1000),  # duration
            st.lists(_cue_line, min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=6,
    ),
    fmt=st.sampled_from(["srt", "vtt"]),
)
@_settings
def test_subtitles_roundtrip_property(cues, fmt):
    """For ANY cue list (multi-line bodies, 100h+ timestamps), the
    SRT/VTT writers and the parser are inverse: times and text
    survive exactly, indices renumber sequentially, and a second
    write is byte-identical (serialization is a fixed point)."""
    from physicsnemo_curator_spark.sources import subtitles

    cue_dicts = [
        {
            "cue_index": k + 1,
            "start_ms": start,
            "end_ms": start + dur,
            "text": "\n".join(body),
        }
        for k, (start, dur, body) in enumerate(cues)
    ]
    write = subtitles.write_srt if fmt == "srt" else subtitles.write_vtt
    data = write(cue_dicts)
    parsed = subtitles.parse_subtitles(data)
    assert len(parsed) == len(cue_dicts)
    for orig, got in zip(cue_dicts, parsed):
        assert got["start_ms"] == orig["start_ms"]
        assert got["end_ms"] == orig["end_ms"]
        assert got["text"] == orig["text"]
    assert parsed == subtitles.parse_subtitles(data.decode("utf-8"))
    assert write(parsed) == data


@given(
    n_frames=st.integers(1, 24),
    bitrate=st.sampled_from([32, 64, 128, 192, 320]),
    sample_rate=st.sampled_from([44100, 48000, 32000]),
    channels=st.sampled_from([1, 2]),
    tagged=st.booleans(),
)
@_settings
def test_mp3_header_walk_property(
    n_frames, bitrate, sample_rate, channels, tagged
):
    """For ANY CBR parameter combination, the frame walk reconstructs
    exactly the synthesized stream: frame count, sample accounting,
    CBR bitrate, ID3 detection, and the padding-bit accumulator
    (total bytes must equal the walked frame lengths, so a
    frame_len arithmetic bug can't hide)."""
    from physicsnemo_curator_spark.sources import mpegaudio

    tags = {"title": "t", "artist": "a"} if tagged else None
    data = mpegaudio.build_mp3(
        n_frames,
        bitrate_kbps=bitrate,
        sample_rate=sample_rate,
        channels=channels,
        tags=tags,
    )
    info = mpegaudio.parse_mp3(data)
    assert info["n_frames"] == n_frames
    assert info["sample_rate"] == sample_rate
    assert info["channels"] == channels
    assert info["bitrate_kbps"] == bitrate
    assert info["vbr"] is False and info["id3v2"] is tagged
    assert info["n_samples"] == n_frames * info["samples_per_frame"]
    # byte-exact accounting: CBR frame bytes average to the nominal
    # bitrate over the whole stream (padding accumulator property)
    audio_bytes = len(data) - mpegaudio.id3v2_size(data)
    expect = n_frames * info["samples_per_frame"] * bitrate * 1000 / (
        8 * sample_rate
    )
    assert abs(audio_bytes - expect) < info["samples_per_frame"]
    if tagged:
        assert mpegaudio.extract_id3(data)["title"] == "t"


# ---------------------------------------------------------------------------
# r11 property groups (VERDICT-r10 ask #4): resample grid invariants,
# metrics-ledger latest-record-wins, interval-join completeness


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 300),
    channels=st.integers(1, 2),
    rates=st.sampled_from(
        [(8000, 16000), (8000, 24000), (11025, 22050), (16000, 48000),
         (22050, 44100), (8000, 4000), (44100, 22050), (48000, 16000)]
    ),
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_resample_audio_grid_property(spark, seed, n, channels, rates):
    """Rate/width/channel matrix for resample_audio: (a) the output
    length is exactly n*target//src; (b) channel count and container
    survive; (c) on INTEGER upsampling (target = k*src) every k-th
    output sample sits ON the input grid — linear interpolation is
    exact at grid points, so out[i*k] must equal in[i] to within one
    16-bit quantization step (the even-integer-grid oracle the
    q_media_resample gate pins at fixture scale)."""
    from physicsnemo_curator_spark.sources import multimodal as mm
    from physicsnemo_curator_spark.sources import wav

    src, target = rates
    rng = np.random.default_rng(seed)
    sig = rng.uniform(-0.9, 0.9, (n, channels) if channels > 1 else n)
    # pre-quantize so encode→decode is exact and the only error left is
    # the interpolation itself
    sig = np.round(sig * 32767.0) / 32768.0
    payload = wav.encode_wav(sig, src, bits=16)
    df = spark.createDataFrame(
        [(0, "audio", bytearray(payload), None, None, len(payload))],
        "media_id long, kind string, payload binary, width int, "
        "height int, n_bytes long",
    )
    out_payload = bytes(
        mm.resample_audio(df, target).collect()[0]["payload"]
    )
    n_out = n * target // src
    if n_out == 0:
        # documented degenerate contract: payloads shorter than one
        # output sample pass through byte-identical
        assert out_payload == payload
        return
    out, meta = wav.decode_wav(out_payload)
    assert meta["sample_rate"] == target
    assert meta["channels"] == channels
    x = out[:, None] if out.ndim == 1 else out
    s = sig[:, None] if sig.ndim == 1 else sig
    assert x.shape == (n_out, channels)
    if target % src == 0:
        k = target // src
        grid = x[:: k]
        # tolerance: decode(encode(x)) = round(x*32767)/32768, so each
        # of the two encode/decode trips moves a value by up to ~2 LSB
        assert np.abs(grid - s[: grid.shape[0]]).max() <= 2.5 / 32768.0
    # linear interpolation never leaves the input's convex hull
    assert x.max() <= s.max() + 2.5 / 32768.0
    assert x.min() >= s.min() - 2.5 / 32768.0


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),        # idx
            st.sampled_from(["completed", "error"]),
            st.integers(0, 3),        # worker
        ),
        min_size=1,
        max_size=12,
    ),
    crash_batch=st.integers(0, 3),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_metrics_ledger_latest_record_wins_property(
    spark, tmp_path_factory, events, crash_batch
):
    """Random retry sequences against the metrics ledger: whatever the
    append batching (records land in randomized batch splits, one of
    which simulates a crashed write that is retried — appended twice),
    index_df must resolve each idx to the LAST record by insertion
    order, and run_summary_df must count each idx exactly once.  The
    duplicated batch models record_index_results' at-least-once
    delivery: latest-record-wins makes the retry idempotent for
    status/wall-time consumers."""
    from physicsnemo_curator_spark.core.metrics import MetricsStore

    tmp = tmp_path_factory.mktemp("ledger")
    store = MetricsStore(str(tmp))
    # split events into batches of <=4 and append; re-append one batch
    # to simulate a retried crashed write
    batches = [events[i : i + 4] for i in range(0, len(events), 4)]
    for bi, batch in enumerate(batches):
        recs = [
            {"idx": idx, "status": status, "worker_id": f"w{w}",
             "wall_time_s": float(idx)}
            for idx, status, w in batch
        ]
        store.record_index_results(spark, "p", recs)
        if bi == crash_batch % len(batches):
            store.record_index_results(spark, "p", recs)
    got = {
        r["idx"]: r["status"] for r in store.index_df(spark).collect()
    }
    # python model: last write per idx in event order wins (the
    # duplicated batch repeats a prefix-consistent suffix, so the
    # final state per idx is unchanged by the retry)
    expect: dict[int, str] = {}
    for bi, batch in enumerate(batches):
        for idx, status, _w in batch:
            expect[idx] = status
        if bi == crash_batch % len(batches):
            for idx, status, _w in batch:
                expect[idx] = status
    assert got == expect
    s = store.run_summary_df(spark).collect()[0]
    assert s["completed"] == sum(
        1 for v in expect.values() if v == "completed"
    )
    assert s["failed"] == sum(1 for v in expect.values() if v != "completed")
    assert s["total"] == len(expect)


@given(
    lefts=st.lists(st.integers(0, 120), min_size=1, max_size=8),
    rights=st.lists(st.integers(0, 120), min_size=1, max_size=8),
    upper=st.integers(10, 90),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_join_stream_completeness_property(
    spark, tmp_path_factory, lefts, rights, upper
):
    """Watermark-bounded completeness over random event offsets: with
    a watermark covering the fixture's full event-time span, the REAL
    readStream interval join must emit exactly the closed-form pair
    set {(l, r) : same key, 0 <= l.ts - r.ts <= upper} (interval_join
    attaches right-side events that happened up to upper seconds BEFORE
    the left event) — computed here in plain Python, not via another
    Spark join."""
    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )

    tmp = tmp_path_factory.mktemp("ivj")
    base = 1_700_000_000

    def write(side, offs):
        rows = [
            (i, 1, float(i), base + o) for i, o in enumerate(offs)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, epoch long"
        ).selectExpr(
            "event_id", "user_id",
            "CAST(TIMESTAMP_SECONDS(epoch) AS TIMESTAMP) ts", "value",
        ).select("event_id", "user_id", "ts", "value")
        df.repartition(2).write.parquet(str(tmp / side))

    write("l", lefts)
    write("r", rights)
    out = run_interval_join_stream(
        spark,
        str(tmp / "l"),
        str(tmp / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp / "run"),
        lower_seconds=0,
        upper_seconds=upper,
        watermark="1 hour",
        state_partitions=2,
    )
    got = sorted((r["a"], r["b"]) for r in out.collect())
    inner = sorted(
        (i, j)
        for i, lo in enumerate(lefts)
        for j, ro in enumerate(rights)
        if 0 <= lo - ro <= upper
    )
    assert got == inner
    # LEFT OUTER over the same offsets: inner pairs plus one
    # null-right row for every unmatched left (the watermark-driven
    # emission path the flush batches exist for)
    outer = run_interval_join_stream(
        spark,
        str(tmp / "l"),
        str(tmp / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp / "run_outer"),
        lower_seconds=0,
        upper_seconds=upper,
        watermark="1 hour",
        state_partitions=2,
        how="left_outer",
    )
    key = lambda t: (t[0], -1 if t[1] is None else t[1])
    got_outer = sorted(((r["a"], r["b"]) for r in outer.collect()), key=key)
    matched = {i for i, _ in inner}
    expect_outer = sorted(
        inner + [(i, None) for i in range(len(lefts)) if i not in matched],
        key=key,
    )
    assert got_outer == expect_outer


# ---------------------------------------------------------------------------
# r12 property groups (VERDICT-r11 ask #7): SQ8 quantization bounds,
# PQ ADC exactness on degenerate codebooks, full_outer flush margins


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1e4, 1e4, allow_nan=False, width=32),
            min_size=6,
            max_size=6,
        ),
        min_size=1,
        max_size=12,
    ),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sq8_roundtrip_bound_property(spark, vecs):
    """For ANY vector set: codes stay in [0, 255]; the reconstruction
    error is within HALF a quantization step per dimension —
    |recon − v| ≤ (mx − mn)/510 (floor(x+0.5) rounds to nearest) —
    with constant dimensions reconstructing exactly; and the fused
    transform() kernel (sq8_recon_expr) equals the two-step
    code→reconstruct composition bit-for-bit (the janino-fix twin must
    never drift from the persisted-code-table path)."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import similarity

    dim = 6
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    mins, maxs = similarity.sq8_train(df, dim=dim)
    arr = np.asarray(vecs, dtype=np.float64)
    np.testing.assert_allclose(mins, arr.min(axis=0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(maxs, arr.max(axis=0), rtol=1e-6, atol=1e-6)
    rows = df.select(
        "vec_id",
        similarity.sq8_code_expr("embedding", mins, maxs).alias("codes"),
        similarity.sq8_reconstruct_expr(
            similarity.sq8_code_expr("embedding", mins, maxs), mins, maxs
        ).alias("recon2"),
        similarity.sq8_recon_expr("embedding", mins, maxs).alias("recon1"),
        "embedding",
    ).collect()
    for r in rows:
        v = np.asarray(r["embedding"])
        r1 = np.asarray(r["recon1"])
        r2 = np.asarray(r["recon2"])
        assert all(0 <= c <= 255 for c in r["codes"])
        np.testing.assert_array_equal(r1, r2)
        span = np.asarray(maxs) - np.asarray(mins)
        bound = span / 510.0 + np.abs(span) * 1e-12 + 1e-12
        assert (np.abs(r1 - v) <= bound).all(), (v, r1, bound)


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 8),
    m=st.sampled_from([2, 4]),
    nq=st.integers(1, 3),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pq_adc_exact_on_degenerate_codebooks_property(spark, seed, n, m, nq):
    """When every corpus subvector IS a codebook entry (codebooks built
    from the corpus itself, ks = n), PQ encoding must pick a zero-
    distance code in every subspace, reconstruction is exact, and the
    ADC cosine equals the exact cosine for every (query, vector) pair
    — the identity that pins the LUT arithmetic (subspace dots sum to
    the full dot; reconstruction norms sum to the squared norm)."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import mllib_ann, similarity

    dim = 8
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    qs = df.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cbs = mllib_ann.pq_train(df, m=m, ks=n, dim=dim)
    adc = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in mllib_ann.pq_topk(
            df, qs, k=n, dim=dim, codebooks=cbs
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(df, qs, k=n, dim=dim).collect()
    }
    assert set(adc) == set(exact)
    for key, c in exact.items():
        assert math.isclose(adc[key], c, rel_tol=1e-9, abs_tol=1e-9), (
            key, adc[key], c,
        )


@given(
    lefts=st.lists(st.integers(0, 120), min_size=1, max_size=6),
    rights=st.lists(st.integers(0, 120), min_size=1, max_size=6),
    lower=st.integers(-40, 0),
    upper=st.integers(10, 90),
    watermark_min=st.sampled_from([5, 60]),
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_full_outer_flush_margin_completeness_property(
    spark, tmp_path_factory, lefts, rights, lower, upper, watermark_min
):
    """Random offsets x interval bounds (NEGATIVE lower included — it
    widens a left row's state expiry beyond upper) x watermark: the
    full_outer streaming run must emit exactly the closed-form set —
    inner pairs {lower <= l.ts - r.ts <= upper}, one null-right row
    per unmatched left, one null-left row per unmatched right.  A
    flush-margin arithmetic bug (under-margined flush_ts) strands
    unmatched rows in state and breaks this equality."""
    from physicsnemo_curator_spark.streaming.joins import (
        run_interval_join_stream,
    )

    tmp = tmp_path_factory.mktemp("fom")
    base = 1_700_000_000

    def write(side, offs):
        rows = [(i, 1, float(i), base + o) for i, o in enumerate(offs)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, epoch long"
        ).selectExpr(
            "event_id", "user_id",
            "CAST(TIMESTAMP_SECONDS(epoch) AS TIMESTAMP) ts", "value",
        ).select("event_id", "user_id", "ts", "value")
        df.repartition(2).write.parquet(str(tmp / side))

    write("l", lefts)
    write("r", rights)
    out = run_interval_join_stream(
        spark,
        str(tmp / "l"),
        str(tmp / "r"),
        "event_id long, user_id long, ts timestamp, value double",
        {"a": "l.event_id", "b": "r.event_id"},
        work_dir=str(tmp / "run"),
        lower_seconds=lower,
        upper_seconds=upper,
        watermark=f"{watermark_min} minutes",
        state_partitions=2,
        how="full_outer",
    )
    key = lambda t: (
        -1 if t[0] is None else t[0],
        -1 if t[1] is None else t[1],
    )
    got = sorted(((r["a"], r["b"]) for r in out.collect()), key=key)
    inner = [
        (i, j)
        for i, lo in enumerate(lefts)
        for j, ro in enumerate(rights)
        if lower <= lo - ro <= upper
    ]
    ml = {i for i, _ in inner}
    mr = {j for _, j in inner}
    expect = sorted(
        inner
        + [(i, None) for i in range(len(lefts)) if i not in ml]
        + [(None, j) for j in range(len(rights)) if j not in mr],
        key=key,
    )
    assert got == expect


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 9),
    k=st.integers(1, 9),
    lamb=st.sampled_from([0.0, 0.3, 0.5, 0.7, 1.0]),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mmr_greedy_matches_reference_property(spark, seed, n, k, lamb):
    """For ANY corpus/λ/k: the Spark MMR selection equals an
    independent driver-side numpy greedy (same empty-max=0 convention,
    same (score desc, id asc) tie-break), emits min(k, n) distinct
    picks, and the first pick maximizes relevance when λ > 0."""
    from physicsnemo_curator_spark.operators import similarity

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    qv = rng.normal(size=4)
    qs = spark.createDataFrame(
        [(0, [float(v) for v in qv])], "query_id long, embedding array<double>"
    )
    from pyspark.sql import functions as F

    cand = emb.select(F.lit(0).alias("query_id"), "vec_id")
    got = [
        (r["vec_id"], r["mmr_score"])
        for r in sorted(
            similarity.mmr_rerank(emb, qs, cand, k=k, lamb=lamb).collect(),
            key=lambda r: r["mmr_rank"],
        )
    ]
    # independent reference
    norms = np.sqrt((X * X).sum(axis=1)); norms[norms == 0] = 1.0
    qn = float(np.sqrt(qv @ qv)) or 1.0
    rel = (X @ qv) / (norms * qn)
    sim = (X @ X.T) / np.outer(norms, norms)
    max_sim = np.full(n, -np.inf)
    taken = np.zeros(n, bool)
    expect = []
    for _ in range(min(k, n)):
        ms = np.where(np.isneginf(max_sim), 0.0, max_sim)
        score = lamb * rel - (1 - lamb) * ms
        score[taken] = -np.inf
        j = min(range(n), key=lambda i: (-score[i], i))
        taken[j] = True
        expect.append((j, score[j]))
        max_sim = np.maximum(max_sim, sim[:, j])
    assert [g[0] for g in got] == [e[0] for e in expect]
    assert len({g[0] for g in got}) == min(k, n)
    for g, e in zip(got, expect):
        assert math.isclose(g[1], e[1], rel_tol=1e-9, abs_tol=1e-12)


@given(
    seed=st.integers(0, 2**31 - 1),
    n_lists=st.integers(1, 4),
    n_docs=st.integers(1, 8),
    c=st.sampled_from([1, 10, 60]),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rrf_fusion_properties(spark, seed, n_lists, n_docs, c):
    """For ANY ranked lists: fused scores equal the closed-form
    Σ 1/(c+rank) exactly, the output is invariant to the ORDER the
    lists are passed in, and ranks are a permutation-free 1..k
    sequence per query."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import similarity

    rng = np.random.default_rng(seed)
    lists = []
    truth: dict[int, float] = {}
    for _ in range(n_lists):
        perm = rng.permutation(n_docs)[: rng.integers(1, n_docs + 1)]
        rows = [(0, int(d), r + 1) for r, d in enumerate(perm)]
        for _, d, r in rows:
            truth[d] = truth.get(d, 0.0) + 1.0 / (c + r)
        lists.append(
            spark.createDataFrame(
                rows, "query_id long, vec_id long, rank int"
            )
        )
    k = n_docs
    out = sorted(
        similarity.rrf_fuse(lists, k=k, c=c).collect(),
        key=lambda r: r["rank"],
    )
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(r["vec_id"], round(r["rrf_score"], 12)) for r in out] == [
        (d, round(s, 12)) for d, s in expect
    ]
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    rev = sorted(
        similarity.rrf_fuse(list(reversed(lists)), k=k, c=c).collect(),
        key=lambda r: r["rank"],
    )
    assert [(r["vec_id"], r["rank"]) for r in rev] == [
        (r["vec_id"], r["rank"]) for r in out
    ]
