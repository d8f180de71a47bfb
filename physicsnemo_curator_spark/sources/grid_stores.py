"""Read-side Spark sources for the engine's scientific grid stores.

Inverts the write-side encoders (``sinks/zarr_store.py``,
``sinks/netcdf3.py``) as task-parallel scans: the DRIVER touches
metadata only (array shapes, chunk inventory, file listing — a few KB),
and all chunk/file decoding runs inside Spark tasks via ``mapInPandas``
— one task per Zarr chunk / NetCDF file.  This is the same
decomposition the reference uses to read ERA5 from Zarr (reference
``domains/da/sources/era5.py:103-404``: one pipeline index per
timestep, lazily sliced), re-expressed as a Spark scan whose unit of
parallelism is the store's own chunking.

Scale posture: a year of ERA5 at (1, 721, 1440) chunking is ~9k chunks
per variable — tens of thousands of independent ~4 MB tasks, exactly
the shape Spark schedules well.  Nothing here ever assembles a full
array anywhere.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from physicsnemo_curator_spark.sinks.zarr_store import (
    _decompress,
    _v3_layout,
    decode_shard,
    read_array,
    read_array_meta,
    read_array_meta_v3,
    read_array_v3,
)

_GRID_SCHEMA = (
    "variable string, time double, lat double, lon double, value double"
)


def zarr_grid_meta(
    store: str, variables: list[str] | None = None
) -> tuple[list[tuple], dict[str, tuple[list, list, list]]]:
    """Driver-side PER-VARIABLE metadata pass over a
    :func:`write_grid_zarr` store — O(variables) work, never O(chunks).

    Returns (variable rows, per-variable coordinate vectors).  Variable
    rows are ``(variable, data_dir, zarr_format, shard_t, nt, nlat,
    nlon, dtype, codec_json)`` — one per array, a few hundred bytes
    each; coordinate vectors come from the sibling ``time``/``lat``/
    ``lon`` 1-D arrays when present (stores written before coords
    existed fall back to index coordinates).  Handles both the v2
    layout (``.zarray`` + ``{t}.0.0`` chunk files) and v3
    (``zarr.json`` + ``c/<s>/0/0`` files, sharded or not).
    """
    if variables is None:
        variables = sorted(store_lexicon(store))
    rows: list[tuple] = []
    coords: dict[str, tuple[list, list, list]] = {}
    for v in variables:
        adir = os.path.join(store, v, "data")
        vdir = os.path.join(store, v)
        if os.path.exists(os.path.join(adir, "zarr.json")):
            # Zarr v3 (possibly sharded): the on-disk unit is the outer
            # grid file c/<s>/0/0 holding grid[0] inner time chunks.
            lay = _v3_layout(read_array_meta_v3(adir))
            nt, nla, nlo = lay["shape"]
            fmt = 3
            shard_t = int(lay["grid"][0])
            comp = json.dumps(
                {"codec": lay["codec"], "sharded": lay["sharded"]}
            )
            dtype = lay["dtype"].str
            has_coord = lambda cdir: os.path.exists(  # noqa: E731
                os.path.join(cdir, "zarr.json")
            )
            read_coord = read_array_v3
        else:
            meta = read_array_meta(adir)
            nt, nla, nlo = meta["shape"]
            fmt = 2
            shard_t = 1
            comp = json.dumps(meta["compressor"])
            dtype = meta["dtype"]
            has_coord = lambda cdir: os.path.exists(  # noqa: E731
                os.path.join(cdir, ".zarray")
            )
            read_coord = read_array
        cvecs = []
        for cname, n in (("time", nt), ("lat", nla), ("lon", nlo)):
            cdir = os.path.join(vdir, cname)
            if has_coord(cdir):
                cvecs.append([float(x) for x in read_coord(cdir)])
            else:
                cvecs.append([float(i) for i in range(n)])
        coords[v] = (cvecs[0], cvecs[1], cvecs[2])
        rows.append((v, adir, fmt, shard_t, nt, nla, nlo, dtype, comp))
    return rows, coords


def read_grid_zarr(
    spark: SparkSession,
    store: str,
    *,
    variables: list[str] | None = None,
    meta: tuple | None = None,
) -> DataFrame:
    """Task-per-chunk scan of a grid Zarr store → long DataFrame
    ``(variable, time, lat, lon, value)``.

    ``meta`` takes a precomputed :func:`zarr_grid_meta` result so a
    caller that already paid the driver-side metadata pass (e.g. the
    federated alignment gate) doesn't repeat it.

    Cells at the writer's NaN fill value (never written) are dropped,
    so the result is the long-table inverse of
    :func:`~physicsnemo_curator_spark.sinks.zarr_store.write_grid_zarr`.
    ``variables`` prunes whole groups driver-side — partition pruning
    at the store layout level, before any task launches.

    Scale shape: the driver handles O(variables) metadata only.  Chunk
    DISCOVERY runs inside Spark tasks (one listing task per variable's
    ``data/`` directory), the resulting chunk inventory is shuffled
    across the cluster, and each chunk decodes in its own task — so a
    store with 10⁷ chunks never materializes 10⁷ of anything on the
    driver (the scale note from round 4's review).
    """
    var_rows, coords = meta if meta is not None else zarr_grid_meta(
        store, variables
    )
    inv_schema = (
        "variable string, t_idx int, path string, fmt int, shard_t int,"
        " nlat int, nlon int, dtype string, comp string"
    )
    meta_df = spark.createDataFrame(
        var_rows,
        "variable string, adir string, fmt int, shard_t int, nt int,"
        " nlat int, nlon int, dtype string, comp string",
    ).repartition(max(1, len(var_rows)))

    def _list_chunks(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # task-side listing: v2 chunk files are "{t}.0.0" in the array
        # dir; v3 units (shards or plain chunks) are "c/<s>/0/0".  One
        # directory scan per variable — O(existing), not O(shape).
        # t_idx carries the chunk's time index (v2) or the shard's
        # FIRST time index (v3).
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                t_idx, paths = [], []
                if r.fmt == 3:
                    cdir = os.path.join(r.adir, "c")
                    if os.path.isdir(cdir):
                        for d in os.listdir(cdir):
                            p = os.path.join(cdir, d, "0", "0")
                            # bound check mirrors the v2 branch: a
                            # stale shard from a larger previous write
                            # must not emit phantom rows or index past
                            # the coordinate vectors
                            if (
                                d.isdigit()
                                and os.path.exists(p)
                                and int(d) * r.shard_t < r.nt
                            ):
                                t_idx.append(int(d) * r.shard_t)
                                paths.append(p)
                else:
                    for fname in os.listdir(r.adir):
                        parts = fname.split(".")
                        if (
                            len(parts) == 3
                            and parts[0].isdigit()
                            and parts[1:] == ["0", "0"]
                        ):
                            t = int(parts[0])
                            if t < r.nt:
                                t_idx.append(t)
                                paths.append(os.path.join(r.adir, fname))
                n = len(paths)
                yield pd.DataFrame(
                    {
                        "variable": r.variable,
                        "t_idx": pd.array(t_idx, dtype="int32"),
                        "path": paths,
                        "fmt": pd.array([r.fmt] * n, dtype="int32"),
                        "shard_t": pd.array([r.shard_t] * n, dtype="int32"),
                        "nlat": pd.array([r.nlat] * n, dtype="int32"),
                        "nlon": pd.array([r.nlon] * n, dtype="int32"),
                        "dtype": [r.dtype] * n,
                        "comp": [r.comp] * n,
                    }
                )

    inv = meta_df.mapInPandas(_list_chunks, inv_schema)
    # round-robin shuffle so chunk decodes spread across the cluster
    # regardless of how many variables produced them
    inv = inv.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    )

    def _decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _emit(variable, t, block):
            ila, ilo = np.nonzero(~np.isnan(block))
            times, lats, lons = coords[variable]
            return pd.DataFrame(
                {
                    "variable": variable,
                    "time": times[t],
                    "lat": np.asarray(lats, dtype=float)[ila],
                    "lon": np.asarray(lons, dtype=float)[ilo],
                    "value": block[ila, ilo].astype(float),
                }
            )

        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                with open(r.path, "rb") as f:
                    blob = f.read()
                shape = (r.nlat, r.nlon)
                dt = np.dtype(r.dtype)
                if r.fmt == 3:
                    cfg = json.loads(r.comp)
                    if cfg["sharded"]:
                        blocks = decode_shard(
                            blob, r.shard_t, (1, *shape), dt, cfg["codec"]
                        )
                        for i, arr in blocks.items():
                            yield _emit(
                                r.variable, r.t_idx + i, arr.reshape(shape)
                            )
                    else:
                        from physicsnemo_curator_spark.sinks.zarr_store import (
                            _decode_v3,
                        )

                        raw = _decode_v3(blob, cfg["codec"])
                        yield _emit(
                            r.variable,
                            r.t_idx,
                            np.frombuffer(raw, dt).reshape(shape),
                        )
                else:
                    raw = _decompress(blob, json.loads(r.comp))
                    yield _emit(
                        r.variable, r.t_idx, np.frombuffer(raw, dt).reshape(shape)
                    )

    return inv.mapInPandas(_decode, _GRID_SCHEMA)


def store_lexicon(store: str) -> set[str]:
    """Variables a grid store can serve — its directory listing IS the
    lexicon (the reference keys routing on static per-backend lexicon
    modules, ``domains/da/sources/era5.py:286-297``; for a materialized
    store the authoritative lexicon is what is on disk).  Raises on an
    unreadable/absent store so callers can treat it as a failed backend.
    """
    entries = os.listdir(store)  # OSError propagates = backend failed
    return {
        d
        for d in entries
        if not d.startswith(".")
        and os.path.isdir(os.path.join(store, d, "data"))
    }


def resolve_grid_routing(
    variables: list[str], backends: list[tuple[str, set[str]]]
) -> dict[str, str]:
    """Map each variable to its highest-priority backend whose lexicon
    contains it (reference ``era5.py:261-297`` ``_resolve_routing``).
    ``backends`` is priority-ordered ``(name, lexicon)``.  Unresolved
    variables raise ValueError, matching the reference's contract.
    """
    routing: dict[str, str] = {}
    unresolved: list[str] = []
    for var in variables:
        for bname, lex in backends:
            if var in lex:
                routing[var] = bname
                break
        else:
            unresolved.append(var)
    if unresolved:
        names = ", ".join(b for b, _ in backends)
        raise ValueError(
            f"Variables not found in any backend ({names}): {unresolved}"
        )
    return routing


def read_grid_federated(
    spark: SparkSession,
    backends: list[tuple[str, str]],
    variables: list[str],
) -> DataFrame:
    """ERA5Source-style federated read across prioritized grid stores
    (reference ``era5.py:103-404``): route each variable to the first
    backend that serves it, drop backends whose probe fails and re-route
    their variables to the remaining ones (``era5.py:244-259``), verify
    lat/lon grid alignment across backends before merging
    (``era5.py:352-366``), and union the per-backend scans.

    ``backends`` is priority-ordered ``(name, store_path)``.  All
    routing/probing is driver-side METADATA work (directory listings +
    coordinate vectors); the data path is N independent task-parallel
    :func:`read_grid_zarr` scans merged with ``unionByName`` — no
    shuffle is introduced by federation itself.
    """
    import warnings

    stores = dict(backends)
    lexicons: list[tuple[str, set[str]]] = []
    for bname, store in backends:
        try:
            lexicons.append((bname, store_lexicon(store)))
        except OSError as exc:
            warnings.warn(
                f"grid backend {bname!r} failed to probe ({exc}); "
                "re-routing its variables",
                stacklevel=2,
            )
    if not lexicons:
        raise RuntimeError(
            f"All backends failed. Cannot serve variables: {variables}"
        )
    routing = resolve_grid_routing(variables, lexicons)

    groups: dict[str, list[str]] = {}
    for var, bname in routing.items():
        groups.setdefault(bname, []).append(var)

    # grid-alignment gate: every serving backend must expose identical
    # lat/lon coordinate vectors (reference raises on mismatch before
    # any concat)
    ref: tuple[list, list] | None = None
    ref_name = ""
    metas: dict[str, tuple] = {}
    for bname, var_list in groups.items():
        metas[bname] = zarr_grid_meta(stores[bname], sorted(var_list))
        coords = metas[bname][1]
        for v, (_, lats, lons) in coords.items():
            if ref is None:
                ref, ref_name = (lats, lons), bname
            elif lats != ref[0]:
                raise ValueError(
                    f"Latitude grid mismatch between backend {ref_name!r}"
                    f" and {bname!r} (variable {v!r})"
                )
            elif lons != ref[1]:
                raise ValueError(
                    f"Longitude grid mismatch between backend {ref_name!r}"
                    f" and {bname!r} (variable {v!r})"
                )

    parts = [
        read_grid_zarr(
            spark,
            stores[bname],
            variables=sorted(var_list),
            meta=metas[bname],
        )
        for bname, var_list in sorted(groups.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_netcdf3_grid(
    spark: SparkSession,
    nc_dir: str,
    *,
    variables: list[str] | None = None,
) -> DataFrame:
    """Task-per-file scan over a directory of classic NetCDF-3 files
    (the layout :func:`~physicsnemo_curator_spark.sinks.scientific.
    write_netcdf_per_variable_year` produces: one file per
    (variable, year), dims (time, lat, lon) + coordinate variables).

    Each task parses ONE file with the pure-Python CDF-1 reader and
    emits present (non-NaN) cells as long rows — the file split is the
    (variable, year) partition, so a multi-decade multi-variable
    archive scans wide with zero driver data movement.
    """
    wanted = set(variables) if variables is not None else None

    def _maybe_wanted(fname: str) -> bool:
        # the writer names files "{variable}_{year}.nc" — prune whole
        # files by name BEFORE any task parses bytes (the layout-level
        # partition pruning the Zarr reader gets from group dirs).
        # Files not matching the convention fall through to the
        # in-task variable check, which remains the correctness gate.
        if wanted is None:
            return True
        stem = fname[: -len(".nc")]
        if "_" not in stem:
            return True
        var, _, year = stem.rpartition("_")
        if not year.isdigit():
            return True
        return var in wanted

    paths = sorted(
        os.path.join(nc_dir, f)
        for f in os.listdir(nc_dir)
        if f.endswith(".nc") and _maybe_wanted(f)
    )
    inv = spark.createDataFrame([(p,) for p in paths], "path string")
    inv = inv.repartition(max(1, len(paths)))

    def _decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from physicsnemo_curator_spark.sinks.netcdf3 import read_netcdf3

        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                nc = read_netcdf3(r.path)
                coord_names = {"time", "lat", "lon"}
                data_vars = [
                    v for v in nc["variables"] if v not in coord_names
                ]
                times = np.asarray(nc["variables"]["time"], dtype=float)
                lats = np.asarray(nc["variables"]["lat"], dtype=float)
                lons = np.asarray(nc["variables"]["lon"], dtype=float)
                for v in data_vars:
                    if wanted is not None and v not in wanted:
                        continue
                    arr = np.asarray(nc["variables"][v], dtype=float)
                    it, ila, ilo = np.nonzero(~np.isnan(arr))
                    yield pd.DataFrame(
                        {
                            "variable": v,
                            "time": times[it],
                            "lat": lats[ila],
                            "lon": lons[ilo],
                            "value": arr[it, ila, ilo],
                        }
                    )

    return inv.mapInPandas(_decode, _GRID_SCHEMA)
