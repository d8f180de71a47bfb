"""PySpark Python DataSource for VTK mesh directories.

The SURVEY §2.1 mapping for ``VTKSource`` is "custom DataSource V2 /
binaryFile reader"; `sources/vtk.py::read_vtk` covers the binaryFile +
``mapInPandas`` path.  This module is the DataSource V2 half, built on
PySpark 4's Python DataSource API (``pyspark.sql.datasource``):

- ``spark.read.format("vtk_mesh").option("table", "point_data").load(dir)``
- **one input partition per file** — the same per-file task parallelism
  the reference gets from Rayon (``src/rust/src/vtk/parser.rs:303``) and
  from its index-per-file sources (``domains/mesh/sources/vtk.py:74-444``);
- **filter pushdown** (`pushFilters`): equality / IN / IsNotNull
  predicates on the ``field`` column are consumed by the reader and
  applied inside the parser, so unwanted data arrays never leave the
  scan — the declarative twin of the reference's reader-level
  ``key_filters`` (``domains/mesh/sources/_key_filter.py:45-166``) and
  of DataSource V2's ``SupportsPushDownFilters`` (SURVEY §4);
- **include XOR exclude options** mirror `FieldSelectFilter` validation
  (reference ``field_select.py:140-142``);
- rows are emitted as **Arrow RecordBatches** (one per file), keeping
  the executor-side transfer vectorized.

At 100 TB scale this reader keeps working: partitions() only lists file
paths (no data on the driver), every parse happens executor-side in its
own task, and Spark schedules/retries tasks as usual.
"""

from __future__ import annotations

import glob as globmod
import os
from collections.abc import Iterator, Sequence

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    IsNotNull,
)
from pyspark.sql.types import StructType

from .vtk import parse_mesh_bytes

_TABLES = {
    "points": "mesh_id string, point_id long, x double, y double, z double",
    "cells": "mesh_id string, cell_id long, vs array<long>, ctype int",
    "point_data": "mesh_id string, point_id long, field string, value double",
    "cell_data": "mesh_id string, cell_id long, field string, value double",
    "grid": "grid_id string, iz int, iy int, ix int, field string, value double",
    "grid_meta": (
        "grid_id string, nx int, ny int, nz int, "
        "ox double, oy double, oz double, sx double, sy double, sz double"
    ),
}

_ARROW_SCHEMAS = {
    "points": pa.schema(
        [
            ("mesh_id", pa.string()),
            ("point_id", pa.int64()),
            ("x", pa.float64()),
            ("y", pa.float64()),
            ("z", pa.float64()),
        ]
    ),
    "cells": pa.schema(
        [
            ("mesh_id", pa.string()),
            ("cell_id", pa.int64()),
            ("vs", pa.list_(pa.int64())),
            ("ctype", pa.int32()),
        ]
    ),
    "point_data": pa.schema(
        [
            ("mesh_id", pa.string()),
            ("point_id", pa.int64()),
            ("field", pa.string()),
            ("value", pa.float64()),
        ]
    ),
    "cell_data": pa.schema(
        [
            ("mesh_id", pa.string()),
            ("cell_id", pa.int64()),
            ("field", pa.string()),
            ("value", pa.float64()),
        ]
    ),
    "grid": pa.schema(
        [
            ("grid_id", pa.string()),
            ("iz", pa.int32()),
            ("iy", pa.int32()),
            ("ix", pa.int32()),
            ("field", pa.string()),
            ("value", pa.float64()),
        ]
    ),
    "grid_meta": pa.schema(
        [
            ("grid_id", pa.string()),
            ("nx", pa.int32()),
            ("ny", pa.int32()),
            ("nz", pa.int32()),
            ("ox", pa.float64()),
            ("oy", pa.float64()),
            ("oz", pa.float64()),
            ("sx", pa.float64()),
            ("sy", pa.float64()),
            ("sz", pa.float64()),
        ]
    ),
}


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        super().__init__(path)


def _csv_option(options: dict, key: str) -> list[str] | None:
    raw = options.get(key)
    if raw is None or raw == "":
        return None
    return [t.strip() for t in str(raw).split(",") if t.strip()]


class VTKMeshReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vtk_mesh requires a path: .load('/dir/of/vtk')")
        self.table = str(options.get("table", "point_data"))
        if self.table not in _TABLES:
            raise ValueError(
                f"unknown table {self.table!r}; one of {sorted(_TABLES)}"
            )
        self.glob = str(options.get("glob", "*.vtk"))
        include = _csv_option(options, "include_fields")
        exclude = _csv_option(options, "exclude_fields")
        if include and exclude:
            raise ValueError(
                "include_fields and exclude_fields are mutually exclusive"
            )
        self.include = include
        self.exclude = exclude
        # narrowed further by pushFilters; None = no pushed constraint
        self.pushed_fields: set[str] | None = None

    # -- pushdown -----------------------------------------------------
    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Consume field-equality predicates; everything else stays in Spark.

        ``field = 'x'`` / ``field IN (...)`` / ``field IS NOT NULL`` are
        fully applied inside the parser (read() below), so they are NOT
        yielded back — Spark drops its post-scan Filter node for them.
        """
        if self.table not in ("point_data", "cell_data", "grid"):
            yield from filters
            return
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("field",):
                vals = {f.value}
                self.pushed_fields = (
                    vals if self.pushed_fields is None else self.pushed_fields & vals
                )
            elif isinstance(f, In) and f.attribute == ("field",):
                vals = set(f.value)
                self.pushed_fields = (
                    vals if self.pushed_fields is None else self.pushed_fields & vals
                )
            elif isinstance(f, IsNotNull) and f.attribute == ("field",):
                pass  # field is never null in emitted rows
            else:
                yield f

    def _keep(self, name: str) -> bool:
        if self.pushed_fields is not None and name not in self.pushed_fields:
            return False
        if self.include is not None:
            return name in self.include
        if self.exclude is not None:
            return name not in self.exclude
        return True

    # -- planning -----------------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        paths = sorted(globmod.glob(os.path.join(self.path, self.glob)))
        if not paths:
            raise FileNotFoundError(
                f"no files matching {self.glob!r} under {self.path}"
            )
        return [_FilePartition(p) for p in paths]

    # -- execution (runs in executor tasks) ---------------------------
    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        path = partition.value
        stem = os.path.basename(path).rsplit(".", 1)[0]
        with open(path, "rb") as f:
            mf = parse_mesh_bytes(path, f.read())
        points, cells, point_data, grid_meta = (
            mf.points,
            mf.cells,
            mf.point_data,
            mf.grid_meta,
        )

        cols: dict[str, list]
        if self.table == "points":
            cols = {
                "mesh_id": [stem] * len(points),
                "point_id": list(range(len(points))),
                "x": [p[0] for p in points],
                "y": [p[1] for p in points],
                "z": [p[2] for p in points],
            }
        elif self.table == "cells":
            cols = {
                "mesh_id": [stem] * len(cells),
                "cell_id": list(range(len(cells))),
                "vs": cells,
                "ctype": mf.cell_types,
            }
        elif self.table in ("point_data", "cell_data"):
            data = point_data if self.table == "point_data" else mf.cell_data
            id_name = "point_id" if self.table == "point_data" else "cell_id"
            ids, fields, values = [], [], []
            for name, vals in data.items():
                if not self._keep(name):
                    continue
                ids.extend(range(len(vals)))
                fields.extend([name] * len(vals))
                values.extend(vals)
            cols = {
                "mesh_id": [stem] * len(ids),
                id_name: ids,
                "field": fields,
                "value": values,
            }
        elif self.table == "grid":
            nx, ny, nz = grid_meta.get("dimensions", (0, 0, 0))
            if (nx == 0 or ny == 0) and point_data:
                # unstructured file in a table='grid' scan: flat % 0
                # would die as an opaque ZeroDivisionError in the task
                raise ValueError(
                    f"{stem}: not a structured grid (no dimensions "
                    "metadata) — table='grid' needs .vti/.vts inputs"
                )
            izs, iys, ixs, fields, values = [], [], [], [], []
            for name, vals in point_data.items():
                if not self._keep(name):
                    continue
                for flat, v in enumerate(vals):
                    ixs.append(flat % nx)
                    iys.append((flat // nx) % ny)
                    izs.append(flat // (nx * ny))
                    fields.append(name)
                    values.append(v)
            cols = {
                "grid_id": [stem] * len(values),
                "iz": izs,
                "iy": iys,
                "ix": ixs,
                "field": fields,
                "value": values,
            }
        else:  # grid_meta
            nx, ny, nz = grid_meta.get("dimensions", (0, 0, 0))
            ox, oy, oz = grid_meta.get("origin", (0.0, 0.0, 0.0))
            sx, sy, sz = grid_meta.get("spacing", (1.0, 1.0, 1.0))
            cols = {
                "grid_id": [stem],
                "nx": [nx],
                "ny": [ny],
                "nz": [nz],
                "ox": [ox],
                "oy": [oy],
                "oz": [oz],
                "sx": [sx],
                "sy": [sy],
                "sz": [sz],
            }

        schema = _ARROW_SCHEMAS[self.table]
        yield pa.RecordBatch.from_pydict(cols, schema=schema)


class VTKMeshDataSource(DataSource):
    """``spark.read.format("vtk_mesh")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "vtk_mesh"

    def schema(self) -> StructType | str:
        table = str(self.options.get("table", "point_data"))
        if table not in _TABLES:
            raise ValueError(f"unknown table {table!r}; one of {sorted(_TABLES)}")
        return _TABLES[table]

    def reader(self, schema: StructType) -> VTKMeshReader:
        return VTKMeshReader(dict(self.options))


def register(spark) -> None:
    """Idempotently register the vtk_mesh format on a session.

    Also enables `spark.sql.python.filterPushdown.enabled` (a dynamic SQL
    conf, off by default in Spark 4.1) — without it, any reader that
    implements `pushFilters` is rejected at planning time.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VTKMeshDataSource)
