"""Minimal LS-DYNA d3plot binary reader → normalized long tables.

Parity target: the arrays the reference extracts via lasso-python
(reference ``domains/mesh/sources/d3plot.py:496-508`` —
``node_displacement`` (T, N, 3), ``element_shell_node_indexes`` (E, 4),
``element_shell_part_indexes`` (E,)).  The walker below implements the
subset of the public "LS-DYNA Database Binary Output Files" layout
those arrays need, in pure Python/numpy (lasso is absent in this
container):

- 64-word control block after the 10-word title (NDIM, NUMNP, NGLBV,
  IT/IU/IV/IA flags, NEL8/NEL4/NEL2 counts, NV3D/NV2D/NV1D widths);
- geometry: initial node coords, solid (8+1), beam (2+4), and shell
  (4+1) connectivity with 1-based node ids and material/part slot;
- state blocks: time word, NGLBV globals, optional temperature /
  current-coordinate / velocity / acceleration vectors, per-element
  result words, terminated by the -999999.0 EOF marker.

Single-precision, single-family files (the fixture writer emits the
same).  Double precision and multi-family continuation files raise a
clear error instead of mis-parsing.

Spark layout matches the VTK sources: binaryFile scan (task per run
file) + Arrow ``mapInPandas`` into nodes/shells/states tables; the
derived physics (von Mises from Voigt, thickness scatter-mean,
timestep stacking) already operates on these tables
(``functions/math.py``, ``operators/mesh.py``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EOF_MARKER = -999999.0

NODES_SCHEMA = "mesh_id string, node_id long, x double, y double, z double"
SHELLS_SCHEMA = "mesh_id string, elem_id long, vs array<long>, part_id int"
STATES_SCHEMA = (
    "mesh_id string, state_id int, time double, node_id long, "
    "x double, y double, z double"
)


class D3Plot(NamedTuple):
    coords: np.ndarray  # (numnp, 3) initial coordinates
    shells: np.ndarray  # (nel4, 4) 0-based node indexes
    shell_parts: np.ndarray  # (nel4,) material/part slot
    times: np.ndarray  # (nstates,)
    node_positions: np.ndarray | None  # (nstates, numnp, 3) when IU=1


def parse_d3plot(data: bytes) -> D3Plot:
    """Walk one single-precision d3plot family root file."""
    if len(data) % 4 != 0:
        raise ValueError("d3plot byte length not word-aligned")
    words_i = np.frombuffer(data, dtype="<i4")
    words_f = np.frombuffer(data, dtype="<f4")
    n_words = len(words_i)
    if n_words < 74:
        raise ValueError("file shorter than title + control block")

    c = words_i[10:74]  # control block (word offsets per public manual)
    ndim_raw = int(c[5])
    numnp = int(c[6])
    nglbv = int(c[8])
    it, iu, iv, ia = (int(c[k]) for k in (9, 10, 11, 12))
    nel8, nv3d = int(c[13]), int(c[17])
    nel2, nv1d = int(c[18]), int(c[20])
    nel4, nv2d = int(c[21]), int(c[23])
    maxint = int(c[26])
    nmsph, nelt = int(c[27]), int(c[30])
    narbs = int(c[29])
    # features that shift geometry/state offsets: raise instead of
    # silently mis-parsing (the module contract) — thick shells add
    # nelt*9 geometry words + nelt*nv3dt state words, SPH adds its own
    # element block, IT>=2 stores multiple thermal words per node, and
    # MAXINT<0 appends the MDLOPT deletion table to every state
    if nelt > 0:
        raise NotImplementedError(f"thick shells unsupported (NELT={nelt})")
    if nmsph > 0:
        raise NotImplementedError(f"SPH unsupported (NMSPH={nmsph})")
    if it not in (0, 1):
        raise NotImplementedError(f"IT={it} thermal layout unsupported")
    if maxint < 0:
        raise NotImplementedError(
            f"MAXINT={maxint}: MDLOPT deletion table unsupported"
        )
    if ndim_raw in (5, 7):
        raise ValueError("MATTYP/connectivity-packed d3plot not supported")
    ndim = 3 if ndim_raw == 4 else ndim_raw
    if ndim != 3:
        raise ValueError(f"only 3-D models supported (NDIM={ndim_raw})")
    if numnp <= 0 or numnp > n_words:
        raise ValueError(
            "implausible NUMNP — double-precision or foreign layout?"
        )

    pos = 74
    coords = words_f[pos : pos + numnp * 3].astype(np.float64).reshape(numnp, 3)
    pos += numnp * 3
    pos += nel8 * 9  # solids: 8 nodes + material
    pos += nel2 * 6  # beams: 2 nodes + orientation + material
    ix4 = words_i[pos : pos + nel4 * 5].reshape(nel4, 5)
    pos += nel4 * 5
    pos += narbs  # arbitrary-numbering block (fixtures write none)
    shells = (ix4[:, :4].astype(np.int64) - 1)  # 1-based on disk
    shell_parts = ix4[:, 4].astype(np.int64)

    state_words = (
        1
        + nglbv
        + (numnp if it else 0)
        + (iu + iv + ia) * numnp * 3
        + nel8 * nv3d
        + nel2 * nv1d
        + nel4 * nv2d
    )
    times: list[float] = []
    positions: list[np.ndarray] = []
    while pos + state_words <= n_words:
        t = float(words_f[pos])
        if t == _EOF_MARKER:
            break
        times.append(t)
        p = pos + 1 + nglbv + (numnp if it else 0)
        if iu:
            positions.append(
                words_f[p : p + numnp * 3].astype(np.float64).reshape(numnp, 3)
            )
        pos += state_words
    node_positions = np.stack(positions) if positions else None
    return D3Plot(coords, shells, shell_parts, np.asarray(times), node_positions)


def read_d3plot(spark: SparkSession, path: str, *, glob: str = "d3plot*") -> dict[str, DataFrame]:
    """Read a directory of d3plot runs into nodes/shells/states tables
    (binaryFile task-per-file scan, Arrow-batched parse — the same
    layout as read_vtk).  mesh_id = file stem.

    Family continuation files (``d3plot01``, ``d3plot02``, ...) are
    headerless state blocks — feeding them to the control-block parser
    failed every run directory using family output, so digit-suffixed
    names are excluded from the scan.  Continuation-file state data is
    an honest gap (states past the root file's capacity are not
    read)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        # exclude family continuations (root name + digits): they are
        # headerless state data, not parseable roots.  Also exclude
        # editor/writer temp residue (*.tmp): the extensionless
        # "d3plot*" glob is the one scan pattern in the repo a torn
        # atomic-write temp file can match, and a crashed writer's
        # residue must not poison every later scan of the directory
        .filter(
            ~F.col("path").rlike("d3plot[0-9]+$")
            & ~F.col("path").endswith(".tmp")
        )
        .select("path", "content")
    )

    def _mesh_id(p: str) -> str:
        return p.rsplit("/", 1)[-1]

    def parse_nodes(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                d = parse_d3plot(bytes(content))
                for nid, (x, y, z) in enumerate(d.coords):
                    out.append((_mesh_id(p), nid, x, y, z))
            yield pd.DataFrame(out, columns=["mesh_id", "node_id", "x", "y", "z"])

    def parse_shells(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                d = parse_d3plot(bytes(content))
                for eid, (vs, part) in enumerate(zip(d.shells, d.shell_parts)):
                    out.append((_mesh_id(p), eid, [int(v) for v in vs], int(part)))
            yield pd.DataFrame(out, columns=["mesh_id", "elem_id", "vs", "part_id"])

    def parse_states(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                d = parse_d3plot(bytes(content))
                if d.node_positions is None:
                    continue
                for sid, (t, frame) in enumerate(zip(d.times, d.node_positions)):
                    for nid, (x, y, z) in enumerate(frame):
                        out.append((_mesh_id(p), sid, float(t), nid, x, y, z))
            yield pd.DataFrame(
                out,
                columns=["mesh_id", "state_id", "time", "node_id", "x", "y", "z"],
            )

    return {
        "nodes": raw.mapInPandas(parse_nodes, NODES_SCHEMA),
        "shells": raw.mapInPandas(parse_shells, SHELLS_SCHEMA),
        "states": raw.mapInPandas(parse_states, STATES_SCHEMA),
    }


def parse_k_file(text: str) -> dict[int, float]:
    """LS-DYNA ``.k`` keyword file → {part_id: shell thickness}.

    The reference derives per-node thickness from this mapping
    (``domains/mesh/sources/d3plot.py:_parse_k_file`` +
    ``compute_node_thickness``): ``*PART`` card 2 links pid → secid,
    ``*SECTION_SHELL`` cards give secid → T1.  Comment lines start
    with ``$``; keywords are case-insensitive; fixed/free format both
    tokenize on whitespace/commas here (free-format files are
    comma-separated, fixed-format columns still split on runs of
    spaces for the numeric cards we need)."""
    part_to_sec: dict[int, int] = {}
    sec_to_t: dict[int, float] = {}
    lines = [
        ln for ln in text.splitlines() if ln.strip() and not ln.startswith("$")
    ]
    i = 0

    def toks(ln: str) -> list[str]:
        return ln.replace(",", " ").split()

    while i < len(lines):
        kw = lines[i].strip().upper()
        if kw.startswith("*PART"):
            # card 1 = title, card 2 = pid secid ...
            if i + 2 < len(lines):
                t = toks(lines[i + 2])
                if len(t) >= 2:
                    part_to_sec[int(float(t[0]))] = int(float(t[1]))
            i += 3
        elif kw.startswith("*SECTION_SHELL"):
            # card 1 = secid elform ..., card 2 = t1 t2 t3 t4; the
            # _TITLE keyword variant inserts a title card first
            off = 1 if "_TITLE" in kw else 0
            if i + 2 + off < len(lines):
                c1 = toks(lines[i + 1 + off])
                c2 = toks(lines[i + 2 + off])
                if c1 and c2:
                    sec_to_t[int(float(c1[0]))] = float(c2[0])
            i += 3 + off
        else:
            i += 1
    return {
        pid: sec_to_t[sec] for pid, sec in part_to_sec.items() if sec in sec_to_t
    }


def write_d3plot(
    coords: np.ndarray,
    shells: np.ndarray,
    shell_parts: np.ndarray,
    states: list[tuple[float, np.ndarray]],
    path: str,
    *,
    title: str = "pcs fixture",
) -> None:
    """Emit one minimal single-precision d3plot file (shell-only model,
    IU=1 current coordinates per state) — the test fixture / sink
    kernel twin of :func:`parse_d3plot`."""
    coords = np.asarray(coords, dtype="<f4").reshape(-1, 3)
    shells = np.asarray(shells, dtype="<i4").reshape(-1, 4)
    shell_parts = np.asarray(shell_parts, dtype="<i4").reshape(-1)
    numnp, nel4 = len(coords), len(shells)

    control = np.zeros(64, dtype="<i4")
    control[5] = 4  # NDIM (4 ≙ 3-D, unpacked connectivity)
    control[6] = numnp
    control[8] = 0  # NGLBV
    control[10] = 1  # IU: current coordinates present per state
    control[21] = nel4
    control[23] = 0  # NV2D

    parts: list[bytes] = []
    parts.append(title.ljust(40)[:40].encode("ascii"))
    parts.append(control.tobytes())
    parts.append(coords.tobytes())
    ix4 = np.concatenate([shells + 1, shell_parts[:, None]], axis=1).astype("<i4")
    parts.append(ix4.tobytes())
    for t, pos_arr in states:
        parts.append(np.asarray([t], dtype="<f4").tobytes())
        parts.append(np.asarray(pos_arr, dtype="<f4").reshape(numnp, 3).tobytes())
    parts.append(np.asarray([_EOF_MARKER], dtype="<f4").tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(parts))
