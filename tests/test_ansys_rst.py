"""AnsysRST scaffold: the dpf-independent logic (result discovery,
shape validation, ragged-connectivity normalization, MeshFile
assembly) against FAKE DPF model objects, plus the honest availability
gate.  Real ``.rst`` decode needs ansys-dpf-core + a licensed Ansys
install (reference ansys_rst.py note), so those paths gate at
collection time."""

from __future__ import annotations

import numpy as np
import pytest

from physicsnemo_curator_spark.sources import ansys_rst


class _Field:
    def __init__(self, data):
        self.data = np.asarray(data)


class _Op:
    def __init__(self, fields):
        self.outputs = self

    def fields_container(self):
        return self._fc

    def __call__(self):
        return self


class _Results:
    """Mimics dpf Model.results: attribute access per result name,
    call -> operator -> outputs.fields_container() -> [fields]."""

    def __init__(self, fields_by_name):
        self._fields = fields_by_name

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in self._fields:
            raise AttributeError(name)  # dpf raises on missing results
        op = _Op([])
        op._fc = [_Field(self._fields[name])]
        return lambda: op


class _Node:
    def __init__(self, nid):
        self.id = nid


class _Nodes:
    def __init__(self, ids, coords):
        self.n_nodes = len(ids)
        self._ids = ids
        self.coordinates_field = _Field(np.asarray(coords, dtype=float))

    def node_by_index(self, i):
        return _Node(self._ids[i])


class _Element:
    def __init__(self, node_ids):
        self.node_ids = node_ids


class _Elements:
    def __init__(self, conn):
        self.n_elements = len(conn)
        self._conn = conn

    def element_by_index(self, i):
        return _Element(self._conn[i])


class _Region:
    def __init__(self, ids, coords, conn):
        self.nodes = _Nodes(ids, coords)
        self.elements = _Elements(conn)


class _Meta:
    def __init__(self, region):
        self.meshed_region = region


class _Model:
    def __init__(self, region, fields):
        self.metadata = _Meta(region)
        self.results = _Results(fields)


def _fake_model():
    # 4 nodes with NON-CONTIGUOUS ids (remap matters), 2 ragged elements
    ids = [10, 20, 30, 99]
    coords = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 1)]
    conn = [[10, 20, 30], [20, 30, 99, 10]]
    fields = {
        "temperature": [300.0, 301.0, 302.0, 303.0],          # nodal ok
        "displacement": [[1, 2, 3]] * 4,                       # nodal (N,3)
        "stress": [5.0, 6.0],                                  # elemental ok
        "velocity": [1.0, 2.0],                                # WRONG shape
    }
    return _Model(_Region(ids, coords, conn), fields)


def test_discovery_probes_known_types():
    got = ansys_rst.discover_available_results(_fake_model())
    assert got == ["displacement", "stress", "temperature", "velocity"]


def test_extract_result_field_and_missing():
    data, loc = ansys_rst.extract_result_field(_fake_model(), "stress")
    assert loc == "elemental" and data.tolist() == [5.0, 6.0]
    assert ansys_rst.extract_result_field(_fake_model(), "heat_flux") is None


def test_connectivity_pads_and_remaps_zero_based():
    conn = ansys_rst.extract_connectivity(
        _fake_model().metadata.meshed_region
    )
    assert conn.tolist() == [[0, 1, 2, -1], [1, 2, 3, 0]]


def test_model_to_meshfile_validates_shapes():
    mf = ansys_rst.model_to_meshfile(_fake_model())
    assert len(mf.points) == 4 and mf.points[3] == (1.0, 1.0, 1.0)
    # padding stripped back to ragged cells
    assert mf.cells == [[0, 1, 2], [1, 2, 3, 0]]
    assert mf.point_data["temperature"] == [300.0, 301.0, 302.0, 303.0]
    # multi-component nodal field expands per component
    assert mf.point_data["displacement_2"] == [3.0, 3.0, 3.0, 3.0]
    assert mf.cell_data["stress"] == [5.0, 6.0]
    # velocity is nodal but has 2 values for 4 nodes -> skipped loudly
    assert "velocity" not in mf.point_data


def test_result_types_subset_respected():
    mf = ansys_rst.model_to_meshfile(_fake_model(), ["stress"])
    assert mf.point_data == {} and list(mf.cell_data) == ["stress"]


@pytest.mark.skipif(
    ansys_rst.HAS_DPF, reason="ansys-dpf-core present: gate not applicable"
)
def test_read_ansys_rst_gates_loudly_without_dpf(spark):
    with pytest.raises(RuntimeError, match="ansys-dpf-core"):
        ansys_rst.read_ansys_rst(spark, "/nonexistent")
