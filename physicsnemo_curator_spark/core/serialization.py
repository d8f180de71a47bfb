"""YAML pipeline-spec round-trip.

Parity with the reference's serializer (reference ``core/serialization
.py:57-345``): a pipeline saves to a versioned YAML document with
provenance metadata and loads back to an equivalent pipeline; the
round-trip is identity on the spec (and therefore on the spec-hash that
keys resumability).  Component resolution goes through the registry
(names), not importlib paths — the registry is the module boundary.
"""

from __future__ import annotations

import platform
from datetime import datetime, timezone
from typing import Any

import yaml

from physicsnemo_curator_spark.core.pipeline import Pipeline, Stage

SPEC_VERSION = 1


def serialize_pipeline(pipeline: Pipeline) -> dict[str, Any]:
    doc = pipeline.to_dict()
    doc["metadata"] = {
        "engine": "physicsnemo_curator_spark",
        "spec_hash": pipeline.spec_hash,
        "platform": platform.platform(),
        "created": datetime.now(timezone.utc).isoformat(),
    }
    return doc


def deserialize_pipeline(doc: dict[str, Any]) -> Pipeline:
    version = doc.get("version")
    if version != SPEC_VERSION:
        raise ValueError(f"unsupported pipeline spec version: {version!r}")
    src = doc["source"]
    transforms = tuple(
        Stage(t["name"], t.get("params", {})) for t in doc.get("transforms", [])
    )
    sink_doc = doc.get("sink")
    sink = Stage(sink_doc["name"], sink_doc.get("params", {})) if sink_doc else None
    return Pipeline(Stage(src["name"], src.get("params", {})), transforms, sink)


def save_pipeline(pipeline: Pipeline, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(serialize_pipeline(pipeline), f, sort_keys=False)


def load_pipeline(path: str) -> Pipeline:
    with open(path) as f:
        return deserialize_pipeline(yaml.safe_load(f))
