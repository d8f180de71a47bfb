"""Engine core: pipeline builder, component registry, YAML spec
round-trip, resumable manifest, run metrics."""

from physicsnemo_curator_spark.core.pipeline import Pipeline, RunResult
from physicsnemo_curator_spark.core.registry import (
    get_sink,
    get_source,
    get_transform,
    register_sink,
    register_source,
    register_transform,
)

__all__ = [
    "Pipeline",
    "RunResult",
    "register_source",
    "register_transform",
    "register_sink",
    "get_source",
    "get_transform",
    "get_sink",
]
