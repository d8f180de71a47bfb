"""Pipeline builder / serialization / resume semantics.

Mirrors the reference's test strategy (SURVEY §5): serialization
round-trip (reference test_serialization.py), checkpoint/resume
(test_checkpoint.py: completed skipped, failed retried, fresh run by
default).
"""

from __future__ import annotations

import os

import pytest

from physicsnemo_curator_spark.core import components  # noqa: F401  (registers ops)
from physicsnemo_curator_spark.core.manifest import Manifest
from physicsnemo_curator_spark.core.pipeline import Pipeline
from physicsnemo_curator_spark.core.registry import UnknownComponentError, registered


def _lineitem_pipeline(sf_dir: str, out: str) -> Pipeline:
    return (
        Pipeline.read("parquet", path=os.path.join(sf_dir, "lineitem.parquet"))
        .transform("filter", condition="l_quantity > 10")
        .transform(
            "moment_stats", group_cols=["l_returnflag"], value_col="l_quantity"
        )
        .write("parquet", path=out)
    )


def test_builder_is_immutable(sf_dir, tmp_path):
    p1 = Pipeline.read("parquet", path="x")
    p2 = p1.transform("filter", condition="a > 1")
    p3 = p2.write("parquet", path="y")
    assert p1.transforms == () and p1.sink is None
    assert len(p2.transforms) == 1 and p2.sink is None
    assert p3.sink is not None
    assert p1.spec_hash != p2.spec_hash != p3.spec_hash


def test_run_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "stats_out")
    res = _lineitem_pipeline(sf_dir, out).run(spark)
    assert res.rows == 3  # returnflags A/N/R
    assert res.written == [out]
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert "mean" in back.columns


def test_yaml_round_trip(sf_dir, tmp_path):
    p = _lineitem_pipeline(sf_dir, str(tmp_path / "o"))
    spec_path = str(tmp_path / "pipe.yaml")
    p.save(spec_path)
    loaded = Pipeline.load(spec_path)
    assert loaded == p
    assert loaded.spec_hash == p.spec_hash


def test_unknown_component_raises(spark):
    with pytest.raises(UnknownComponentError):
        Pipeline.read("no_such_format", path="x").build(spark)
    assert "parquet" in registered()["sources"]


def test_resume_skips_completed_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "by_flag")
    mdir = str(tmp_path / "manifests")
    p = (
        Pipeline.read("parquet", path=os.path.join(sf_dir, "lineitem.parquet"))
        .transform("select", columns=["l_returnflag", "l_quantity"])
        .write("parquet", path=out, mode="append", partition_by=["l_returnflag"])
    )
    r1 = p.run(spark, resume=True, partition_col="l_returnflag", manifest_dir=mdir)
    assert r1.rows > 0 and r1.skipped_partitions == []

    # second run: everything already recorded → nothing written
    r2 = p.run(spark, resume=True, partition_col="l_returnflag", manifest_dir=mdir)
    assert r2.rows == 0
    assert sorted(r2.skipped_partitions) == ["A", "N", "R"]

    # failed/unrecorded partition retries: drop one mark, rerun
    m = Manifest(mdir, p.spec_hash)
    m.reset()
    m.mark_completed(["A", "N"])
    r3 = p.run(spark, resume=True, partition_col="l_returnflag", manifest_dir=mdir)
    assert sorted(r3.skipped_partitions) == ["A", "N"]
    assert r3.rows > 0  # the R partition re-ran

    # resume=False is a fresh run (reference default), no skipping
    r4 = p.run(spark)
    assert r4.skipped_partitions == []


def test_resumable_stats_two_run_workflow(spark, sf_dir, tmp_path):
    """The reference's core resumable-stats loop (persisted Welford state
    merged across runs, reference stats.py:96-102 + merge at 729-836):
    run 1 aggregates part of the data to power-sum state and persists
    it; run 2 aggregates the remainder, merges with the stored state,
    finalizes — result must equal a single-pass aggregation."""
    import os

    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.operators import stats

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    first = li.filter("l_orderkey % 2 = 0")
    second = li.filter("l_orderkey % 2 = 1")
    state_path = str(tmp_path / "welford_state")

    # run 1: partial state persisted
    stats.welford_state(first, ["l_returnflag"], "l_quantity").write.parquet(state_path)

    # run 2: new data + stored state -> merged, finalized
    stored = spark.read.parquet(state_path)
    fresh = stats.welford_state(second, ["l_returnflag"], "l_quantity")
    merged = stats.finalize_welford_state(
        stats.merge_welford_state(stored, fresh, ["l_returnflag"]), ["l_returnflag"]
    )
    direct = stats.finalize_welford_state(
        stats.welford_state(li, ["l_returnflag"], "l_quantity"), ["l_returnflag"]
    )
    m = {r["l_returnflag"]: r for r in merged.collect()}
    d = {r["l_returnflag"]: r for r in direct.collect()}
    assert set(m) == set(d)
    for k in d:
        assert m[k]["n"] == d[k]["n"]
        assert abs(m[k]["mean"] - d[k]["mean"]) < 1e-9
        assert abs(m[k]["var_pop_v"] - d[k]["var_pop_v"]) < 1e-7
        assert abs(m[k]["kurt_v"] - d[k]["kurt_v"]) < 1e-7


def test_different_spec_hash_isolated_manifests(spark, sf_dir, tmp_path):
    mdir = str(tmp_path / "m")
    p1 = _lineitem_pipeline(sf_dir, str(tmp_path / "o1"))
    p2 = p1.transform("filter", condition="l_quantity < 40").write(
        "parquet", path=str(tmp_path / "o2")
    )
    assert p1.spec_hash != p2.spec_hash
    Manifest(mdir, p1.spec_hash).mark_completed(["A"])
    assert Manifest(mdir, p2.spec_hash).completed() == set()


def test_curation_transforms_registered(spark, sf_dir, tmp_path):
    """The r05 curation operators are available as declarative pipeline
    transforms and survive the YAML round-trip."""
    from physicsnemo_curator_spark.core import components  # noqa: F401
    from physicsnemo_curator_spark.core.pipeline import Pipeline

    p = (
        Pipeline.read("parquet", path=f"{sf_dir}/documents.parquet")
        .transform("redact_pii")
        .transform("hash_sample", key_col="doc_id", rate=0.5)
        .transform(
            "assign_splits",
            key_col="doc_id",
            weights={"train": 0.9, "val": 0.1},
        )
        .transform("chunk_documents", max_tokens=32, overlap=4)
    )
    n = p.build(spark).count()
    assert n > 0
    y = str(tmp_path / "p.yaml")
    p.save(y)
    assert Pipeline.load(y).build(spark).count() == n


def test_resume_rejects_overwrite_sink(spark, tmp_path):
    """resume=True with a whole-path overwrite sink would delete
    completed partitions' output — must refuse loudly."""
    import pytest as _pt

    from physicsnemo_curator_spark.core.pipeline import Pipeline

    src = str(tmp_path / "src")
    spark.range(10).selectExpr("id", "id % 2 AS p").write.parquet(src)
    p = (
        Pipeline.read("parquet", path=src)
        .write("parquet", path=str(tmp_path / "out"))
    )
    with _pt.raises(ValueError, match="overwrite sink"):
        p.run(
            spark,
            resume=True,
            partition_col="p",
            manifest_dir=str(tmp_path / "m"),
        )


def test_resume_null_partitions_and_date_values(spark, tmp_path):
    """NULL partition values must survive resume filtering (three-
    valued NOT-IN used to drop them), and date-typed partitions must
    mark without a JSON crash and be skipped on re-run."""
    from pyspark.sql import functions as F

    from physicsnemo_curator_spark.core.pipeline import Pipeline

    src = str(tmp_path / "src")
    spark.sql(
        "SELECT * FROM VALUES (1, DATE'2024-01-01'), (2, DATE'2024-01-02'),"
        " (3, CAST(NULL AS DATE)) AS t(id, day)"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    mdir = str(tmp_path / "m")
    p = (
        Pipeline.read("parquet", path=src)
        .write("parquet", path=out, mode="append")
    )
    r1 = p.run(spark, resume=True, partition_col="day", manifest_dir=mdir)
    assert r1.rows == 3  # NULL-day row processed, dates marked w/o crash
    r2 = p.run(spark, resume=True, partition_col="day", manifest_dir=mdir)
    assert r2.rows == 0  # everything (incl. the NULL partition) skipped
    total = spark.read.parquet(out).count()
    assert total == 3  # nothing duplicated, nothing deleted


def test_metrics_fresh_store_and_retention(spark, tmp_path):
    """runs()/summary() on a fresh store return empty frames, and the
    warehouse retention keeps all three metrics tables."""
    from physicsnemo_curator_spark.core.metrics import MetricsStore
    from physicsnemo_curator_spark.core.warehouse import (
        list_artifacts,
        remove_older_than,
    )

    w = str(tmp_path / "wh")
    store = MetricsStore(w)
    assert store.runs(spark).count() == 0
    assert store.summary(spark).count() == 0
    from physicsnemo_curator_spark.core.pipeline import RunResult

    rid = store.record(
        spark, RunResult("abc", [], 5, [], 0.1)
    )
    store.record_index_results(
        spark, rid, [{"idx": 1, "status": "failed", "error": "boom"}]
    )
    store.record_index_results(spark, rid, [{"idx": 1, "status": "completed"}])
    # deterministic latest-wins even within the same epoch second
    (row,) = store.index_df(spark, rid).collect()
    assert row["status"] == "completed"
    kinds = {a.path.split("/")[-1]: a.kind for a in list_artifacts(w)}
    assert kinds["pipeline_runs"] == "metrics"
    assert kinds["index_results"] == "metrics"
    removed = remove_older_than(w, max_age_seconds=0.0)
    assert not any("results" in r or "pipeline_runs" in r for r in removed)


def test_resume_partition_cardinality_guard(spark, tmp_path, monkeypatch):
    """Resume tracking collects distinct partition values to the
    driver; a high-cardinality partition column must fail LOUDLY
    (bounded limit(cap+1) probe) instead of OOMing the driver."""
    import pytest

    from physicsnemo_curator_spark.core.pipeline import Pipeline

    src = str(tmp_path / "src")
    spark.range(50).selectExpr(
        "id", "CAST(id AS STRING) AS doc_id"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    mdir = str(tmp_path / "m")
    p = (
        Pipeline.read("parquet", path=src)
        .write("parquet", path=out, mode="append")
    )
    monkeypatch.setenv("SPARK_GRAFT_RESUME_PARTITION_CAP", "10")
    with pytest.raises(ValueError, match="distinct values"):
        p.run(spark, resume=True, partition_col="doc_id", manifest_dir=mdir)
    # under the cap it proceeds normally
    monkeypatch.setenv("SPARK_GRAFT_RESUME_PARTITION_CAP", "100")
    r = p.run(spark, resume=True, partition_col="doc_id", manifest_dir=mdir)
    assert r.rows == 50


def test_wizard_scripted_flow(spark, tmp_path):
    """The wizard reproduces the reference's screen flow (source →
    params → transforms → sink → YAML) over injected prompts: bad
    entries re-prompt instead of raising, values coerce through
    yaml.safe_load exactly like the spec loader, and the emitted
    pipeline round-trips through save/load with the same spec hash."""
    import os

    from physicsnemo_curator_spark.core import wizard
    from physicsnemo_curator_spark.core.serialization import load_pipeline

    src = str(tmp_path / "in")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(src)
    out = str(tmp_path / "out")
    answers = iter(
        [
            "nope",                      # unknown source -> re-prompt
            "parquet",
            f"path={src}",
            "",                          # end source params
            "filter",
            "condition=id >= 3",
            "",
            "select",
            "columns=[id, v]",           # yaml list coercion
            "",
            "",                          # stop transforms
            "parquet",
            f"path={out}",
            "",
        ]
    )
    shown: list[str] = []
    pipeline = wizard.run_wizard(
        input_fn=lambda _p: next(answers), print_fn=shown.append
    )
    assert pipeline.transforms[1].params["columns"] == ["id", "v"]
    assert any("unknown source" in s for s in shown)
    # signature hints reached the screen (the reference shows Params)
    assert any("params:" in s for s in shown)
    result = pipeline.run(spark)
    assert result.rows == 7
    assert spark.read.parquet(out).count() == 7
    # spec round-trip: what the wizard built is what the loader reads
    spec_path = str(tmp_path / "spec.yaml")
    from physicsnemo_curator_spark.core.serialization import save_pipeline

    save_pipeline(pipeline, spec_path)
    assert load_pipeline(spec_path).spec_hash == pipeline.spec_hash
    assert os.path.exists(out)


def test_wizard_component_hint_skips_frame_param():
    from physicsnemo_curator_spark.core import wizard

    hint = wizard.component_hint("source", "csv")
    assert "spark" not in hint and "path" in hint
    hint_t = wizard.component_hint("transform", "select")
    assert "df" not in hint_t and "columns" in hint_t


def test_wizard_main_cli_tail_scriptable(spark, tmp_path):
    """main()'s save-path and run-now prompts flow through the SAME
    input_fn/print_fn injection as run_wizard — the whole command is
    scriptable without monkeypatching builtins (r11 advice)."""
    from physicsnemo_curator_spark.core import wizard
    from physicsnemo_curator_spark.core.serialization import load_pipeline

    src = str(tmp_path / "in")
    spark.range(4).write.parquet(src)
    spec_path = str(tmp_path / "wiz_spec.yaml")
    answers = iter(
        [
            "parquet",
            f"path={src}",
            "",          # end source params
            "",          # stop transforms
            "",          # no sink
            spec_path,   # save spec to
            "n",         # run now?
        ]
    )
    shown: list[str] = []
    wizard.main(
        argv=[], input_fn=lambda _p: next(answers), print_fn=shown.append
    )
    assert any(f"wrote {spec_path}" in s for s in shown)
    assert load_pipeline(spec_path).source.name == "parquet"
