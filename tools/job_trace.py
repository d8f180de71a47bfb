#!/usr/bin/env python
"""Per-job trace for a declared query: run it warm and print every
Spark job the warm rep submits (job id, # stages, first stage name =
call site).  Job counts are deterministic, so this works on a
contended box where wall-clock A/Bs do not.

Usage: python tools/job_trace.py q_name [q_name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from physicsnemo_curator_spark.plans.queries import QUERIES
from physicsnemo_curator_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = max(8, min(cpus, int(64 * sf))) if sf > 0 else cpus
    spark = get_spark(
        app_name="pcs-jobtrace",
        shuffle_partitions=shuffle,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from physicsnemo_curator_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    for name in names:
        spec = QUERIES[name]
        fn = spec.bench or spec.spark
        fn(spark, sf_dir).collect()  # cold rep (fills fixture/session caches)
        st = sc.statusTracker()
        before = set(st.getJobIdsForGroup(None))
        fn(spark, sf_dir).collect()  # warm rep — the one we trace
        after = [j for j in st.getJobIdsForGroup(None) if j not in before]
        print(f"== {name}: {len(after)} warm jobs ==")
        for jid in sorted(after):
            ji = jsc.statusTracker().getJobInfo(jid)
            if ji.isEmpty():
                print(f"  job {jid}: <gone>")
                continue
            info = ji.get()
            sids = list(info.stageIds())
            # first stage's name carries the call site of the action
            label = ""
            for sid in sids:
                si = jsc.statusTracker().getStageInfo(sid)
                if not si.isEmpty():
                    label = si.get().name()
                    break
            print(f"  job {jid}: {len(sids)} stages  {label}")
    spark.stop()


if __name__ == "__main__":
    main()
