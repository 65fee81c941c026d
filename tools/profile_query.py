"""Per-query runtime profiler for optimization work (not the bench).

Usage: python tools/profile_query.py q1 q2 ... [--passes N]

For each named registered query:
  - builds the DataFrame (measures Python-side plan construction),
  - executes through the noop sink ``passes`` times (min = steady state,
    same semantics as bench.py),
  - pulls the per-stage runtime of the LAST execution from the local
    Spark UI REST API and prints the top stages by duration with task
    counts — the local stand-in for the Stages tab the optimization
    guide (§1.1, §7.1) starts from.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_2_10_0_src_mapreduce_spark.plans.registry import all_queries
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("profile-query")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    qs = all_queries()

    for name in names:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        build = time.time() - t0
        ts = []
        jobs_before = None
        for i in range(passes):
            # job ids monotonically increase; remember the floor of the
            # last pass so stage attribution only covers it
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            sc.setJobDescription(f"profile:{name}:pass{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        jobs_after = [j for j in _api(base, "/jobs")
                      if j["jobId"] not in jobs_before]
        n_jobs = len(jobs_after)
        stage_ids = sorted({s for j in jobs_after for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(base, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in stages)
        total_tasks = sum(s.get("numCompleteTasks") or 0 for s in stages)
        print(f"\n=== {name}: build={build:.3f}s passes={ts} min={min(ts):.3f}s"
              f"  last-pass: {n_jobs} jobs, {len(stages)} stages, "
              f"{total_tasks} tasks, executorRunTime={total_run/1000:.2f}s")
        for s in stages[:10]:
            nm = (s.get("name") or "")[:80]
            print(f"  stage {s['stageId']:4d} run={s.get('executorRunTime',0)/1000:7.3f}s "
                  f"cpu={s.get('executorCpuTime',0)/1e9:7.3f}s "
                  f"tasks={s.get('numCompleteTasks',0):3d} "
                  f"shr={s.get('shuffleReadBytes',0)//1024:6d}K "
                  f"shw={s.get('shuffleWriteBytes',0)//1024:6d}K  {nm}")


if __name__ == "__main__":
    main()
