"""Per-query scaling report across two scale factors (the r6 sf1 gate).

Runs bench.py's measurement loop (same noop-sink, warm steady-state,
min-of-N semantics) at two sf dirs and prints a per-query table of
  t(sf_a), t(sf_b), ratio, bytes ratio, verdict
where verdict flags any query whose wall-time ratio exceeds the input
BYTES ratio by `slack` (default 1.5x) — i.e. super-linear growth in
bytes, the thing a 100 TB deployment cannot tolerate. Overhead-bound
queries (t < floor at both sfs) are exempt: their ratio is stage
overhead, not data cost.

Usage: python tools/scaling_report.py [sf_a_dir] [sf_b_dir] [query ...]
                                      [--json out]
Defaults: /root/testdata/sf0.1 /root/repo/fixtures/sf1, all queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR_SEC = 1.0   # below this at both sfs the query is overhead-bound
SLACK = 1.5       # wall ratio may exceed bytes ratio by this factor


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def _time_all(spark, qs, sf_dir: str, passes: int = 3) -> dict[str, float]:
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name, fn in qs.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = round(time.time() - t0, 3)
            if name not in timings or el < timings[name]:
                timings[name] = el
    return timings


def main() -> int:
    argv = sys.argv[1:]
    out_json = None
    if "--json" in argv:
        i = argv.index("--json")
        out_json = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    sf_a = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    sf_b = args[1] if len(args) > 1 else "/root/repo/fixtures/sf1"

    from hadoop_2_10_0_src_mapreduce_spark.plans.registry import all_queries
    from hadoop_2_10_0_src_mapreduce_spark.session import get_spark

    spark = get_spark("scaling-report")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    only = set(args[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {n: f for n, f in qs.items() if n in only}

    bytes_a, bytes_b = _dir_bytes(sf_a), _dir_bytes(sf_b)
    bytes_ratio = bytes_b / bytes_a

    # warm both sf dirs once (JVM/codegen/python-worker spin-up)
    warm = qs.get("flagship_pricing_join") or next(iter(qs.values()))
    for d in (sf_a, sf_b):
        warm(spark, d).write.format("noop").mode("overwrite").save()

    t_a = _time_all(spark, qs, sf_a)
    t_b = _time_all(spark, qs, sf_b)

    rows = []
    for name in qs:
        ra, rb = t_a[name], t_b[name]
        ratio = rb / ra if ra > 0 else float("inf")
        if ra < FLOOR_SEC and rb < FLOOR_SEC:
            verdict = "overhead"
        elif ratio <= 1.2:
            verdict = "flat"
        elif ratio <= bytes_ratio * SLACK:
            verdict = "≤linear"
        else:
            verdict = "SUPER-LINEAR"
        rows.append((name, ra, rb, ratio, verdict))

    rows.sort(key=lambda r: -r[3])
    print(f"bytes: {bytes_a/1e6:.1f} MB -> {bytes_b/1e6:.1f} MB "
          f"(ratio {bytes_ratio:.2f}); wall gate = {bytes_ratio * SLACK:.1f}x")
    print(f"{'query':32s} {'t_a':>7s} {'t_b':>7s} {'ratio':>7s}  verdict")
    for name, ra, rb, ratio, verdict in rows:
        print(f"{name:32s} {ra:7.3f} {rb:7.3f} {ratio:7.2f}  {verdict}")
    tot_a, tot_b = sum(t_a.values()), sum(t_b.values())
    print(f"{'TOTAL':32s} {tot_a:7.2f} {tot_b:7.2f} {tot_b/tot_a:7.2f}")
    bad = [r for r in rows if r[4] == "SUPER-LINEAR"]
    print(f"super-linear: {len(bad)}" + (f" -> {[r[0] for r in bad]}" if bad else ""))

    if out_json:
        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_a": sf_a, "sf_b": sf_b,
                    "bytes_ratio": round(bytes_ratio, 3),
                    "t_a": t_a, "t_b": t_b,
                    "total_a": round(tot_a, 3), "total_b": round(tot_b, 3),
                    "super_linear": [r[0] for r in bad],
                },
                f, indent=1,
            )
        print(f"wrote {out_json}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
