"""Time individual registry slots with the bench's exact methodology
(noop sink, min-of-N, warmup) without paying for the full 327-slot
sweep. Usage:

    python tools/slot_time.py [-n RUNS] [--sf DIR] [--explain OUTDIR] q1 q2 ...

Prints one line per slot: min / median / max over N runs, plus the
first-run (cold) time. With --explain, writes <slot>.txt containing
df.explain("formatted") for each slot (the plans/r11 evidence files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spec_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("slots", nargs="+")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="dir to write explain('formatted') per slot")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--json", default=None, help="write results dict to this path")
    args = ap.parse_args()

    from spec_search_spark.operators import all_queries

    qs, _ = all_queries()
    spark = get_spark("slot_time")
    jvm = spark._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    if not args.no_warmup:
        for w in ("q1_pricing_summary", "knn_exact", "token_stats"):
            qs[w](spark, args.sf).write.format("noop").mode("overwrite").save()

    results = {}
    for name in args.slots:
        if name not in qs:
            print(f"!! unknown slot: {name}")
            continue
        spark.sparkContext.setJobDescription(f"slot:{name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        samples = []
        for _ in range(args.n):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        s = sorted(samples)
        results[name] = {
            "min": round(s[0], 3),
            "med": round(s[len(s) // 2], 3),
            "max": round(s[-1], 3),
            "cold": round(samples[0], 3),
            "n": args.n,
        }
        print(
            f"{name:40s} min={s[0]:7.3f} med={s[len(s)//2]:7.3f} "
            f"max={s[-1]:7.3f} cold={samples[0]:7.3f}"
        )
        spark.sparkContext.setJobDescription(None)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
