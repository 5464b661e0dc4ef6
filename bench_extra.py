"""Per-query isolation bench + plan capture (guide §1.4/§7.2).

NOT the frozen driver bench (bench.py) — this harness exists so each
optimization round can (a) time single queries with repeats without
paying the full 69-query run, (b) capture `.explain("formatted")`
before/after into plans/r*/ for the judge, and (c) time with a noop
sink instead of count() when column pruning would hide the work.

Usage:
  python bench_extra.py [--tag before|after] [--plans-dir plans/r07]
                        [--repeats 3] [--noop] [--explain-only]
                        query [query ...]

Timing methodology matches bench.py: one untimed warmup build+action,
then timed build+action (repeats, report all + min). `--noop` uses
df.write.format("noop") which computes every column (guide §1.4);
default is .count() — the action the frozen bench times.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None, help="write plans/<dir>/<q>_<tag>.txt")
    ap.add_argument("--plans-dir", default="plans/r07")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-only", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pdf_metadata_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    q_entries = entrymod.queries()

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = q_entries[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.tag:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            os.makedirs(args.plans_dir, exist_ok=True)
            p = os.path.join(args.plans_dir, f"{name}_{args.tag}.txt")
            with open(p, "w") as f:
                f.write(plan)
            print(f"# plan -> {p}", file=sys.stderr)
        if args.explain_only:
            continue

        def action():
            df = fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()

        action()  # warmup, untimed (bench.py methodology)
        samples = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            action()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: min={min(samples)} samples={samples}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
