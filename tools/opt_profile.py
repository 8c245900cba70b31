"""Per-query profiling harness for optimization rounds (guide §1).

Builds the SAME session profile as bench.py, then for each requested
registry query:

- captures ``df.explain("formatted")`` to ``<out>/<name>_<suffix>.txt``
- optionally times it with the bench's checksum reduction (min of N
  passes, ``spark.catalog.clearCache()`` between passes) so numbers are
  comparable with BENCH_r*.json entries
- labels each job via ``setJobDescription`` so the UI/eventlog is legible

Usage:
    python tools/opt_profile.py --names near_dup_minhash,sim_pairs_lsh \
        --out plans/r10 --suffix before --passes 2
    python tools/opt_profile.py --set headline --out plans/r10 \
        --suffix before --no-time        # explains only, cheap
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from contextlib import redirect_stdout
from io import StringIO

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def checksum(df) -> int:
    row = df.select(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("cs")
    ).collect()[0]
    return row["cs"] or 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--set", dest="qset", choices=["headline", "extra", "all"], default=None)
    ap.add_argument("--out", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument(
        "--eventlog",
        default=None,
        help="directory for Spark event logs (stage-level dissection; "
        "parse with tools/stage_report.py)",
    )
    args = ap.parse_args()

    import bench  # noqa: E402  (repo root on path)
    from ascii_hydra_spark.session import SessionProfile, build_spark
    from ascii_hydra_spark.verification import REGISTRY

    names: list[str] = [n for n in args.names.split(",") if n]
    if args.qset == "headline":
        names += bench.HEADLINE
    elif args.qset == "extra":
        names += bench.EXTRA
    elif args.qset == "all":
        names += bench.HEADLINE + bench.EXTRA

    extra_conf = {}
    if args.eventlog:
        os.makedirs(args.eventlog, exist_ok=True)
        extra_conf = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": args.eventlog,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    profile = SessionProfile(
        app_name="ahs-opt-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf=extra_conf,
    )
    spark = build_spark(profile)
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py so first-query timings are not JIT noise
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.count()
    from ascii_hydra_spark.functions.udfs import dot_product

    spark.range(0, CPUS * 8).repartition(CPUS).select(
        dot_product(F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0)))
    ).count()

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    results: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        if args.out:
            df = fn(spark, SF_DIR)
            buf = StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.out, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
        if not args.no_time:
            spark.sparkContext.setJobDescription(f"opt-profile: {name}")
            best = float("inf")
            for _ in range(args.passes):
                t0 = time.monotonic()
                checksum(fn(spark, SF_DIR))
                best = min(best, time.monotonic() - t0)
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
            results[name] = round(best, 3)
            print(json.dumps({"q": name, "sec": results[name]}), flush=True)

    if results:
        print(json.dumps({"total": round(sum(results.values()), 3), "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
