"""Per-key profiler for the optimization rounds: times each named
key in isolation (median of N collect() runs, same methodology as
bench.py), optionally with the noop sink (guide §1.4), and dumps
`.explain("formatted")` to plans/<tag>/<key>_<suffix>.txt.

Usage:
    python scripts/profile_keys.py [--noop] [--explain-dir plans/r13]
        [--suffix before] [--runs 3] key1 key2 ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_generator_spark.operators import cache  # noqa: E402
from parquet_generator_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--noop", action="store_true",
                    help="time via noop sink instead of collect()")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # same warmup as bench.py
    warmup_dir = "/root/testdata/sf0.001"
    for wq in ("q1_pricing_summary", "dedup_minhash", "dedup_embedding"):
        qs[wq](spark, warmup_dir).collect()
    cache.release_all(spark)

    for name in args.keys:
        if name not in qs:
            print(f"{name}: UNKNOWN KEY", file=sys.stderr)
            continue
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            p = os.path.join(args.explain_dir,
                             f"{name}_{args.suffix}.txt")
            with open(p, "w") as fh:
                fh.write(txt)
            cache.release_all(spark)
        per = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t1 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = len(df.collect())
            per.append(time.perf_counter() - t1)
            cache.release_all(spark)
        med = sorted(per)[len(per) // 2]
        print(f"{name}: median {med:.3f}s min {min(per):.3f}s "
              f"max {max(per):.3f}s rows {n}")
    spark.stop()


if __name__ == "__main__":
    main()
