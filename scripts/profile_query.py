"""Per-query optimization harness (round 12, guide §1).

Times ONE query the way bench.py does (collect-forced, sf0.001 plan
warm-up, N reps) plus a noop-sink variant (guide §1.4 — computation
without result transfer), and writes `.explain("formatted")` to
plans/<tag>/<query>_<suffix>.txt so plan claims are checkable without
running Spark.

Usage:
  python scripts/profile_query.py QUERY [--reps=5] [--sf=/root/testdata/sf0.1]
                                  [--plan-out=plans/r12/QUERY_before.txt]
                                  [--no-noop]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from demv_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    sf_dir = "/root/testdata/sf0.1"
    plan_out = None
    do_noop = True
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--plan-out="):
            plan_out = a.split("=", 1)[1]
        elif a == "--no-noop":
            do_noop = False

    spark = get_spark(
        "profile-query", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        fn = qs[name]
        # plan-shape warmup (codegen compile) at the smallest sf
        try:
            fn(spark, warm_dir).collect()
        except Exception:
            pass
        if plan_out:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = plan_out if len(names) == 1 else plan_out.replace(
                "QUERY", name
            )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"# plan -> {out}")
        col_t, noop_t = [], []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} collect rep{i}")
            t0 = time.time()
            n = len(fn(spark, sf_dir).collect())
            col_t.append(time.time() - t0)
        if do_noop:
            for i in range(reps):
                spark.sparkContext.setJobDescription(f"{name} noop rep{i}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                noop_t.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        msg = (
            f"{name}: collect median {statistics.median(col_t):.3f}s "
            f"{[round(s, 3) for s in col_t]} ({n} rows)"
        )
        if noop_t:
            msg += (
                f" | noop median {statistics.median(noop_t):.3f}s "
                f"{[round(s, 3) for s in noop_t]}"
            )
        print(msg)


if __name__ == "__main__":
    main()
