#!/usr/bin/env python
"""Capture .explain('formatted') for every bench.HEADLINE query.

Usage: python plans/r18/capture_plans.py before|after [name ...]

Writes plans/r18/<query>_<tag>.txt at sf0.1 (the bench scale). Plans
only — nothing is executed, so this is safe to run on a busy box.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import bench  # noqa: E402
from near_event_streams_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    spark = get_spark(app_name="nes-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in bench.HEADLINE:
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR capturing plan: {ex}\n"
        out = os.path.join(HERE, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
