#!/usr/bin/env python
"""Capture `.explain("formatted")` output for declared queries into
plans/r07/<query>_<tag>.txt — the optimization round's before/after plan
evidence (spark_optimization_guide §1: measure first, keep the plan shape
on record).

Usage:
    python scripts/capture_plans.py <tag> [query ...]   # default: all
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from rag_pdf_parser_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r07")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    wanted = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark()
    qs = E.queries()
    for name, fn in qs.items():
        if wanted and name not in wanted:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {exc}"
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
