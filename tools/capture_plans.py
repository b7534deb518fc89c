"""Capture `.explain("formatted")` output for named registry queries.

Usage: python tools/capture_plans.py <tag> <query> [query ...]
Writes plans/r14/<query>_<tag>.txt for each query (tag = before/after).

Family builds can be captured too by passing the full
`family_build:<mod>.<name>` key — each kernel in the build list is
rendered in order into one file.

The session is the bench's own (get_spark), at $SPARK_GRAFT_SF_DIR
(default sf0.1), so the captured plan is the plan the bench times.
Plans are captured WITHOUT materializing family kernels first (the
cold plan — what a fresh run compiles); queries whose plan embeds a
persisted family kernel show the kernel's subtree inline when cold and
an InMemoryTableScan when warm, so for family consumers we ALSO
capture the warm form after materializing the declared builds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgres_cdc_plugin_spark import registry
from postgres_cdc_plugin_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    builds = registry.family_builds()
    jvm = spark.sparkContext._jvm

    def fmt(df) -> str:
        return jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    warm = os.environ.get("CAPTURE_WARM", "")
    if warm:
        # materialize the named family builds so consumer plans show
        # the InMemoryTableScan the bench's marginal timing sees
        for key in warm.split(","):
            for kernel in builds[key](spark, sf_dir):
                kernel.write.format("noop").mode("overwrite").save()
    for name in names:
        if name.startswith("family_build:"):
            dfs = builds[name](spark, sf_dir)
            text = "\n\n".join(
                f"-- kernel {i} --\n" + fmt(df) for i, df in enumerate(dfs)
            )
            fname = name.replace("family_build:", "family_").replace(".", "_")
        else:
            df = queries[name](spark, sf_dir)
            text = fmt(df)
            fname = name
        path = os.path.join(out_dir, f"{fname}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
