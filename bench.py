"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "turns_per_sec": ..., "n_turns": ...}

The flagship extraction throughput (turns/sec over the per-turn markdown
pipeline) is the north metric; per-query wall times cover the operator
surface (joins, aggs, dedup, ANN).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_reassembly",
    "x1_turn_markdown",
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "j1_field_alignment",
    "a10_score_matrix",
    "dedup_exact",
    "dedup_lsh_pairs",        # sha256 oracle-parity hash (DuckDB-replayable)
    "dedup_lsh_pairs_fast",   # xxhash64 production hash (the 100TB path)
    "dedup_jaccard_capped",   # hot-shingle cap under planted skew
    "dedup_lsh_flood_guard",  # DEFAULT-config guard vs a planted 1500-doc flood
    "ann_cosine_topk",
    "ann_ivf_topk",           # broadcast-centroid assignment path
    "x4_kie_fields",
    # GRITS kernel over the 101-pair fixture; the quadratic alignment is
    # bounded by core/grits.py MAX_GRID_ROWS=200 / MAX_GRID_COLS=60 /
    # MAX_GRID_AREA=2400 per table, so one adversarial grid cannot stall
    # a task (fixture tables are <=6x6)
    "grits_similarity",
    # the training-data surface (VERDICT r5 #3): the plans a training
    # pipeline actually runs per-batch — sessionize (one shuffle on
    # entity), budget-boundary chunking (window exprs, no recursion), and
    # capacity-bin packing (hash groups × per-group applyInPandas)
    "event_sessionization",
    "training_samples",
    "pack_sequences",
    "decontam_report",        # broadcast eval 8-grams, one corpus groupBy
    "asof_recent_view",       # union-window as-of join, one entity shuffle
    # multimodal decode representative: 100 real TIFF strip files through
    # mapInPandas (IFD walk + PackBits + photometric normalize)
    "tiff_pixels",
]

N_RUNS = 3  # per query: median kills the ±30% cold-run swing; min is also
            # recorded (VERDICT r5 #4) so one transient spike cannot poison
            # a number that the median alone would keep inflated

# Contention gate (VERDICT r5 #4): the 1-min loadavg alone misclassified in
# BOTH directions on this hypervisor (r5's committed fastest-ever run was
# flagged "contended" at load1 1.2 while a run 20 min after a pytest read
# "idle" at load1 0.16 yet ran 20-60% slow with load5 still 1.7). Gate on
# the 5-min loadavg AND /proc/pressure/cpu avg60 (the kernel's actual
# CPU-stall share over the last minute) and record all three in the JSON.
LOAD_CONTENDED = 0.6   # 5-min loadavg threshold (name kept: scalebench
                       # imports it as the single source of truth)
PSI_CONTENDED = 5.0    # % of wall time with runnable-but-stalled tasks


def read_load() -> tuple[float, float]:
    """(1-min, 5-min) loadavg; (-1, -1) when unreadable."""
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
            return float(parts[0]), float(parts[1])
    except (OSError, ValueError, IndexError):
        return -1.0, -1.0


def read_psi_cpu() -> float:
    """some avg60 from /proc/pressure/cpu (% of time at least one task
    stalled on CPU); -1 when PSI is unavailable (non-Linux / old kernel)."""
    try:
        with open("/proc/pressure/cpu") as f:
            for line in f:
                if line.startswith("some"):
                    for tok in line.split():
                        if tok.startswith("avg60="):
                            return float(tok.split("=", 1)[1])
    except (OSError, ValueError):
        pass
    return -1.0


def is_contended() -> tuple[bool, float, float, float]:
    """(contended, load1, load5, psi_avg60). Contended when EITHER the
    5-min loadavg or the CPU-pressure avg60 crosses its threshold — load5
    catches a box still draining a recent heavy job (cache/steal effects
    outlive the 1-min window), PSI catches live oversubscription that
    loadavg under-reports on 32 vCPUs."""
    load1, load5 = read_load()
    psi = read_psi_cpu()
    return (load5 > LOAD_CONTENDED or psi > PSI_CONTENDED,
            load1, load5, psi)


def load_gate() -> tuple[float, float, float, str]:
    """Sample start-of-run pressure; if contended, wait once (60s — the
    5-min loadavg decays slowly) for the box to drain, then proceed with a
    loud flag rather than refuse — the driver runs this unattended and
    must still get a JSON line."""
    contended, load1, load5, psi = is_contended()
    if contended:
        print(f"# WARNING: contended (load5 {load5:.2f}, psi60 {psi:.1f}) "
              "— waiting 60s for the box to drain", file=sys.stderr)
        time.sleep(60)
        contended, load1, load5, psi = is_contended()
    flag = "contended" if contended else "idle"
    if contended:
        print(f"# WARNING: still contended (load5 {load5:.2f}, psi60 "
              f"{psi:.1f}); timings below are NOT comparable across "
              "rounds", file=sys.stderr)
    return load1, load5, psi, flag


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not os.path.isdir(sf_dir):
        print(f"error: SPARK_GRAFT_SF_DIR does not exist: {sf_dir}",
              file=sys.stderr)
        sys.exit(2)
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.0  # non-sf-named dir: still run, report sf as unknown

    load_start, load5_start, psi_start, load_flag = load_gate()

    import __spark_entry__ as entry
    from docext_spark.session import get_spark

    spark = get_spark(app_name="docext_spark_bench", master=f"local[{cpus}]")
    qs = entry.queries()

    # warm the JVM AND the Python workers once (excluded from timings):
    # the first pUDF job pays ~10s of worker spawn + imports that a real
    # long-running job amortizes to zero
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    qs["x1_turn_markdown"](spark, "/root/testdata/sf0.001") \
        .write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            # noop sink: full materialization of every column (count() would
            # let Catalyst prune deterministic pUDF columns), result stays
            # distributed
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[N_RUNS // 2], 3)
        timings_min[name] = round(min(runs), 3)
        print(f"# {name}: median {timings[name]}s of "
              f"{[round(r, 3) for r in runs]}", file=sys.stderr)

    grits_pair_ms = round(timings["grits_similarity"] / 101 * 1000, 2)
    print(f"# grits_similarity: {grits_pair_ms} ms/pair over the 101-pair "
          "fixture", file=sys.stderr)

    # north metric: per-turn extraction throughput on the transcript shape
    from docext_spark.plans.pipeline import run_extraction
    from docext_spark.synth import transcripts_df
    n_convs = max(50, int(2000 * sf / 0.1))
    tdf = transcripts_df(spark, n_convs=n_convs, median_turns=8,
                         hot_factor=50, partitions=int(cpus) * 2).cache()
    n_turns = tdf.count()  # materialize synth cost outside the timing
    extract_runs = []
    for _ in range(N_RUNS):
        t0 = time.time()
        run_extraction(tdf).write.mode("overwrite").format("noop").save()
        extract_runs.append(time.time() - t0)
    extract_sec = sorted(extract_runs)[N_RUNS // 2]
    timings["flagship_turn_extraction"] = round(extract_sec, 3)
    timings_min["flagship_turn_extraction"] = round(min(extract_runs), 3)
    turns_per_sec = round(n_turns / extract_sec, 1)

    # streaming flagship: the same extraction pUDF through Structured
    # Streaming (availableNow, checkpointed parquet sink, exactly-once) —
    # the per-batch commit + sink transaction log are real costs a feed
    # pays over the batch plan, so they are MEASURED, not assumed
    import shutil
    import tempfile
    from docext_spark.streaming.extract_stream import run_extraction_stream
    stream_root = tempfile.mkdtemp(prefix="bench_stream_")
    in_dir = os.path.join(stream_root, "in")
    tdf.repartition(int(cpus)).write.mode("overwrite").parquet(in_dir)
    stream_runs = []
    for i in range(N_RUNS):
        ck = os.path.join(stream_root, f"ck{i}")
        out = os.path.join(stream_root, f"out{i}")
        t0 = time.time()
        run_extraction_stream(spark, in_dir, ck, out)
        stream_runs.append(time.time() - t0)
    stream_sec = sorted(stream_runs)[N_RUNS // 2]
    timings["flagship_stream_extraction"] = round(stream_sec, 3)
    timings_min["flagship_stream_extraction"] = round(min(stream_runs), 3)
    stream_turns_per_sec = round(n_turns / stream_sec, 1)
    print(f"# flagship_stream_extraction: median {stream_sec:.3f}s "
          f"({stream_turns_per_sec} turns/s streaming vs "
          f"{turns_per_sec} batch)", file=sys.stderr)
    shutil.rmtree(stream_root, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "total_min": round(sum(timings_min.values()), 3),
        "sf": sf,
        "turns_per_sec": turns_per_sec,
        "stream_turns_per_sec": stream_turns_per_sec,
        "n_turns": n_turns,
        "cpus": int(cpus),
        "runs_per_query": N_RUNS,
        "loadavg_start": load_start,
        "load5_start": load5_start,
        "psi_cpu_avg60_start": psi_start,
        "load_flag": load_flag,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
