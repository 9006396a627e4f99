"""Steady-state stress run — evidence for the BASELINE.md warm-throughput
claim at a scale where fixed overheads amortize (1M turns, 200x hot
conversation), unlike bench.py's conservative cold single-shots.

Usage: python tools/stressbench.py [n_convs]   (default 100000 ≈ 1M turns)
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    from docext_spark.operators.reassemble import reassemble_conversations
    from docext_spark.plans.pipeline import run_extraction
    from docext_spark.session import get_spark
    from docext_spark.synth import transcripts_df

    spark = get_spark(app_name="docext_spark_stress")
    tdf = transcripts_df(spark, n_convs=n_convs, median_turns=8,
                         hot_factor=200, partitions=128).cache()
    n = tdf.count()
    # warm python workers (one-time spawn+imports, amortized in real jobs)
    run_extraction(tdf.limit(2000)).write.mode("overwrite").format("noop").save()

    t0 = time.time()
    run_extraction(tdf).write.mode("overwrite").format("noop").save()
    extract_sec = time.time() - t0

    t0 = time.time()
    reassemble_conversations(run_extraction(tdf)) \
        .write.mode("overwrite").format("noop").save()
    e2e_sec = time.time() - t0

    print(json.dumps({
        "n_turns": n, "hot_factor": 200,
        "extract_turns_per_sec": round(n / extract_sec, 1),
        "extract_sec": round(extract_sec, 1),
        "e2e_turns_per_sec": round(n / e2e_sec, 1),
        "e2e_sec": round(e2e_sec, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
