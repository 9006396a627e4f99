"""Dump full .explain('formatted') for the headline queries into
plans/r07/<query>_<tag>.txt (judge evidence for OPTIMIZATION_r07.md)."""
import sys

sys.path.insert(0, "/root/repo")

QUERIES = [
    "flagship_reassembly", "x1_turn_markdown", "q1_pricing_summary",
    "q5_revenue_by_nation", "j1_field_alignment", "a10_score_matrix",
    "dedup_exact", "dedup_lsh_pairs", "dedup_lsh_pairs_fast",
    "dedup_jaccard_capped", "dedup_lsh_flood_guard", "ann_cosine_topk",
    "ann_ivf_topk", "x4_kie_fields", "grits_similarity",
    "event_sessionization", "training_samples", "pack_sequences",
    "decontam_report", "asof_recent_view", "tiff_pixels",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else QUERIES
    import __spark_entry__ as entry
    from docext_spark.session import get_spark
    spark = get_spark(master="local[8]")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(f"/root/repo/plans/r07/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(name, "->", f"plans/r07/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
