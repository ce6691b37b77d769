#!/usr/bin/env python
"""Scale the extension-block inputs (documents/embeddings) by N and time
the heavy dedup/ANN/text pipelines against the sf0.1 originals — the
SCALE.md evidence that the LSH/IVF/star-CC plans, not just the relational
core, extrapolate.

Replication preserves workload character instead of exploding it:
- documents: each replica r suffixes every TOKEN with "_r", so replicas
  share no shingles (cross-replica Jaccard 0) and the planted near-dup
  pairs simply repeat once per replica — near-dup density per bucket is
  constant, total work scales linearly. A naive copy would make every doc
  a 10-way exact dup and quadratically blow up the candidate stage.
- embeddings: replica r shifts ids and adds a tiny deterministic bias to
  one coordinate — corpus size scales, geometry stays ANN-shaped.

Usage: python scripts/ext_scale_stress.py [MULT] [OUT_DIR] [ONLY]
Writes {documents,embeddings}.parquet to OUT_DIR (default /tmp/ext10x)
then times registry queries with sf_dir=OUT_DIR vs /root/testdata/sf0.1.
ONLY: optional comma-separated query-name subset.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "q_dedup_minhash_lsh",
    "q_dedup_clusters",
    "q_dedup_simhash",
    # q_ann_cosine_topk moved to bench.py's GROUND_TRUTH tier (exact
    # |Q|·N·DIM recall oracle, quadratic by design — mult^2 work since
    # both |Q| and N grow); the LSH/IVF/binary serving arms below are
    # its scale paths. Request it via ONLY to time it anyway.
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
    "q_text_quality",
    "q_tfidf_top_terms",
    "q_pack_sequences",
    "q_stream_minhash_ledger",
    "q_segment_dedup",
    "q_segment_dedup_hashed",
    "q_dup_span_fraction",
    "q_dup_span_fraction_hashed",
    "q_gopher_quality",
    "q_ccnet_buckets",
    "q_winnowing",
    "q_winnowing_pairs",
    "q_doc_embed_hashed",
    "q_bm25_topk",
    "q_hybrid_search_rrf",
    "q_dup_span_maximal",
    "q_ann_imi_search",
    "q_ann_ivf_search",
    "q_dup_span_removal",
    "q_ann_sq8_topk",
    "q_ann_matryoshka_rerank",
    "q_hybrid_search_persisted",
    "q_containment_pairs",
    "q_bm25_rm3",
    "q_bm25_search_merged",
    "q_lexical_drift",
    "q_ann_range_search",
    "q_stream_lexical_drift",
    "q_quality_calibration",
    "q_abtt_search_indexed",
    "q_ann_binary_hamming",
    "q_ann_binary_rotated",
    "q_ann_binary_rotated_search",
    "q_ann_binary_search",
    "q_ann_ivf_binary_search",
    "q_ann_ivf_binary_rotated",
    "q_late_interaction",
    "q_adamic_adar",
    "q_zipf_fit",
    "q_pr_curve",
    "q_components_incremental_persisted",
    # round-11: chunking family, held-out SB, persisted serves
    "q_doc_chunks",
    "q_chunk_dedup",
    "q_stupid_backoff_lm",
    "q_chunk_search",
    "q_dedup_lsh_persisted",
    "q_chunk_index_add",
    # round-12: chunk-index health surface, celled near-dup pair sweep
    "q_chunk_index_stats",
    "q_embed_neardup_celled",
    "q_decontaminate_semantic",
    # round-13: hashed-key removal twin, real BMP decode pipeline
    "q_dup_span_removal_hashed",
    "q_multimodal_decode_real",
    "q_multimodal_resize_real",
    "q_multimodal_audio_real",
    "q_audio_fingerprint_dedup",
    # round-14: the Y4M video family
    "q_multimodal_video_real",
    "q_video_frame_sample_real",
    "q_video_scene_dedup",
    "q_video_frame_dedup",
    "q_multimodal_video_c420",
    "q_cross_modal_dedup",
]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ext10x"
    base = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from mapreduce_weather_analysis_spark.plans.registry import (
        REGISTRY,
        _import_plans,
    )
    from mapreduce_weather_analysis_spark.session import get_spark

    _import_plans()
    spark = get_spark(app_name="ext-scale-stress")

    # Idempotent pack generation: rewriting identical parquet changes file
    # mtimes/footers, which changes the ANN index fingerprint and forces a
    # full artifact rebuild into the FIRST graph query timed afterward
    # (observed: a 0.5 s query "measuring" a 30 s index+graph build). A
    # marker records the mult; only a different mult regenerates.
    import pathlib

    marker = pathlib.Path(out) / f"_PACK_COMPLETE_x{mult}"
    if marker.exists():
        docs = spark.read.parquet(f"{out}/documents.parquet")
        emb = spark.read.parquet(f"{out}/embeddings.parquet")
        print(
            f"pack exists: documents {docs.count()}, embeddings "
            f"{emb.count()} (delete {marker} to regenerate)"
        )
        _run_queries(spark, out, base, mult)
        return

    docs = spark.read.parquet(f"{base}/documents.parquet")
    n_docs = docs.count()
    reps = []
    for r in range(mult):
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.concat(t, F.lit(f"_{r}")),
            ),
            " ",
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big_docs = reps[0]
    for p in reps[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    n_emb = emb.count()
    ereps = []
    for r in range(mult):
        shifted = F.transform(
            F.col("embedding"), lambda x, i: x + (i == 0).cast("float") * (0.001 * r)
        )
        ereps.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                shifted.cast("array<float>").alias("embedding"),
                "label",
            )
        )
    big_emb = ereps[0]
    for p in ereps[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"scaled: documents {n_docs}->{n_docs * mult}, "
          f"embeddings {n_emb}->{n_emb * mult}")
    marker.touch()
    _run_queries(spark, out, base, mult)


def _run_queries(spark, out: str, base: str, mult: int) -> None:
    from mapreduce_weather_analysis_spark.plans.registry import REGISTRY

    queries = list(QUERIES)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        # keep QUERIES order for known names; ONLY may also name any
        # registered query not in the default list
        queries = [q for q in queries if q in only] + sorted(
            q for q in only - set(QUERIES) if q in REGISTRY
        )
    for name in queries:
        fn = REGISTRY[name].fn
        # warm plan/codegen at the smoke SF
        fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
        row = []
        for sf_dir in (base, out):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            row.append(time.perf_counter() - t0)
        print(
            f"{name}: sf0.1={row[0]:.2f}s {mult}x={row[1]:.2f}s "
            f"ratio={row[1] / row[0]:.1f}"
        )


if __name__ == "__main__":
    main()
