"""Named-query registry: the single source of truth for the driver contract.

Every implemented operator (SURVEY.md §2 + extensions) registers here as a
(name, spark_fn, oracle_sql) triple. ``__spark_entry__.queries()`` /
``oracle_sql()`` and the local pytest oracle harness all read this registry,
so an operator is "done" exactly when it has an entry (and tests pass).

Oracle SQL is ANSI SQL runnable by DuckDB over the same parquet tables
(pre-registered views). Queries whose semantics SQL can't express
(e.g. true streaming) register with ``oracle=None`` → the driver records a
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_session_conf
from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table loader for query bodies."""
    return load_table(spark, sf_dir, name)


# Driver-facing emission order. The correctness driver verifies registry
# entries front-to-back with a bounded budget (50 in rounds 1-3), so the
# dict order below is load-bearing. Round-4 rotation (VERDICT_r3 asks
# #1/#2/#4): the four round-3 reds return with their fixes (HUGEINT
# oracle casts, string-serialized array outputs); everything whose code
# or oracle text changed this round is re-checked (IVFADC materialized
# CTEs, session-gap boundary, the batched BPE trainer, every streaming
# query via the _stream_table reader change); the never-checked entries
# get their first rows (q_stream_minhash_ledger, the new
# q_ann_ivfpq_search, and the two rows-only sketch/decode entries that
# never received even the weak check); and the remaining slots
# re-confirm round-1-only greens (relational/window/join family) whose
# last driver row is three fixture regenerations old. Triple-green r2/r3
# families rotate past slot 50 — by design, not regression (they remain
# pytest-oracle-green locally and in the round-4 full driver-sim).
_PRIORITY: tuple[str, ...] = (
    # -- reference surface (O1-O13 per VERDICT coverage table): 9 --
    "q_max_month",
    "q_city_month",
    "q_city_month_formatted",
    "q_scan_filter_project",
    "q_join_inner",
    "q_date_funcs",
    "q_case_coalesce",
    "q_topk_global",
    "q_sql_api_shipping",
    # -- the four round-3 reds, fixed this round (CAST(SUM) AS BIGINT in
    #    the oracles; array outputs serialized via array_join): 4 --
    "q_token_count",
    "q_pack_sequences",
    "q_embed_quantize",
    "q_encode_ids",
    # -- new this round + never-checked: 10 --
    "q_ann_ivfpq_search",
    "q_ann_ivf_search",
    "q_ann_ivfpq_rerank",
    "q_ann_index_stats",
    "q_stream_minhash_ledger",
    "q_bpe_train_merges",  # output/semantics changed: batched merges
    "q_bpe_apply",
    "q_segment_dedup",
    "q_ngram_lm_counts",
    "q_semdedup",
    "q_dup_span_fraction",
    # -- oracle text changed (AS MATERIALIZED IVF chain): 2 --
    "q_ann_ivfpq_topk",
    "q_ann_ivfpq_residual",
    # -- session-gap boundary changed on both engines (>= not >): 4 --
    "q_events_sessionize",
    "q_events_session_window",
    "q_events_funnel_sessionized",
    "q_stream_session_window",
    # -- streaming reader changed (_stream_table layout branch): 6 --
    "q_stream_tumbling",
    "q_stream_stateful_counts",
    "q_stream_stream_join",
    "q_stream_dedup",
    "q_stream_static_join",
    "q_stream_sliding",
    # -- rows-only entries that never received even the weak check: 2 --
    "q_approx_count_distinct",
    "q_multimodal_decode",
    # -- r1-only greens: last driver row predates three fixture
    #    regenerations; re-confirm a representative spread: 20 --
    "q_tfidf_top_terms",
    "q_udtf_chunk_text",
    "q_ngram_jaccard",
    "q_dedup_apply",
    "q_doc_fingerprint",
    "q_pii_scrub",
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_join_left",
    "q_agg_pricing_summary",
    "q_window_topk_per_group",
    "q_window_running_sum",
    # -- window boundary (slot 50): entries below are first in line if
    #    the driver's correctness window ever widens; all are r2/r3
    #    driver-green and round-4 sim-green. --
    "q_agg_rollup",
    "q_pivot",
    "q_asof_join",
    "q_range_join",
    "q_gapfill_daily",
    "q_latest_per_key",
    "q_percentiles",
    "q_json_extract",
    "q_shipping_priority",
    "q_nation_volume",
    "q_returned_items",
    "q_promo_revenue",
    "q_big_orders",
    "q_brand_revenue",
    "q_heavy_hitters",
    "q_event_transitions",
    "q_simhash_pairs",
    "q_dedup_canonical",
    "q_dedup_incremental",
    "q_corpus_clean",
    "q_pagerank_nations",
    "q_ann_pq_topk",
    "q_ann_gemm_topk",
    "q_dedup_minhash_lsh",
    "q_multimodal_meta",
    "q_frame_sample",
    "q_ann_ivf_topk",
    "q_ann_ivf_sampled",
)


def _ordered_specs() -> list[QuerySpec]:
    _import_plans()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    tail = [s for n, s in REGISTRY.items() if n not in set(_PRIORITY)]
    return [REGISTRY[n] for n in _PRIORITY] + tail


def all_queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def all_oracles() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered_specs()
        if spec.oracle is not None
    }


def _import_plans() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import analog  # noqa: F401

    _OPTIONAL = (
        "relational",
        "functions_suite",
        "temporal_suite",
        "arrays_suite",
        "sql_suite",
        "tpch_suite",
        "pandas_suite",
        "udtf_suite",
        "events_suite",
        "dedup_suite",
        "graph_suite",
        "similarity_suite",
        "text_suite",
        "multimodal_suite",
        "streaming_suite",
        "scale_suite",
    )
    import importlib

    for mod in _OPTIONAL:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # tolerate only *our own* not-yet-written plan modules
            if f"plans.{mod}" not in str(e):
                raise
