"""Deduplication query suite over ``documents`` (training-data-pipeline
extension — BASELINE.json north star; nothing comparable exists in the
reference, whose only "dedup" is dropping duplicate headers, Job1.java:27).

Thresholds calibrated on the fixture corpus: planted near-dup pairs sit at
Jaccard ≈ 0.97 with background pairs < 0.2 → threshold 0.5 separates
cleanly at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import hashed_list_sql, shingles_sql, tokens_sql
from ..operators.dedup import (
    containment_pairs,
    LSH_BANDS,
    MINHASH_K,
    SIMHASH_BANDS,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    minhash_lsh_serve_sql,
    ngram_jaccard_pairs,
    simhash32_sql,
    simhash_bands,
    simhash_relational,
)
from ..functions.compat import dround, dround_sql, psum, psum_sql
from .registry import register, t


@register(
    "q_dedup_exact",
    scale_tier="scale",
    oracle="""
    SELECT text, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: identical text collapses to the min doc_id. One
    hash-agg shuffle; at scale, group on sha2(text) instead of raw text."""
    d = t(spark, sf_dir, "documents")
    return exact_dedup(d, ["text"], "doc_id")


@register(
    "q_dedup_minhash_lsh",
    scale_tier="scale",
    oracle=minhash_lsh_pairs_sql("documents", "text", "doc_id", threshold=0.5),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH(4 bands × 4 rows) near-dup pairs with exact
    Jaccard verification ≥ 0.5.

    The full scale path: signatures are one pass over shingles (md5-based
    portable hashing, JVM-side); candidate generation is the banded bucket
    self-join (no all-pairs anywhere); verification touches candidates only.
    """
    d = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5)


@register(
    "q_dedup_simhash",
    scale_tier="scale",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
    ),
    hs AS (
      SELECT doc_id, {hashed_list_sql('toks')} AS hv FROM toks WHERE len(toks) > 0
    )
    SELECT doc_id, {simhash32_sql('hv')} AS simhash
    FROM hs
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document (majority vote over token
    hash bits), computed relationally: explode → codegen'd hash → one
    partial+final aggregate (see operators/dedup.py)."""
    d = t(spark, sf_dir, "documents")
    return simhash_relational(d, "text", "doc_id")


@register(
    "q_simhash_pairs",
    scale_tier="scale",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
    ),
    hs AS (
      SELECT doc_id, {hashed_list_sql('toks')} AS hv FROM toks WHERE len(toks) > 0
    ),
    sh AS (
      SELECT doc_id, {simhash32_sql('hv')} AS simhash FROM hs
    ),
    bands AS (
      SELECT doc_id, simhash, j AS band_idx,
             (simhash >> (j * {32 // SIMHASH_BANDS})) & {(1 << (32 // SIMHASH_BANDS)) - 1} AS band_val
      FROM sh, (SELECT unnest(range(0, {SIMHASH_BANDS})) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS ha, b.simhash AS hb
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= 6
    """,
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band-blocked candidates (pairs agreeing on
    ≥1 of 4 byte-bands) filtered to hamming distance ≤ 6 — the classic
    scalable hamming join (no all-pairs comparison)."""
    d = t(spark, sf_dir, "documents")
    sh = simhash_relational(d, "text", "doc_id")
    bands = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(simhash_bands(F.col("simhash"))).alias("band_idx", "band_val"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= 6)
    )


@register(
    "q_ngram_jaccard",
    # "small-corpus", not "ground-truth": the ground-truth tier contract
    # says bench keeps those arms OFF the timed wall (q_ann_cosine_topk /
    # q_abtt_search — deliberately-quadratic |Q|xN brute scans), but this
    # query is a GATED headline arm (first-green 2.0 s, VERDICT r10 ask
    # #8) and an exact posting-join algorithm, not a brute scan. Its
    # growth term is the df-UNCAPPED inverted join (hot shingles are
    # quadratic pair fuel — q_winnowing_pairs documents the cap that
    # fixes this), which is exactly the small-corpus contract. Its
    # MinHash-parity role is unchanged (test_minhash_agrees_with_exact_
    # jaccard cross-validates the LSH arm against it).
    scale_tier="small-corpus",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      FROM toks
    ),
    sized AS (
      SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh WHERE len(shingles) > 0
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sized),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sized sa ON sa.doc_id = doc_a
    JOIN sized sb ON sb.doc_id = doc_b
    WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via the inverted-shingle join —
    the ground truth the MinHash estimate approximates (their outputs
    cross-validate: same pairs at threshold 0.5)."""
    d = t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.5)


@register(
    "q_dedup_apply",
    scale_tier="scale",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (
      SELECT doc_b FROM (
        {minhash_lsh_pairs_sql("documents", "text", "doc_id", threshold=0.5)}
      ) pairs
    )
    """,
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup RESULT: the corpus after near-duplicate removal. Policy:
    for every MinHash-verified pair (a < b), drop b (greedy min-id
    canonical — not full transitive clustering, which needs iterative
    connected components; documented limitation). One anti-join against
    the loser set."""
    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return d.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "q_dedup_clusters",
    scale_tier="scale",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM (
        {minhash_lsh_pairs_sql("documents", "text", "doc_id", threshold=0.5)}
      ) p
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, target) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.target FROM und u JOIN reach r ON u.b = r.node
    )
    SELECT node AS doc_id, MIN(target) AS component
    FROM reach
    GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-duplicate CLUSTERS: connected components (iterative
    min-label propagation, operators/graph.py) over the MinHash-verified
    pair graph — the proper grouping q_dedup_apply's greedy pairwise policy
    approximates. Oracle: DuckDB recursive-CTE transitive closure — two
    entirely different algorithms, identical fixpoint."""
    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5)
    from ..operators.graph import connected_components

    return connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )


_DECON_N = 4  # n-gram width for contamination (corpus docs are ~50-200 toks)
_DECON_EVAL = 23  # doc_id % _DECON_EVAL == 0 -> held-out "benchmark" doc


@register(
    "q_decontaminate",
    scale_tier="scale",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest({shingles_sql('toks', _DECON_N)}) AS s
      FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents)
    ),
    eval_sh AS (
      SELECT DISTINCT doc_id AS eval_id, s FROM sh WHERE doc_id % {_DECON_EVAL} = 0
    ),
    train_sh AS (
      SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % {_DECON_EVAL} <> 0
    )
    SELECT t.doc_id,
           COUNT(DISTINCT t.s) AS n_shared_shingles,
           COUNT(DISTINCT e.eval_id) AS n_eval_docs_hit
    FROM train_sh t JOIN eval_sh e ON t.s = e.s
    GROUP BY t.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    4-token shingle with the held-out eval split (doc_id % 23 == 0 —
    the stand-in for a benchmark suite), with overlap counts. The standard
    LLM pretraining hygiene step (n-gram collision decontamination).

    Scale posture: the eval side is benchmark-sized (MBs even at 100 TB of
    train data), so its distinct shingle relation BROADCASTS — the train
    side is scanned once, shingled in-map, and hash-joined with no shuffle
    of train data; only the (tiny) per-doc overlap counts aggregate.
    """
    from ..operators.dedup import shingle_rows

    d = t(spark, sf_dir, "documents")
    sh = shingle_rows(d, "text", "doc_id", n=_DECON_N)
    is_eval = F.col("doc_id") % _DECON_EVAL == 0
    eval_sh = sh.where(is_eval).select(
        F.col("doc_id").alias("eval_id"), "s"
    )
    train_sh = sh.where(~is_eval)
    return (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
    )


_BLOOM_M = 131072  # filter bits (2^17)
_BLOOM_K = 3  # hash functions


def _bloom_pos_sql(expr: str, j: int) -> str:
    from ..functions.compat import portable_hash32_sql

    seeded = f"concat('bloom{j}:', {expr})"
    return f"{portable_hash32_sql(seeded)} % {_BLOOM_M}"


@register(
    "q_decontaminate_bloom",
    scale_tier="scale",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest({shingles_sql('toks', _DECON_N)}) AS s
      FROM (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents)
    ),
    eval_sh AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % {_DECON_EVAL} = 0
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        {' UNION ALL '.join(
            f"SELECT {_bloom_pos_sql('s', j)} AS pos FROM eval_sh"
            for j in range(_BLOOM_K)
        )}
      )
    ),
    train_sh AS (
      SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % {_DECON_EVAL} <> 0
    ),
    probe AS (
      SELECT doc_id, s, unnest([{', '.join(
          _bloom_pos_sql('s', j) for j in range(_BLOOM_K)
      )}]) AS pos
      FROM train_sh
    ),
    bloom_hits AS (
      SELECT doc_id, s FROM probe JOIN bits USING (pos)
      GROUP BY doc_id, s HAVING COUNT(*) = {_BLOOM_K}
    ),
    exact_hits AS (
      SELECT DISTINCT t.doc_id, t.s
      FROM train_sh t JOIN eval_sh e ON t.s = e.s
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bloom_hits,
           CAST(SUM(CASE WHEN x.s IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_exact_hits,
           CAST(SUM(CASE WHEN x.s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives
    FROM bloom_hits b
    LEFT JOIN exact_hits x ON x.doc_id = b.doc_id AND x.s = b.s
    GROUP BY b.doc_id
    """,
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination with IN-PLAN false-positive
    certification: the eval split's shingles build a deterministic
    {M}-bit / {K}-hash Bloom filter (portable md5-prefix hashes, so the
    bit set is identical cross-engine), and train shingles are flagged
    when ALL {K} probe bits are set. Per flagged doc the query also
    reports how many flagged shingles are EXACT matches vs Bloom false
    positives — the same self-certifying posture as q_cm_sketch_freq,
    here quantifying the one-sided error the compression buys.

    Scale posture — the reason to prefer this over q_decontaminate's
    exact broadcast: the broadcast relation shrinks from ALL distinct
    eval shingles (GBs for a fat benchmark suite at 100 TB train scale)
    to at most {M} set-bit positions (~1 MB) REGARDLESS of benchmark
    size; the train side still scans once with no shuffle of train
    data. The exact-hit arm here exists only to certify the FP rate on
    the flagged subset — production keeps the Bloom arm and spot-checks;
    the oracle reproduces bits, probes, and FP accounting exactly."""
    from ..functions.compat import portable_hash32
    from ..operators.dedup import shingle_rows

    def bloom_pos(c, j: int):
        return (
            portable_hash32(F.concat(F.lit(f"bloom{j}:"), c)) % _BLOOM_M
        )

    d = t(spark, sf_dir, "documents")
    sh = shingle_rows(d, "text", "doc_id", n=_DECON_N)
    is_eval = F.col("doc_id") % _DECON_EVAL == 0
    eval_sh = sh.where(is_eval).select("s").distinct()
    bits = (
        eval_sh.select(
            F.explode(
                F.array(*[bloom_pos(F.col("s"), j) for j in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    train_sh = sh.where(~is_eval).select("doc_id", "s").distinct()
    probe = train_sh.select(
        "doc_id",
        "s",
        F.explode(
            F.array(*[bloom_pos(F.col("s"), j) for j in range(_BLOOM_K)])
        ).alias("pos"),
    )
    bloom_hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .where(F.col("nbits") == _BLOOM_K)
        .select("doc_id", "s")
    )
    exact_hits = (
        train_sh.join(F.broadcast(eval_sh), "s")
        .select("doc_id", "s")
        .withColumn("exact", F.lit(1))
    )
    return (
        bloom_hits.join(exact_hits, ["doc_id", "s"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bloom_hits"),
            F.sum(F.coalesce("exact", F.lit(0)))
            .cast("bigint")
            .alias("n_exact_hits"),
            F.sum(F.when(F.col("exact").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_false_positives"),
        )
    )


q_decontaminate_bloom.__doc__ = q_decontaminate_bloom.__doc__.replace(
    "{M}", str(_BLOOM_M)
).replace("{K}", str(_BLOOM_K))


@register(
    "q_dedup_canonical",
    scale_tier="scale",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM (
        {minhash_lsh_pairs_sql("documents", "text", "doc_id", threshold=0.5)}
      ) p
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, target) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.target FROM und u JOIN reach r ON u.b = r.node
    ),
    comp AS (SELECT node, MIN(target) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, LENGTH(d.text) AS len,
             coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, component,
           FIRST_VALUE(doc_id) OVER (
             PARTITION BY component ORDER BY len DESC, doc_id ASC
           ) AS canonical_id,
           CAST(doc_id = FIRST_VALUE(doc_id) OVER (
             PARTITION BY component ORDER BY len DESC, doc_id ASC
           ) AS INTEGER) AS keep
    FROM labeled
    """,
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the step that turns duplicate
    CLUSTERS into a deduplicated corpus: every doc maps to its cluster's
    keeper (longest text wins, doc_id breaks ties; singletons keep
    themselves) plus a 0/1 ``keep`` flag, so the cleaned corpus is
    ``WHERE keep = 1`` and the mapping doubles as a redirect table.

    Pipeline: MinHash-LSH pairs → large-star/small-star components
    (operators/graph.py) → per-component argmax by a window over the
    component label. Scale: the window partitions by component — cluster
    sizes are bounded by near-dup group sizes (no global sort); the
    documents scan reads (doc_id, text-length) only."""
    from ..operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5)
    comp = connected_components(pairs, src="doc_a", dst="doc_b").withColumnRenamed(
        "node", "doc_id"
    )
    labeled = (
        d.select("doc_id", F.length("text").alias("_len"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "_len",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    w = W.partitionBy("component").orderBy(F.desc("_len"), F.asc("doc_id"))
    canon = F.first("doc_id").over(w)
    return labeled.select(
        "doc_id",
        "component",
        canon.alias("canonical_id"),
        (F.col("doc_id") == canon).cast("int").alias("keep"),
    )


_INCR_MOD = 5  # doc_id % 5 == 4 -> the "incoming batch" (~20% of corpus)


@register(
    "q_dedup_incremental",
    scale_tier="scale",
    oracle=f"""
    WITH inc AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {_INCR_MOD} = {_INCR_MOD - 1}
    ),
    snap AS (
      SELECT doc_id AS snap_id, text FROM documents
      WHERE doc_id % {_INCR_MOD} <> {_INCR_MOD - 1}
    ),
    dup AS (
      SELECT i.doc_id, MIN(s.snap_id) AS dup_of
      FROM inc i JOIN snap s ON i.text = s.text
      GROUP BY i.doc_id
    )
    SELECT i.doc_id, d.dup_of,
           CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS is_new
    FROM inc i LEFT JOIN dup d ON d.doc_id = i.doc_id
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (snapshot) dedup — the production shape of exact dedup:
    an incoming batch is checked against the standing corpus snapshot, NOT
    re-deduplicated against itself. Every incoming doc gets its earliest
    snapshot twin (dup_of) or is_new=1.

    Content equality runs on sha2(text) digests, so the (huge) snapshot
    side ships 32-byte hashes instead of full text through the join, and
    the incoming batch — epochs smaller than the snapshot at 100 TB —
    BROADCASTS: the snapshot scan never shuffles, exactly the
    q_decontaminate posture. The oracle joins on raw text equality;
    identical results bar a sha2 collision (~2^-128)."""
    d = t(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % _INCR_MOD == _INCR_MOD - 1
    inc = d.where(is_inc).select("doc_id", F.sha2("text", 256).alias("h"))
    snap = d.where(~is_inc).select(
        F.col("doc_id").alias("snap_id"), F.sha2("text", 256).alias("h")
    )
    dup = (
        snap.join(F.broadcast(inc), "h")
        .groupBy("doc_id")
        .agg(F.min("snap_id").alias("dup_of"))
    )
    return inc.join(dup, "doc_id", "left").select(
        "doc_id",
        "dup_of",
        F.when(F.col("dup_of").isNull(), 1).otherwise(0).alias("is_new"),
    )


_CLEAN_MIN_TOKENS = 20
_CLEAN_MIN_TTR = 0.25


@register(
    "q_corpus_clean",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM (
        {minhash_lsh_pairs_sql("documents", "text", "doc_id", threshold=0.5)}
      ) p
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, target) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.target FROM und u JOIN reach r ON u.b = r.node
    ),
    comp AS (SELECT node, MIN(target) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, LENGTH(d.text) AS len,
             coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    canon AS (
      SELECT doc_id,
             CASE WHEN doc_id = FIRST_VALUE(doc_id) OVER (
               PARTITION BY component ORDER BY len DESC, doc_id ASC
             ) THEN 1 ELSE 0 END AS keep_dedup
      FROM labeled
    ),
    sig AS (
      SELECT doc_id, lang, {tokens_sql('text')} AS toks FROM documents
    )
    SELECT s.doc_id,
           CASE WHEN s.lang = 'en' THEN 1 ELSE 0 END AS keep_lang,
           CASE WHEN len(s.toks) >= {_CLEAN_MIN_TOKENS}
                 AND len(list_distinct(s.toks)) * 1.0 / len(s.toks)
                     >= {_CLEAN_MIN_TTR}
                THEN 1 ELSE 0 END AS keep_quality,
           c.keep_dedup,
           (CASE WHEN s.lang = 'en' THEN 1 ELSE 0 END)
             * (CASE WHEN len(s.toks) >= {_CLEAN_MIN_TOKENS}
                      AND len(list_distinct(s.toks)) * 1.0 / len(s.toks)
                          >= {_CLEAN_MIN_TTR}
                     THEN 1 ELSE 0 END)
             * c.keep_dedup AS keep
    FROM sig s JOIN canon c ON c.doc_id = s.doc_id
    """,
)
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus filter — the pipeline the individual
    operators exist FOR, composed: language gate (metadata), quality gate
    (min tokens + lexical diversity, q_text_quality's signals), and
    near-dup gate (MinHash-LSH → components → canonical keeper). Output is
    the per-document audit relation (keep_lang, keep_quality, keep_dedup,
    keep) — the cleaned corpus is ``WHERE keep = 1`` and every drop is
    attributable to its gate.

    Scale: the gates are one narrow scan (lang/quality) plus the dedup
    pipeline's own bounded plan; the final join keys on doc_id. Filters
    compose as independent 0/1 columns, so gate ordering is a pure
    cost decision at deploy time (cheap scans first, dedup last on the
    survivors)."""
    from pyspark.sql import Window as W2

    from ..functions.text import tokens
    from ..operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5)
    comp = connected_components(pairs, src="doc_a", dst="doc_b").withColumnRenamed(
        "node", "doc_id"
    )
    labeled = (
        d.select("doc_id", F.length("text").alias("_len"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "_len",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    w = W2.partitionBy("component").orderBy(F.desc("_len"), F.asc("doc_id"))
    canon = labeled.select(
        "doc_id",
        (F.col("doc_id") == F.first("doc_id").over(w)).cast("int").alias(
            "keep_dedup"
        ),
    )
    toks = tokens("text")
    n_toks = F.size("toks")
    ttr = F.size(F.array_distinct("toks")) * F.lit(1.0) / n_toks
    sig = d.select("doc_id", "lang", toks.alias("toks"))
    keep_lang = F.when(F.col("lang") == "en", 1).otherwise(0)
    keep_quality = F.when(
        (n_toks >= _CLEAN_MIN_TOKENS) & (ttr >= _CLEAN_MIN_TTR), 1
    ).otherwise(0)
    return (
        sig.join(canon, "doc_id")
        .select(
            "doc_id",
            keep_lang.alias("keep_lang"),
            keep_quality.alias("keep_quality"),
            "keep_dedup",
            (keep_lang * keep_quality * F.col("keep_dedup")).alias("keep"),
        )
    )


def _cross_source_sql() -> str:
    """The cross-source pair relation in SQL — shared by the pair-level
    ledger's oracle and the per-feed-pair overlap matrix's oracle."""
    return f"""
    WITH pairs AS (
      {minhash_lsh_pairs_sql("documents", "text", "doc_id", threshold=0.5)}
    ),
    srcs AS (SELECT doc_id, source FROM documents)
    SELECT p.doc_a, p.doc_b, sa.source AS source_a, sb.source AS source_b,
           p.jaccard
    FROM pairs p
    JOIN srcs sa ON sa.doc_id = p.doc_a
    JOIN srcs sb ON sb.doc_id = p.doc_b
    WHERE sa.source <> sb.source
    """


@register("q_cross_source_pairs", scale_tier="scale", oracle=_cross_source_sql())
def q_cross_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE near-duplicate pairs — verified MinHash-LSH pairs
    whose two documents come from DIFFERENT ingest sources. Within-
    source duplicates are crawl noise (dedup handles them); cross-
    source duplicates are a pipeline signal: the same document arriving
    through two feeds means double-weighted content in the training
    mixture (q_mixing_weights assumes sources are disjoint) and,
    when one "source" is an evaluation set, leakage the Bloom
    decontamination pass must catch. This is the between-feeds
    contamination ledger: which feed pairs overlap, document by
    document, with the verified Jaccard as severity.

    Scale shape: the pair relation is the full banded-LSH scale path
    (signatures one pass, candidates from the band-bucket self-join,
    exact Jaccard on candidates only — never all-pairs); the source
    annotation is two doc_id-keyed joins of the slim (doc_id, source)
    projection onto the (near-dup-bounded, ≪ corpus) pair relation, and
    the cross-source filter prunes before any downstream rollup. Column
    pruning keeps text out of the annotation joins. Oracle: the shared
    LSH pairs SQL as a CTE + the identical source joins."""
    return _cross_source_pairs(spark, sf_dir)


def _cross_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, source_a, source_b, jaccard) — DataFrame twin of
    :func:`_cross_source_sql`, shared by the pair ledger and the
    overlap matrix."""
    d = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5).select(
        "doc_a", "doc_b", "jaccard"
    )
    srcs = d.select("doc_id", "source")
    return (
        pairs.join(
            srcs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("source_a"),
            ),
            "doc_a",
        )
        .join(
            srcs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("source_b"),
            ),
            "doc_b",
        )
        .where(F.col("source_a") != F.col("source_b"))
        .select("doc_a", "doc_b", "source_a", "source_b", "jaccard")
    )


@register(
    "q_source_overlap_matrix",
    scale_tier="scale",
    oracle=f"""
    WITH xp AS ({_cross_source_sql()})
    SELECT LEAST(source_a, source_b) AS source_lo,
           GREATEST(source_a, source_b) AS source_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {psum_sql('jaccard', 6)} / COUNT(*) AS avg_jaccard,
           MAX(jaccard) AS max_jaccard
    FROM xp
    GROUP BY 1, 2
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FEED-PAIR overlap matrix — the rollup of
    q_cross_source_pairs into one row per unordered source pair:
    how many verified near-dup pairs cross the two feeds, at what
    average and worst-case Jaccard. This is the table an ingest owner
    actually reads: a (src3, src7) row with hundreds of pairs at
    jaccard ≈ 1 means one feed mirrors the other (de-prioritize one);
    a scattering of low-jaccard rows is benign boilerplate overlap.
    The contamination ledger's monitoring surface, same role
    q_curation_report plays for the gate.

    Scale shape: the pair relation stays on the banded-LSH scale path
    and is near-dup-bounded (≪ corpus); the rollup groups on the
    unordered (LEAST, GREATEST) feed-pair key — at most |sources|²
    groups, partial-agg'd with counter/decimal-sum/max state that
    combines map-side. avg routes the computed-double jaccard through
    its shortest decimal string (psum) so the mean is order-independent
    and bit-identical to DuckDB. Oracle: the
    shared cross-source SQL + the identical rollup."""
    xp = _cross_source_pairs(spark, sf_dir)
    return (
        xp.groupBy(
            F.least("source_a", "source_b").alias("source_lo"),
            F.greatest("source_a", "source_b").alias("source_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (psum(F.col("jaccard"), 6) / F.count(F.lit(1))).alias(
                "avg_jaccard"
            ),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


# --- Asymmetric containment dedup --------------------------------------------

_CONT_DF_CAP = 50  # shingle df cap for candidate generation (boilerplate)
_CONT_MIN_SHARED = 3  # shared capped shingles to become a candidate pair
_CONT_T = 0.6  # keep pairs where max directional containment >= this


def _containment_sql() -> str:
    toks = tokens_sql("text")
    sh = shingles_sql("toks")
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ),
    sh AS (SELECT doc_id, {sh} AS shingles FROM toks),
    exd AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY 1),
    dfc AS (SELECT s, COUNT(*) AS df FROM exd GROUP BY 1),
    keep AS (
      SELECT e.doc_id, e.s FROM exd e JOIN dfc USING (s)
      WHERE df BETWEEN 2 AND {_CONT_DF_CAP}
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keep a JOIN keep b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_CONT_MIN_SHARED}
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM cand c
      JOIN exd ea ON ea.doc_id = c.doc_a
      JOIN exd eb ON eb.doc_id = c.doc_b AND eb.s = ea.s
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           {dround_sql('n_inter * 1.0 / na.n', 6)} AS cont_a_in_b,
           {dround_sql('n_inter * 1.0 / nb.n', 6)} AS cont_b_in_a,
           {dround_sql('n_inter * 1.0 / (na.n + nb.n - n_inter)', 6)}
             AS jaccard,
           {dround_sql('n_inter * 1.0 / (na.n + nb.n - n_inter)', 6)} < 0.5
             AS asymmetric
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE GREATEST({dround_sql('n_inter * 1.0 / na.n', 6)},
                   {dround_sql('n_inter * 1.0 / nb.n', 6)}) >= {_CONT_T}
    """


@register("q_containment_pairs", scale_tier="scale", oracle=_containment_sql())
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT near-dup pairs (Broder, "On the
    resemblance and containment of documents", SEQUENCES'97):
    C(A in B) = |S(A) ∩ S(B)| / |S(A)| over distinct 3-token shingle
    sets. Symmetric Jaccard dedup structurally misses the
    quote-heavy/subset case — a short doc wholly embedded in a much
    longer one scores |A|/|B| ≈ 0 Jaccard but containment 1.0; rows
    with ``asymmetric = true`` (max containment ≥ {T} while Jaccard
    < 0.5) are exactly the pairs every MinHash/SimHash query in this
    suite cannot surface.

    Scale shape: candidate generation is a df-capped inverted-index
    self-join — only shingles with 2 ≤ df ≤ {CAP} generate pairs, so
    pair work is O(Σ min(df, {CAP})²) over shingle posting lists, never
    all-pairs (same bound as q_winnowing_pairs); a ≥{MIN}-shared-shingle
    floor prunes coincidental pairs before the exact phase. The exact
    containment join then touches CANDIDATE pairs only (the
    minhash_lsh_pairs discipline). Set sizes and shingle dfs are
    hash-aggs; every count is an exact integer and each ratio one IEEE
    division then dround(6), so the hash matches DuckDB bit-for-bit."""
    d = t(spark, sf_dir, "documents")
    return containment_pairs(
        d,
        "text",
        "doc_id",
        df_cap=_CONT_DF_CAP,
        min_shared=_CONT_MIN_SHARED,
        threshold=_CONT_T,
    )


q_containment_pairs.__doc__ = q_containment_pairs.__doc__.format(
    T=_CONT_T, CAP=_CONT_DF_CAP, MIN=_CONT_MIN_SHARED
)


# --- Persisted-LSH serving: dedup a batch against the standing corpus -------

# Bounded query batch, the q_chunk_search convention: |Q| <= 50 docs at
# every SF so the measured scale ratio is the per-batch serve path, not
# a corpus-proportional join (q_dedup_minhash_lsh owns that shape).
_LSHS_MOD = 10
_LSHS_CAP = 500
_LSHS_PRED = f"{{d}} % {_LSHS_MOD} = 0 AND {{d}} < {_LSHS_CAP}"


def _lsh_serve_oracle() -> str:
    return minhash_lsh_serve_sql(
        "documents", "text", "doc_id", _LSHS_PRED, threshold=0.5
    )


@register("q_dedup_lsh_persisted", scale_tier="scale", oracle=_lsh_serve_oracle())
def q_dedup_lsh_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup against a STANDING corpus — the build/serve split
    applied to MinHash-LSH (the ann_store discipline for the dedup
    family): the corpus is signed ONCE into a persisted band index
    (operators/lsh_store.lsh_write — band buckets partitioned by
    band_idx + a signature/shingle verification payload, fingerprinted
    on the documents file and every signature constant), and each
    incoming batch is signed (|Q| docs only), its band keys broadcast
    into the standing buckets, and bucket collisions exact-Jaccard
    verified against the persisted shingle sets. This is the
    production ingest posture (RefinedWeb/Gopher-style dedup stages):
    q_dedup_minhash_lsh re-signs everything per run,
    q_dedup_incremental checks exact digests only, and
    q_stream_minhash_ledger keeps signature state in a stream — this
    arm completes the matrix with warm fuzzy matching.

    Scale shape: build one-time (marker-amortized); serve signs |Q|
    docs, broadcasts |Q|x{B} band keys, and touches only colliding
    posting rows plus the candidate rows of sigs/ — the LSH
    1-(1-j^r)^b candidate bound, never |Q|*N. Determinism: integer
    signature agreement / {K}.0, exact integer Jaccard, one IEEE
    division each."""
    from ..operators.lsh_store import lsh_search, lsh_write

    d = t(spark, sf_dir, "documents")
    path = lsh_write(spark, sf_dir, d)
    qdocs = d.where(
        (F.col("doc_id") % _LSHS_MOD == 0) & (F.col("doc_id") < _LSHS_CAP)
    ).select("doc_id", "text")
    return lsh_search(spark, path, qdocs, threshold=0.5)


q_dedup_lsh_persisted.__doc__ = q_dedup_lsh_persisted.__doc__.format(
    B=LSH_BANDS, K=MINHASH_K
)
