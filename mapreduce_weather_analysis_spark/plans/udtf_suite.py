"""Python UDF surfaces the builtin operators can't express: a table
function (UDTF, 1→N row expansion with Python logic) and a vectorized
scalar pandas UDF — completing the UDF/UDAF/UDTF row of SURVEY.md §2.2.

Both are deterministic by construction, so despite running Python they
carry full DuckDB oracles: the chunker is pure integer/string logic, and
the cosine UDF folds its sums sequentially (cumsum) to match the
left-fold `dot_sql` twin bit-for-bit (see functions/vectors.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS
from ..functions.vectors import dot_sql
from .registry import register, t

# Chunking parameters shared by the UDTF and its SQL twin.
_CHUNK_SIZE, _CHUNK_STRIDE = 32, 16

_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{WS_CLASS}+'),
                     x -> x <> '') AS tk
  FROM documents
  WHERE text IS NOT NULL
), starts AS (
  SELECT doc_id, tk, len(tk) AS n,
         unnest(range(0, greatest(len(tk) - {_CHUNK_SIZE} + 1, 1),
                      {_CHUNK_STRIDE})) AS start
  FROM toks
)
SELECT doc_id,
       CAST(start // {_CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(start AS INT) AS start_tok,
       CAST(least({_CHUNK_SIZE}, n - start) AS INT) AS n_toks,
       COALESCE(array_to_string(tk[start + 1 : start + {_CHUNK_SIZE}], ' '), '')
           AS chunk
FROM starts
"""


@register("q_udtf_chunk_text", oracle=_CHUNK_ORACLE)
def q_udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: split each document into overlapping fixed-size token
    chunks (the LLM-context chunking primitive) — one input row fans out to
    N chunk rows with positions. Lateral-joined per document row.

    Deterministic integer/string logic → full SQL twin (range + list
    slice), so the driver hash-checks it despite the Python body.

    Scale: the UDTF runs Arrow-batched per partition; expansion factor
    (~n_tokens/stride) must be budgeted in partition sizing, same rule as
    multimodal frame sampling."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, start_tok int, n_toks int, chunk string")
    class ChunkText:
        def eval(self, text: str):  # noqa: D401
            if text is None:
                return
            import re

            # Explicit ASCII whitespace class, NOT str.split(): Python's
            # bare split() also breaks on unicode spaces (NBSP, \x85, ...)
            # that the RE2 oracle regex does not — same dialect-divergence
            # class as Java-vs-RE2 \s (see functions/text.py WS_CLASS).
            toks = [
                x
                for x in re.split("[ \t\n\r\x0b\x0c]+", text.lower())
                if x != ""
            ]
            size, stride = 32, 16  # literals: executor-shipped code must not
            idx = 0                # reference module globals (pickle rule)
            for start in range(0, max(len(toks) - size + 1, 1), stride):
                window = toks[start : start + size]
                yield idx, start, len(window), " ".join(window)
                idx += 1

    d = t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("v_docs_udtf")
    spark.udtf.register("chunk_text", ChunkText)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.start_tok, c.n_toks, c.chunk
        FROM v_docs_udtf d, LATERAL chunk_text(d.text) c
        """
    )


_COS_DIM = 64
_COS_CENTROID = [float((i % 7) - 3) for i in range(_COS_DIM)]  # deterministic


def _cosine_centroid_oracle() -> str:
    lit = "[" + ", ".join(f"{v:.1f}" for v in _COS_CENTROID) + "]"
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
               FROM embeddings),
         c AS (SELECT CAST({lit} AS DOUBLE[]) AS cen)
    SELECT e.vec_id,
           {dot_sql('ev', 'cen')}
             / (sqrt({dot_sql('ev', 'ev')})
                * sqrt({dot_sql('cen', 'cen')})) AS cos_centroid
    FROM e, c
    """


@register("q_pandas_udf_cosine", oracle=_cosine_centroid_oracle())
def q_pandas_udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: cosine of every embedding against a
    fixed centroid, Arrow-batched through numpy — the sanctioned slow-path
    form (per-batch, never per-row).

    Bit-reproducibility: the dot products fold LEFT-TO-RIGHT via cumsum
    (never `m @ c` / np.sum, whose BLAS/pairwise summation reorders
    additions), matching the sequential fold of `dot_sql` / Spark's
    `F.aggregate` — so the Python path hash-matches the DuckDB oracle
    exactly, and tests additionally cross-check it against the pure-JVM
    cosine expression."""
    from pyspark.sql.functions import pandas_udf

    centroid = list(_COS_CENTROID)  # captured by value into the closure

    @pandas_udf("double")
    def cos_to_centroid(col: pd.Series) -> pd.Series:
        c = np.array(centroid, dtype=np.float64)
        cn = np.sqrt((c * c).cumsum()[-1])
        m = np.stack(col.to_numpy()).astype(np.float64)
        dots = (m * c).cumsum(axis=1)[:, -1]  # sequential left fold per row
        norms = np.sqrt((m * m).cumsum(axis=1)[:, -1])
        return pd.Series(dots / (norms * cn))

    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", cos_to_centroid(F.col("embedding")).alias("cos_centroid")
    )
