"""Python UDF surfaces the builtin operators can't express: a table
function (UDTF, 1→N row expansion with Python logic) and a vectorized
scalar pandas UDF — completing the UDF/UDAF/UDTF row of SURVEY.md §2.2.

Both are rows-only for the driver (Python has no SQL twin); tests
cross-validate the pandas-UDF scorer against the pure-JVM cosine path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, t


@register("q_udtf_chunk_text", oracle=None)
def q_udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: split each document into overlapping fixed-size token
    chunks (the LLM-context chunking primitive) — one input row fans out to
    N chunk rows with positions. Lateral-joined per document row.

    Scale: the UDTF runs Arrow-batched per partition; expansion factor
    (~n_tokens/stride) must be budgeted in partition sizing, same rule as
    multimodal frame sampling."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, start_tok int, n_toks int, chunk string")
    class ChunkText:
        def eval(self, text: str):  # noqa: D401
            if text is None:
                return
            toks = text.lower().split()
            size, stride = 32, 16
            idx = 0
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


@register("q_pandas_udf_cosine", oracle=None)
def q_pandas_udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: cosine of every embedding against a
    fixed centroid, Arrow-batched through numpy — the sanctioned slow-path
    form (per-batch, never per-row). Tests assert it matches the pure-JVM
    expression path within float tolerance (numpy's pairwise summation
    reorders additions, so bitwise equality is impossible by design —
    which is exactly why the JVM path is the oracle-checked one)."""
    from pyspark.sql.functions import pandas_udf

    dim = 64
    centroid = [float((i % 7) - 3) for i in range(dim)]  # fixed, deterministic

    @pandas_udf("double")
    def cos_to_centroid(col: pd.Series) -> pd.Series:
        c = np.array(centroid, dtype=np.float64)
        cn = np.linalg.norm(c)
        m = np.stack(col.to_numpy()).astype(np.float64)
        dots = m @ c
        norms = np.linalg.norm(m, axis=1)
        return pd.Series(dots / (norms * cn))

    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", cos_to_centroid(F.col("embedding")).alias("cos_centroid")
    )
