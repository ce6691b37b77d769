"""Adversarial-corpus parity: run every documents-based oracle query over a
small fixture of edge-case strings (control characters, unicode whitespace,
unicode letters, empty / whitespace-only / 1-token docs, NULL text) and
require exact Spark-vs-DuckDB agreement.

This is the local insurance against the regex-dialect divergence class that
caused the round-2 driver hash failures (VERDICT.md "What's wrong" #1-2):
java.util.regex and RE2 disagree on `\\s`/`\\w` (e.g. vertical tab), and the
driver synthesizes its own document text, so any engine-dependent character
class diverges only in the driver environment. With this corpus the
divergence reproduces locally.
"""

from __future__ import annotations

import pytest

from mapreduce_weather_analysis_spark.plans.registry import (
    REGISTRY,
    _import_plans,
)

from .conftest import SMOKE_SF
from .oracle_harness import compare_query

# One string per divergence class. doc_ids are spread over several sources
# so groupBy-source queries see >1 group.
_EDGE_TEXTS = [
    "plain ascii words here",
    "vertical\x0btab",                    # Java \s includes \x0b, RE2 does not
    "form\x0cfeed and\ttabs\nand\rcr",    # the rest of the ASCII ws set
    "nbsp\xa0separated\xa0words",         # unicode space: ws in Python, not in \s
    "next\x85line and thin space",   # NEL + THIN SPACE (unicode ws)
    "zero​width joined",             # ZWSP is NOT whitespace anywhere
    "café naïve résumé",  # latin-1 letters (non-ASCII \w)
    "汉字 mixed with ascii",      # CJK
    "em—dash and “quotes”",  # punctuation outside ASCII
    "MiXeD CaSe WORDS lower",
    "",                                    # empty
    "   ",                                 # spaces only
    "\t\n\x0b\x0c\r ",                    # every ASCII ws char, nothing else
    "one",                                 # 1-token doc
    "a b",                                 # 2 tokens, shorter than shingle n
    "1234 5678 90_ab cd-ef",              # digits, underscore, hyphen
    "dot.dot,comma!bang?q;semi:colon",    # PUNCT_CLASS members, no spaces
    "the the the the the",                # degenerate repetition
    "trailing space ",
    " leading space",
    None,                                  # NULL text
    "a\x0bb c\xa0d e f",             # mixed divergent separators
    "x " * 200,                            # long doc (chunker: multiple chunks)
    "word",                                # duplicate-ish of "one" shape
]


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory, spark):
    """A sf-dir whose documents.parquet is the adversarial corpus; every
    other table symlinks to the smoke SF so multi-table queries still run."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_sf")
    rows = []
    for i, text in enumerate(_EDGE_TEXTS):
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": ["en", "de", "fr", "es"][i % 4],
                "source": f"src{i % 3}",
                "n_chars": len(text) if text is not None else None,
            }
        )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    pq.write_table(table, d / "documents.parquet")
    for name in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{SMOKE_SF}/{name}.parquet", d / f"{name}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_sf):
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{edge_sf}/{name}.parquet')"
        )
    yield con
    con.close()


_import_plans()
_DOC_SPECS = [
    s
    for s in REGISTRY.values()
    if s.oracle is not None and "documents" in s.oracle
]


@pytest.mark.parametrize("spec", _DOC_SPECS, ids=[s.name for s in _DOC_SPECS])
def test_edgecase_parity(spark, edge_duck, edge_sf, spec):
    compare_query(spark, edge_duck, spec, edge_sf)
