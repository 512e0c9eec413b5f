"""Boilerplate-wrap of the driver's ``documents`` table → extraction input.

Gives the HTML main-content extractor a DuckDB-checkable oracle: each
document's plain text is deterministically wrapped in boilerplate HTML
(nav/header/sidebar/footer link farms keyed on doc_id), extracted by the
full kernel path, and the recovered markdown must equal the original text
byte-for-byte — i.e. the oracle SQL is simply ``SELECT doc_id, text``.

This is the engine's flagship query (`entry()`): a real scan of the
driver's parquet, a pandas-UDF wrap, the production extraction kernel, and
an exact-equality contract, end to end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..kernels.html_extract import extract_html, blocks_to_md


def wrap_doc_html(doc_id: int, text: str) -> str:
    """Deterministic boilerplate wrap (pure function of doc_id)."""
    k = int(doc_id)
    nav = "".join(f'<li><a href="/n/{k}/{i}">site link {k % 7} {i}</a></li>'
                  for i in range(4 + k % 4))
    side = "".join(f'<li><a href="/s/{k}/{i}">related {(k + i) % 9}</a></li>'
                   for i in range(3 + k % 3))
    return (
        "<html><head><title>doc</title><style>p{margin:0}</style>"
        "<script>track();</script></head><body>"
        f"<nav><ul>{nav}</ul></nav>"
        f"<header><a href='/'>home</a> breadcrumb {k % 5}</header>"
        f"<div class='sidebar'><ul>{side}</ul></div>"
        f"<article><p>{text}</p></article>"
        f"<footer>© footer <a href='/t'>terms</a> <a href='/p'>privacy</a></footer>"
        "</body></html>"
    )


_WRAP_EXTRACT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("md", T.StringType(), True),
    T.StructField("n_blocks", T.IntegerType(), True),
    T.StructField("boilerplate_dropped", T.IntegerType(), True),
])


def _wrap_extract(batches):
    for pdf in batches:
        mds, nb, bp = [], [], []
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            blocks, metrics = extract_html(wrap_doc_html(did, text))
            mds.append(blocks_to_md(blocks))
            nb.append(metrics["blocks_classified"])
            bp.append(metrics["boilerplate_dropped"])
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "md": mds,
            "n_blocks": pd.Series(nb, dtype="int32"),
            "boilerplate_dropped": pd.Series(bp, dtype="int32"),
        })


def extract_wrapped_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline import _tune_session_for_payloads, spread_scan
    _tune_session_for_payloads(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    # single-row-group source: the whole Python extraction would run in
    # ONE task without the spread (measured 2.5s -> 0.9s at local[32])
    return spread_scan(docs).mapInPandas(_wrap_extract,
                                         schema=_WRAP_EXTRACT_SCHEMA)


def roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md must byte-equal the source text (oracle: SELECT doc_id, text)."""
    return (extract_wrapped_documents(spark, sf_dir)
            .select("doc_id", F.col("md"))
            .orderBy("doc_id"))
