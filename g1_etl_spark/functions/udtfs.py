"""Python UDTFs — the one UDF shape the rest of the engine doesn't use.

Everything row-wise in this repo compiles to native Column expressions,
grouped/stateful work goes through Arrow (mapInPandas /
applyInPandasWithState), and vector math uses batched pandas_udfs. A
UDTF covers the remaining shape: per-row 1→N STRUCTURED fan-out with
Python logic, lateral-joinable from SQL. The exemplar splits documents
into sentences — the unit most text-dedup / quality pipelines actually
operate on.

Used sparingly by design: a UDTF is row-at-a-time Python (no Arrow
batching in the eval loop), so it belongs on already-reduced data or
genuinely irregular fan-out, never in a wide hot path where
explode(split(...)) stays JVM-side.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[^.!?]+[.!?]*")


@udtf(returnType="sent_idx int, sentence string, n_words int")
class SplitSentences:
    """text -> one row per sentence with its index and word count."""

    def eval(self, text: str):  # noqa: D102 - contract fixed by Spark
        if not text:
            return
        idx = 0
        for m in _SENT_RE.finditer(text):
            sent = m.group(0).strip()
            if not sent:
                continue
            yield idx, sent, len(sent.split())
            idx += 1


def register_udtfs(spark) -> None:
    """Make the UDTFs available to SQL (LATERAL join syntax)."""
    spark.udtf.register("split_sentences", SplitSentences)
