"""S6/K4 rebuilds: partition-side blob fetching and fixed-size batching.

S6 `download_images` (reference: mmj/utilities/utils.py:67-106) is a
driver-side, one-at-a-time urllib loop writing `{user_id}.jpg`. The
Spark-first shape distributes the I/O to the executors:

  fetch_to_column     mapInPandas: URL column -> content bytes column.
                      The fetched blob becomes data (feeds the
                      multimodal operators) instead of a side-effect.
  download_to_files   foreachPartition side-effecting downloader — the
                      direct S6 analog for when files on shared storage
                      ARE the product.

Both bound per-executor concurrency with a thread pool: fetching is
latency-bound, so a few concurrent requests per partition hide round
trips without hammering the remote (at 1000 executors the aggregate
fan-out is max_concurrency x executors — keep it small).

K4 `chunks` (reference: mmj/utilities/utils.py:109-114) slices a list
into fixed-size batches for API sends. Distributed twin:
`foreach_chunks` streams each partition's iterator in >= size-row
batches through a callback — no partition is ever materialized whole.

Tests exercise file:// URLs (no network in this environment); the code
path is identical for http(s).
"""

from __future__ import annotations

import urllib.request
from collections.abc import Callable, Iterable, Iterator
from concurrent.futures import ThreadPoolExecutor
from itertools import islice

import pandas as pd

from pyspark.sql import DataFrame

DEFAULT_CONCURRENCY = 4
_BLOCK = 8192  # reference's read block size (utils.py:84)


def image_url(env: str, user_id, pic: str) -> str:
    """The reference's public S3 URL template (utils.py:71-73)."""
    return (f"https://wm-mmjmenu-images-{env}.s3.amazonaws.com/"
            f"customers/pictures/{user_id}/large/{pic}")


def _fetch_one(url: str, timeout: float) -> tuple[bytes | None, str | None]:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            parts = []
            while True:
                block = resp.read(_BLOCK)
                if not block:
                    break
                parts.append(block)
            return b"".join(parts), None
    except Exception as exc:  # per-row error, never fails the job
        return None, f"{type(exc).__name__}: {exc}"


def fetch_to_column(df: DataFrame, url_col: str = "url",
                    out_col: str = "content",
                    max_concurrency: int = DEFAULT_CONCURRENCY,
                    timeout: float = 30.0) -> DataFrame:
    """Fetch each row's URL into a binary column (plus an error column).

    Arrow batches stream through mapInPandas; a bounded thread pool per
    batch overlaps request latency. Failed rows carry the error message
    in `{out_col}_error` with NULL content — the caller decides whether
    to filter, retry, or fail.
    """
    fields = ", ".join(f"{n} {t}" for n, t in df.dtypes)
    schema = f"{fields}, {out_col} binary, {out_col}_error string"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                results = list(pool.map(
                    lambda u: _fetch_one(u, timeout), pdf[url_col]))
                out = pdf.copy()
                out[out_col] = [r[0] for r in results]
                out[f"{out_col}_error"] = [r[1] for r in results]
                yield out

    return df.mapInPandas(op, schema=schema)


def download_to_files(df: DataFrame, url_col: str, name_col: str,
                      dest_dir: str,
                      max_concurrency: int = DEFAULT_CONCURRENCY,
                      timeout: float = 30.0) -> None:
    """S6 direct analog: foreachPartition downloader writing
    `{dest_dir}/{name}` per row (the reference writes `{user_id}.jpg`
    to the cwd, utils.py:75). dest_dir must be executor-visible shared
    storage on a real cluster."""
    import os

    url_idx_cols = (url_col, name_col)

    def handle(rows) -> None:
        os.makedirs(dest_dir, exist_ok=True)

        def one(row) -> None:
            content, err = _fetch_one(row[url_idx_cols[0]], timeout)
            if err is None and content is not None:
                with open(os.path.join(
                        dest_dir, str(row[url_idx_cols[1]])), "wb") as fp:
                    fp.write(content)

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            list(pool.map(one, rows))

    df.select(*url_idx_cols).foreachPartition(handle)


def chunks(data, size: int) -> list:
    """K4 verbatim semantics (utils.py:109-114): slice a local sequence
    into size-row batches. Driver-side helper for small payload lists."""
    return [data[i:i + size] for i in range(0, len(data), size)]


def iter_chunks(it: Iterable, size: int) -> Iterator[list]:
    """Lazy batcher over any iterator — constant memory."""
    it = iter(it)
    while True:
        batch = list(islice(it, size))
        if not batch:
            return
        yield batch


def foreach_chunks(df: DataFrame, size: int,
                   fn: Callable[[list], None]) -> None:
    """K4 distributed twin: run `fn(batch)` over every <= size-row chunk
    of every partition (the 'send API data in chunks' pattern). The
    partition iterator is streamed, never collected."""

    def handle(rows) -> None:
        for batch in iter_chunks(rows, size):
            fn(batch)

    df.foreachPartition(handle)
