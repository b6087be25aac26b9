"""Common-Crawl-style page-table synthesis (BASELINE.json input_hint):
``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string`` — deterministic per row id so the byte-identity invariant
(text per url) is checkable end-to-end.

Small tables come from :func:`synth_pages_table` (driver-side Arrow);
scale testing uses :func:`pages_dataset` which generates the same rows
distributed via ``ray.data.range(n).map_batches`` — no driver
materialization, any size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LANGS = ["en", "de", "fr", "da", "es"]
_WORDS = [
    "data", "stream", "tile", "cell", "join", "page", "crawl", "index",
    "vector", "raster", "batch", "shard", "merge", "query", "grid", "web",
]


# Word j of page k is _WORDS[(k*31 + j*17) % 16] == _WORDS[(15k + j) % 16]:
# a rotation of one fixed 16-word cycle. Precomputing every
# (rotation, word-count) prefix makes row synthesis a table lookup.
_MAX_WORDS = 8 + 63
_TEXT_PREFIX = [
    [" ".join(_WORDS[(rot + j) % len(_WORDS)] for j in range(nw)) for nw in range(_MAX_WORDS + 1)]
    for rot in range(len(_WORDS))
]


def _make_rows(ids: np.ndarray) -> pa.Table:
    ids = np.asarray(ids, dtype=np.int64)
    urls = [f"https://site{int(i) % 1000}.example/{int(i)}" for i in ids]
    nwords = (8 + (ids * 7919) % 64).tolist()
    rots = ((ids * 31) % len(_WORDS)).tolist()
    texts = [_TEXT_PREFIX[r][n] for r, n in zip(rots, nwords)]
    htmls = [f"<html><body>{t}</body></html>".encode() for t in texts]
    langs = [_LANGS[int(i) % len(_LANGS)] for i in ids]
    ts = pa.array(ids * 1_000_000 + 1_704_067_200_000_000, type=pa.timestamp("us"))
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "page_id": pa.array(ids),
        }
    )


def synth_pages_table(n: int, start: int = 0) -> pa.Table:
    """Driver-side deterministic page table (tests / small fixtures)."""
    return _make_rows(np.arange(start, start + n, dtype=np.int64))


def pages_dataset(n: int, override_num_blocks: int | None = None):
    """Distributed deterministic page generation: ``range(n)`` →
    ``map_batches`` — streams at any scale, identical rows to
    :func:`synth_pages_table`."""
    import ray.data as rd

    base = rd.range(n, override_num_blocks=override_num_blocks)

    def _gen(batch: pa.Table) -> pa.Table:
        return _make_rows(batch["id"].to_numpy())

    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)
