"""extract_links vs a Python-re reference, including relative links,
unterminated hrefs, binary html, empty pages and the host-graph →
pagerank composition."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.text import extract_links

PAGES = [
    ("https://a.example/0",
     b'<a href="https://b.example/x">one</a> <a href="/rel">rel</a>'),
    ("https://b.example/1",
     b'<a href="http://a.example:8080/y?q=1#f">y</a>'),
    ("https://c.example/2", b"no links here"),
    ("https://d.example/3", b'<a href="https://unterminated'),
    ("https://e.example/4",
     b'x href="https://b.example/z" mid href="ftp://f.example/w" end'),
    ("https://f.example/5", b""),
]


def _ref():
    rows = []
    for url, html in PAGES:
        for m in re.finditer(r'href="([^"]*)"', html.decode()):
            link = m.group(1)
            hm = re.match(r'^(https?)://([^/"?#]+)', link)
            rows.append((url, link, hm.group(2) if hm else None))
    return rows


def test_extract_links_matches_reference(ray_session):
    ds = rd.from_arrow(pa.table({
        "url": pa.array([p[0] for p in PAGES]),
        "html": pa.array([p[1] for p in PAGES], pa.binary())}))
    got = extract_links(ds).to_pandas()
    want = _ref()
    assert len(got) == len(want)
    got_rows = list(zip(got["url"], got["link"],
                        [None if h is None or h != h else h
                         for h in got["link_host"]]))
    assert sorted(got_rows, key=str) == sorted(want, key=str)
    # unterminated href dropped, ftp link has no http(s) host
    assert "https://unterminated" not in set(got["link"])
    absolute = extract_links(ds, require_scheme=True).to_pandas()
    assert absolute["link_host"].notna().all()
    assert len(absolute) == 3  # b.example/x, a.example:8080/y, b.example/z


def test_extract_links_feed_pagerank(ray_session):
    # host graph → pagerank runs end-to-end on extracted edges
    from buteo_ray.stages.graph import pagerank

    ds = rd.from_arrow(pa.table({
        "url": pa.array([p[0] for p in PAGES]),
        "html": pa.array([p[1] for p in PAGES], pa.binary())}))
    links = extract_links(ds, require_scheme=True)

    def _edges(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        from buteo_ray.stages.dedup import content_hash_column

        src = pc.struct_field(
            pc.extract_regex(t["url"],
                             '^(?P<s>https?)://(?P<host>[^/"?#]+)'),
            "host")
        # pagerank takes int64 nodes: hash the host strings
        return pa.table({
            "src": content_hash_column(pd.Series(src.to_pylist())),
            "dst": content_hash_column(
                pd.Series(t["link_host"].to_pylist()))})

    ranks = pagerank(links.map_batches(_edges, batch_format="pyarrow",
                                       batch_size=None), iters=2)
    df = ranks.to_pandas()
    assert len(df) >= 3 and np.isclose(df["rank"].sum(), 1.0)
