"""Text-analysis operators over the documents/pages table: token
counting, quality scoring, n-gram language ID, fingerprinting. All
vectorized pyarrow.compute / pandas kernels inside ``map_batches``
(stopword tables and compiled state live in an actor pool via
:class:`TextScorer` when used at scale).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

def _set_col(batch: pa.Table, name: str, arr) -> pa.Table:
    """Append-or-replace: composing these stages (e.g. add_quality_score
    after add_token_count, which both derive ``n_tokens``) must not
    create duplicate fields — Ray's schema unification rejects them."""
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, arr)


# Tiny per-language stopword lists (public common words).
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
    "da": ["og", "det", "er", "til", "en", "den", "at", "som", "med", "har"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "con"],
}


def add_token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace token count (single-space split — identical to SQL
    ``len(string_split(text, ' '))``)."""

    def _fn(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch[text_col], " "))
        return _set_col(batch, out_col, n.cast(pa.int64()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def add_quality_score(ds, text_col: str = "text"):
    """Length/word-shape quality heuristics (the web-text analog of the
    reference's scaler statistics, ai/scalers.py):

    - ``n_chars_text``: character length,
    - ``n_tokens``: whitespace tokens,
    - ``mean_token_len``: floor(((n_chars - n_tokens + 1) / n_tokens)
      · 10000 + 0.5) / 10000 — half-up via floor, identical in numpy and
      DuckDB (pc.round is half-even, DuckDB ROUND is half-up; floor
      sidesteps the mismatch). SQL twin in queries.py.
    """

    def _fn(batch: pa.Table) -> pa.Table:
        nchars = pc.utf8_length(batch[text_col]).cast(pa.float64()).to_numpy()
        ntok = pc.list_value_length(pc.split_pattern(batch[text_col], " ")).cast(pa.float64()).to_numpy()
        mean_len = np.floor((nchars - ntok + 1.0) / ntok * 10000.0 + 0.5) / 10000.0
        batch = _set_col(batch, "n_chars_text", pa.array(nchars.astype(np.int64)))
        batch = _set_col(batch, "n_tokens", pa.array(ntok.astype(np.int64)))
        return _set_col(batch, "mean_token_len", pa.array(mean_len))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


class TextScorer:
    """Actor-pool language-ID stage: stopword lookup tables built once per
    actor (``__init__``), batches scored vectorized (``__call__``).

    Heuristic: language = argmax over per-language stopword hit count
    among the document's tokens; ties and zero hits → 'und'.
    """

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = sorted(STOPWORDS)
        lookup: Dict[str, int] = {}
        for li, lang in enumerate(self.langs):
            for w in STOPWORDS[lang]:
                # A stopword shared across languages scores for each; keep
                # one entry per (word) with a bitmask of languages.
                lookup[w] = lookup.get(w, 0) | (1 << li)
        # Parallel arrays for the vectorized pc.index_in probe (built once
        # per actor; no per-token Python dict lookups in __call__).
        words = sorted(lookup)
        self.word_set = pa.array(words, type=pa.string())
        self.word_masks = np.array([lookup[w] for w in words], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(
            pc.utf8_lower(pc.cast(batch[self.text_col], pa.string())), " ")
        flat = pc.list_flatten(toks)
        doc_of = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.fill_null(pc.index_in(flat, value_set=self.word_set), -1)
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        masks = np.where(idx_np >= 0, self.word_masks[np.clip(idx_np, 0, None)], 0)
        n = batch.num_rows
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li in range(len(self.langs)):
            np.add.at(scores[:, li], doc_of, (masks >> li) & 1)
        best = scores.argmax(axis=1)
        top = scores.max(axis=1)
        hit = top > 0
        # Ties are genuinely ambiguous → 'und' (argmax alone would bias
        # toward alphabetically-first languages).
        tied = (scores == top[:, None]).sum(axis=1) > 1
        pred = np.where(hit & ~tied, np.array(self.langs, dtype=object)[best], "und")
        return _set_col(batch, self.out_col, pa.array(pred, type=pa.string()))


def add_lang_pred(ds, concurrency: int | None = None):
    """Language-ID stage (actor pool when ``concurrency`` given)."""
    if concurrency is not None:
        return ds.map_batches(TextScorer, concurrency=concurrency,
                              batch_format="pyarrow", batch_size=None)
    return ds.map_batches(TextScorer(), batch_format="pyarrow", batch_size=None)


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """64-bit deterministic document fingerprint (vectorized siphash)."""

    def _fn(batch: pa.Table) -> pa.Table:
        from buteo_ray.stages.dedup import content_hash_column

        # Arrow-native stage: only the text column converts (the 64-bit
        # siphash kernel lives in pandas); all other columns stay zero-copy.
        h = content_hash_column(batch[text_col].to_pandas())
        return _set_col(batch, out_col, pa.array(h))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def doc_freq(ds, text_col: str = "text", id_col: str = "doc_id",
             k: int = 50):
    """Document frequency: for every token, the number of DISTINCT
    documents containing it; returns the top-``k`` by (n_docs desc,
    token asc) — corpus vocabulary statistics for web-text curation
    (stopword discovery, boilerplate detection, IDF weighting).

    Partial+final plan: all rows of one ``id_col`` value must live in
    one block (true when ids are unique, the documents-table contract —
    re-ingested shards must pre-dedup), so deduping (id, token) pairs
    WITHIN a block and collapsing to per-token partial counts is
    globally exact — only (token, partial n) rows cross the shuffle,
    never token occurrences.
    The final is a token-keyed sum + a k-row sort (the grouped table is
    vocabulary-sized, orders of magnitude below corpus size). Ties are
    impossible across the limit boundary: (n_docs, token) is a total
    order.
    """
    from buteo_ray.stages.aggregate import bucketed_sum

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pairs = pd.DataFrame({"d": ids[parents],
                              "token": flat.to_pandas()}).drop_duplicates()
        vc = pairs["token"].value_counts()
        return pa.table({"token": pa.array(vc.index.to_numpy(), pa.string()),
                         "n_docs": pa.array(vc.to_numpy().astype(np.int64))})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)

    # Token cardinality is unbounded (the whole corpus vocabulary):
    # fold with a bucketed vectorized sum, never one Ray group per token.
    agg = bucketed_sum(partials, ["token"], {"n_docs": "n_docs"})
    return agg.sort(["n_docs", "token"], descending=[True, False]).limit(k)


# (name, RE2 pattern, replacement) — order matters: emails first so the
# ip/phone patterns never fire inside an already-redacted address. RE2
# semantics on BOTH sides of the oracle (Arrow and DuckDB embed RE2), so
# match boundaries are engine-identical.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
]


def pii_scrub(ds, text_col: str = "text", out_col: str = "text",
              count_col: str = "n_redactions"):
    """Redact email / IPv4 / phone-shaped spans (the PII-scrub step of a
    web-corpus curation pipeline, cf. the public C4/Dolma recipes) and
    count redactions per document. Stateless zero-copy Arrow stage: one
    vectorized RE2 pass per pattern (count, then global replace) — no
    per-row Python, scrubbing streams at read speed."""

    def _fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        n = np.zeros(len(t), dtype=np.int64)
        for _, pat, repl in PII_PATTERNS:
            # fill_null: a null text row counts 0 redactions (and stays
            # null through replace) instead of poisoning the int64
            # accumulator with NaN.
            c = pc.fill_null(pc.count_substring_regex(col, pat), 0)
            n += c.cast(pa.int64()).to_numpy(zero_copy_only=False)
            col = pc.replace_substring_regex(col, pat, repl)
        out = _set_col(t, out_col, col)
        return _set_col(out, count_col, pa.array(n))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def rep_ngrams(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Within-document repetition statistics: total and distinct bigram
    counts per document (the Gopher-style duplicate-n-gram quality
    signal — a high ``n_bigrams - n_distinct_bigrams`` gap marks
    boilerplate/spam). Stateless zero-copy Arrow stage: adjacent-token
    bigrams built by one masked vectorized join over the flattened token
    stream (bigrams never cross document boundaries), per-doc counts via
    a grouped nunique. Docs with < 2 tokens report (0, 0)."""

    def _fn(t: pa.Table) -> pa.Table:
        n, nd = bigram_counts(t[text_col])
        return pa.table({id_col: t[id_col],
                         "n_bigrams": pa.array(n),
                         "n_distinct_bigrams": pa.array(nd)})

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def bigram_counts(text_arr) -> "tuple[np.ndarray, np.ndarray]":
    """(total, distinct) adjacent-token bigram counts per row of an
    Arrow string column — the shared kernel behind :func:`rep_ngrams`
    and the training pipeline's repetition gate."""
    toks = pc.split_pattern(text_arr, " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n_rows = len(text_arr)
    out_n = np.zeros(n_rows, dtype=np.int64)
    out_nd = np.zeros(n_rows, dtype=np.int64)
    if len(flat) > 1:
        same = parents[1:] == parents[:-1]
        a = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        b = flat.slice(1).filter(pa.array(same))
        bg = pc.binary_join_element_wise(a, b, " ")
        par = parents[:-1][same]
        g = pd.DataFrame({"p": par, "bg": bg.to_pandas()}).groupby("p")["bg"]
        n = g.size()
        nd = g.nunique()
        out_n[n.index.to_numpy()] = n.to_numpy()
        out_nd[nd.index.to_numpy()] = nd.to_numpy()
    return out_n, out_nd


def chunk_documents(ds, chunk_tokens: int = 128, overlap: int = 16,
                    text_col: str = "text"):
    """Split documents into fixed-size token windows with overlap — the
    context-packing step between curation and tokenization (every chunk
    fits the model context; the overlap keeps boundary sentences learnable).
    Emits every non-text input column (replicated per chunk — ids, lang,
    split labels, scores ride along) plus (chunk_id, chunk,
    n_tokens_chunk); chunk starts step by ``chunk_tokens - overlap`` and
    a start is emitted while it is < the doc's token count, so the final
    chunk may be short.

    Stateless 1→N row explosion inside ``map_batches`` (streams; no
    shuffle). Chunk text is built by ONE vectorized byte gather over the
    Arrow string buffer — token boundaries come from per-token lengths +
    cumsum, never a per-row Python join. An empty text is one token ('')
    and yields one empty chunk, matching SQL string_split semantics.
    """
    if chunk_tokens <= 0 or not (0 <= overlap < chunk_tokens):
        # A negative overlap would be accepted by the naive < check and
        # silently SKIP tokens between windows — data loss, not an error.
        raise ValueError(
            f"need chunk_tokens > 0 and 0 <= overlap < chunk_tokens "
            f"(got {chunk_tokens}, {overlap})")
    step = chunk_tokens - overlap

    def _fn(t: pa.Table) -> pa.Table:
        from buteo_ray.stages.dedup import _utf8_buffer_view

        # fill_null mirrors _utf8_buffer_view (null → "" → one empty
        # chunk) so the token math and the byte buffer agree.
        text = pc.fill_null(t[text_col], "")
        toks = pc.split_pattern(text, " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        # Byte lengths, not codepoint counts: the gather below runs on
        # the raw UTF-8 buffer.
        tok_blens = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        data, doc_starts, _doc_lens = _utf8_buffer_view(text)

        # Byte offset of each token within its doc: global cumsum of
        # (token bytes + 1 separator) reset per doc.
        tok_doc_offs = np.concatenate([[0], np.cumsum(n_tok)])
        gl = np.concatenate([[0], np.cumsum(tok_blens + 1)])
        doc_base = gl[tok_doc_offs[:-1]]
        tok_start = gl[:-1] - np.repeat(doc_base, n_tok)       # per flat token
        tok_end = tok_start + tok_blens

        m = (np.maximum(n_tok - 1, 0) // step) + 1              # chunks per doc
        total = int(m.sum())
        coffs = np.concatenate([[0], np.cumsum(m)])
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(coffs[:-1], m)
        s = chunk_id * step                                     # first token idx
        e = np.minimum(s + chunk_tokens, np.repeat(n_tok, m))   # end token idx
        first_flat = np.repeat(tok_doc_offs[:-1], m) + s
        last_flat = np.repeat(tok_doc_offs[:-1], m) + e - 1
        b_from = tok_start[first_flat] + np.repeat(doc_starts, m)
        b_to = tok_end[last_flat] + np.repeat(doc_starts, m)

        out_lens = b_to - b_from
        tot_b = int(out_lens.sum())
        lo = np.concatenate([[0], np.cumsum(out_lens)])
        idx = (np.arange(tot_b, dtype=np.int64)
               - np.repeat(lo[:-1], out_lens) + np.repeat(b_from, out_lens))
        # py_buffer wraps the gathered array zero-copy (and keeps it
        # alive); .tobytes() here would memcpy the whole chunk payload
        # a second time on this corpus-sized hot path.
        buf = pa.py_buffer(np.ascontiguousarray(data[idx]))
        offs = pa.py_buffer(lo.astype(np.int64))
        chunks = pa.LargeStringArray.from_buffers(total, offs, buf)

        # Carry every non-text payload column (lang, split, scores, even
        # nested types) via one Arrow take on repeated row indices —
        # type-safe replication, no numpy object round-trip.
        base = t.drop_columns([text_col]).take(
            pa.array(np.repeat(np.arange(len(t), dtype=np.int64), m)))
        # _set_col (replace-or-append): re-chunking a corpus that already
        # carries chunk_id/n_tokens_chunk must replace the stale columns,
        # not produce duplicate field names.
        base = _set_col(base, "chunk_id", pa.array(chunk_id))
        base = _set_col(base, "chunk", chunks.cast(pa.string()))
        return _set_col(base, "n_tokens_chunk", pa.array(e - s))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def drop_repeated_paras(ds, para_tokens: int = 16, text_col: str = "text"):
    """Within-document paragraph dedup — the intra-doc repetition
    cleanup of a quality-filtering pipeline (cf. the MassiveText/Gopher
    repetition rules, Rae et al. 2021): segment each document into
    fixed ``para_tokens``-token windows ("paragraphs" — this corpus is
    single-line, so the window stands in for the newline split), drop
    every window whose text already occurred EARLIER IN THE SAME
    document, and reassemble the survivors in order.

    Purely per-block (each document is one row, so dedup and reassembly
    never leave the batch): a 1→1 map with NO shuffle — the scale-ideal
    tier of paragraph dedup (:func:`buteo_ray.stages.dedup
    .dedup_paragraphs` is the corpus-wide two-shuffle tier). Paragraph
    text and the rebuilt document are produced by vectorized byte
    gathers over the Arrow string buffer (the same machinery as
    :func:`chunk_documents`); the only per-string work is one pandas
    ``duplicated`` hash pass, keyed on the actual text so hash
    collisions cannot drop a unique paragraph.

    Output: every input column with ``text_col`` replaced by the
    cleaned text, plus ``n_paras_in`` / ``n_paras_kept``. A document
    always keeps its first paragraph, so no row disappears.
    """
    if para_tokens <= 0:
        raise ValueError(f"need para_tokens > 0 (got {para_tokens})")

    def _fn(t: pa.Table) -> pa.Table:
        from buteo_ray.stages.dedup import _utf8_buffer_view

        text = pc.fill_null(t[text_col], "")
        toks = pc.split_pattern(text, " ")
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        tok_blens = pc.binary_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        data, doc_starts, _doc_lens = _utf8_buffer_view(text)

        # Byte offset of each token within its doc (split semantics:
        # tokens separated by exactly one ' ' byte — ASCII space never
        # appears inside a multi-byte UTF-8 sequence, so byte math is
        # safe on any input).
        tok_doc_offs = np.concatenate([[0], np.cumsum(n_tok)])
        gl = np.concatenate([[0], np.cumsum(tok_blens + 1)])
        doc_base = gl[tok_doc_offs[:-1]]
        tok_start = gl[:-1] - np.repeat(doc_base, n_tok)
        tok_end = tok_start + tok_blens

        m = (np.maximum(n_tok - 1, 0) // para_tokens) + 1  # paras per doc
        total = int(m.sum())
        coffs = np.concatenate([[0], np.cumsum(m)])
        pidx = np.arange(total, dtype=np.int64) - np.repeat(coffs[:-1], m)
        s = pidx * para_tokens
        e = np.minimum(s + para_tokens, np.repeat(n_tok, m))
        first_flat = np.repeat(tok_doc_offs[:-1], m) + s
        last_flat = np.repeat(tok_doc_offs[:-1], m) + e - 1
        b_from = tok_start[first_flat] + np.repeat(doc_starts, m)
        b_to = tok_end[last_flat] + np.repeat(doc_starts, m)

        # Materialize the paragraph strings once (ONE byte gather) —
        # dedup keys on the text itself, so equal-hash-different-text
        # can never drop a unique paragraph.
        plens = b_to - b_from
        plo = np.concatenate([[0], np.cumsum(plens)])
        gidx = (np.arange(int(plo[-1]), dtype=np.int64)
                - np.repeat(plo[:-1], plens) + np.repeat(b_from, plens))
        paras = pa.LargeStringArray.from_buffers(
            total, pa.py_buffer(plo.astype(np.int64)),
            pa.py_buffer(np.ascontiguousarray(data[gidx])))

        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), m)
        keep = ~pd.DataFrame(
            {"d": doc_of, "p": paras.to_pandas()}
        ).duplicated(subset=["d", "p"]).to_numpy()

        # Rebuild each doc from its kept windows. A non-first kept
        # window pulls in the byte before it — always the single ' '
        # separator (kept ⇒ pidx > 0 ⇒ its first token has a space
        # before it) — so the result is exactly the ' '-join.
        kd = doc_of[keep]
        not_first = np.zeros(kd.shape[0], dtype=bool)
        not_first[1:] = kd[1:] == kd[:-1]
        k_from = b_from[keep] - not_first.astype(np.int64)
        klens = b_to[keep] - k_from
        out_doc_lens = np.bincount(
            kd, weights=klens, minlength=len(t)).astype(np.int64)
        out_offs = np.concatenate([[0], np.cumsum(out_doc_lens)])
        klo = np.concatenate([[0], np.cumsum(klens)])
        gidx2 = (np.arange(int(klo[-1]), dtype=np.int64)
                 - np.repeat(klo[:-1], klens) + np.repeat(k_from, klens))
        cleaned = pa.LargeStringArray.from_buffers(
            len(t), pa.py_buffer(out_offs),
            pa.py_buffer(np.ascontiguousarray(data[gidx2])))

        out = _set_col(t, text_col, cleaned.cast(pa.string()))
        out = _set_col(out, "n_paras_in", pa.array(m))
        n_kept = np.bincount(kd, minlength=len(t)).astype(np.int64)
        return _set_col(out, "n_paras_kept", pa.array(n_kept))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def extract_links(ds, html_col: str = "html", url_col: str = "url",
                  require_scheme: bool = False):
    """Outlink extraction — the web-graph edge builder of a crawl
    pipeline: one row per ``href="..."`` target in each page, carrying
    the source ``url_col``, the raw ``link`` and its ``link_host``
    (``scheme://host`` links only; relative links get a null host).

    1→N flat-map inside ``map_batches`` (streams, no shuffle), fully
    vectorized: one ``split_pattern`` on the ``href="`` delimiter, the
    leading non-href fragment of each page masked off by offset
    arithmetic, then one anchored RE2 ``extract_regex`` per batch to
    take the quote-terminated target (an unterminated trailing href is
    dropped, not truncated). Feeds :mod:`buteo_ray.stages.graph`
    (host-level PageRank) and per-domain aggregation.

    ``require_scheme=True`` keeps only absolute http(s) links.
    """

    def _fn(t: pa.Table) -> pa.Table:
        col = t[html_col]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = col.cast(pa.string())
        s = pc.fill_null(col, "")
        frags = pc.split_pattern(s, 'href="')
        nfrag = pc.list_value_length(frags).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(frags)
        parent = pc.list_parent_indices(frags).to_numpy(
            zero_copy_only=False)
        total = len(flat)
        # The first fragment of every page precedes its first href.
        first_idx = np.concatenate([[0], np.cumsum(nfrag)[:-1]])
        keep = np.ones(total, dtype=bool)
        keep[first_idx[nfrag > 0]] = False
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        # Quote-terminated target; null where no closing quote.
        m = pc.extract_regex(flat, '^(?P<link>[^"]*)"')
        link = pc.struct_field(m, "link")
        ok = pc.is_valid(link).to_numpy(zero_copy_only=False)
        link = link.filter(pa.array(ok))
        parent = parent[ok]
        host = pc.struct_field(
            pc.extract_regex(link, '^(?P<s>https?)://(?P<host>[^/"?#]+)'),
            "host")
        src = pc.take(t[url_col], pa.array(parent))
        out = pa.table({url_col: src, "link": link, "link_host": host})
        if require_scheme:
            out = out.filter(pc.is_valid(out["link_host"]))
        return out

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


# Dedup-key text normalization (CCNet-style, Wenzek et al. 2020):
# lowercase, non-alphanumeric runs → one space, collapse spaces, trim.
# RE2 on both engine and oracle; order matters.
TEXT_NORM_RULES = [("[^a-z0-9 ]+", " "), (" +", " ")]


def normalize_text(ds, text_col: str = "text",
                   out_col: str = "text_norm"):
    """Dedup-key normalization: the canonical form documents are
    compared under before exact/near dedup (lowercase → strip
    punctuation → collapse whitespace → trim). Zero-copy Arrow stage,
    one vectorized RE2 pass per rule; the SQL twin chains the identical
    regexes, so normalized keys match byte-for-byte."""

    def _fn(t: pa.Table) -> pa.Table:
        col = pc.utf8_lower(pc.cast(t[text_col], pa.string()))
        for pat, rep in TEXT_NORM_RULES:
            col = pc.replace_substring_regex(col, pat, rep)
        return _set_col(t, out_col, pc.utf8_trim(col, " "))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


# Canonicalization rules (order matters; RE2 on both engine and oracle).
# Scope is deliberately syntactic: fragment, default ports, trailing and
# duplicate slashes — host lowercasing or query-param sorting would need
# per-component parsing and is out of the regex-chain contract.
# Slash rules touch only the PATH: slashes inside a query string are
# significant data, so collapsing them would merge distinct resources
# into one dedup key. RE2 has no lookbehind, so (a) the path-final
# slash is matched in both its forms (before '?' and at end), and
# (b) the duplicate-slash rule anchors at ^ through a query-free
# prefix and is applied _URL_DUP_SLASH_PASSES times (each pass fixes
# one run; runs beyond that are pathological and left as-is).
_URL_DUP_SLASH_PASSES = 8
URL_CANON_RULES = (
    [(r"#.*$", ""),                                   # fragment
     (r"^(http://[^/?#]*?):80([/?]|$)", r"\1\2"),     # http default port
     (r"^(https://[^/?#]*?):443([/?]|$)", r"\1\2"),   # https default port
     (r"^([^?]*?[^:/?])/+(\?|$)", r"\1\2")]           # path-final slash(es)
    + [(r"^([^?]*?[^:?])//+", r"\1/")] * _URL_DUP_SLASH_PASSES
)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "url_canon"):
    """URL canonicalization (the dedup-key normalization step of a
    web-crawl pipeline): strip fragments, default ports, trailing and
    duplicate slashes via a fixed chain of vectorized RE2 replaces —
    identical match semantics in the DuckDB oracle (both embed RE2).
    Zero-copy Arrow stage; ~one regex pass per rule per batch."""

    def _fn(t: pa.Table) -> pa.Table:
        col = pc.cast(t[url_col], pa.string())
        for pat, rep in URL_CANON_RULES:
            col = pc.replace_substring_regex(col, pat, rep)
        return _set_col(t, out_col, col)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


# -------------------------------------------------- char-n-gram LM scoring

_LM_V = float(1 << 24)  # Laplace vocab: all possible packed 3-byte codes


def _char_trigram_codes(texts) -> "tuple[np.ndarray, np.ndarray]":
    """Per-text packed char-trigram codes (b0<<16 | b1<<8 | b2 — injective
    over the UTF-8 bytes, so no hash collisions and a trivially
    SQL-replayable code). Returns (codes, doc_offsets): codes concatenated
    per doc, ``doc_offsets[i]:doc_offsets[i+1]`` slicing doc i's windows.
    Fully vectorized over the concatenated buffer with the shared
    doc-boundary window machinery (dedup._window_indices)."""
    from buteo_ray.stages.dedup import _utf8_buffer_view, _window_indices

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(["" if t is None else t for t in texts],
                      type=pa.string())
    data, starts, lens = _utf8_buffer_view(arr)
    idx, offsets = _window_indices(starts, lens, 3)
    if data.shape[0] < 3 or offsets[-1] == 0:
        return np.empty(0, dtype=np.int64), offsets
    # shifted slices of ONE int64 copy (a sliding_window_view would
    # materialize a (N, 3) int64 matrix — 3× the peak memory)
    d = data.astype(np.int64)
    code = (d[:-2] << 16) | (d[1:-1] << 8) | d[2:]
    return code[idx], offsets


def train_char_lm(ds, text_col: str = "text", max_model: int = 1 << 22):
    """Distributed char-trigram count model over the corpus: per-block
    partial counts cross the shuffle (np.unique per batch — rows never
    do), final groupby-sum, driver materialization of the SMALL model
    table (≤ 2^24 codes total; real web corpora land ~10^4-10^5).
    ``max_model`` caps the table at the most frequent codes
    (deterministic count-desc/code-asc order; dropped codes fall back to
    the unseen-smoothing path in scoring — document the recall trade).
    Returns (codes:int64 sorted, counts:int64, total:float) for
    :func:`add_lm_score` — broadcast it with ray.put, not per-batch."""
    from buteo_ray.stages.aggregate import bucketed_sum

    def _partial(t: pa.Table) -> pa.Table:
        codes, _ = _char_trigram_codes(t[text_col])
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"code": u, "n": c.astype(np.int64)})

    # Distinct trigram codes can reach 2^24 — bucketed vectorized fold,
    # never one Ray group per code.
    # Materialize: three consumers below (sum, count, collect) — unpinned,
    # the whole corpus scan would re-execute per consumer.
    cnt = bucketed_sum(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["code"], {"n": "n"}).materialize()
    # total BEFORE any cap: the denominator is the true corpus mass.
    tot = cnt.sum("n")
    if cnt.count() > max_model:
        cnt = cnt.sort(["n", "code"], descending=[True, False]).limit(max_model)
    pdf = cnt.to_pandas()
    order = np.argsort(pdf["code"].to_numpy())
    return (pdf["code"].to_numpy()[order].astype(np.int64),
            pdf["n"].to_numpy()[order].astype(np.int64), float(tot or 0))


def add_lm_score(ds, model, text_col: str = "text",
                 out_col: str = "lm_logp"):
    """Per-doc mean log2 trigram probability under a
    :func:`train_char_lm` model with Laplace smoothing
    (``(c + 1) / (total + 2^24)``) — the CCNet-style LM quality signal
    for perplexity bucketing, without an external model artifact.
    Scores are floor-rounded at 1e-6 (summation-order tolerance; the
    DuckDB oracle averages in a different order). Docs with no trigram
    (< 3 bytes) score 0.0. ``model`` may be a ray ObjectRef (broadcast
    once per worker) or the raw (codes, counts, total) triple."""
    import ray as _ray

    def _fn(t: pa.Table) -> pa.Table:
        m = _ray.get(model) if isinstance(model, _ray.ObjectRef) else model
        codes, counts, total = m
        dc, offsets = _char_trigram_codes(t[text_col])
        if len(codes) and len(dc):
            pos = np.clip(np.searchsorted(codes, dc), 0, len(codes) - 1)
            c = np.where(codes[pos] == dc, counts[pos], 0)
        else:
            c = np.zeros(len(dc), dtype=np.int64)
        logp = np.log2((c + 1.0) / (total + _LM_V))
        n_win = np.diff(offsets)
        if len(logp):
            # 0.0 sentinel so a trailing windowless doc's offset
            # (== len(logp)) stays a VALID reduceat index — clipping to
            # len-1 instead would move the previous doc's segment end
            # and drop its final trigram from the sum
            sums = np.add.reduceat(np.append(logp, 0.0),
                                   offsets[:-1])[:len(n_win)]
        else:
            sums = np.zeros(len(n_win))
        # reduceat repeats the NEXT segment's value for empty segments
        mean = np.where(n_win > 0, sums / np.maximum(n_win, 1), 0.0)
        mean = np.floor(mean * 1e6 + 0.5) / 1e6
        return _set_col(t, out_col, pa.array(mean, type=pa.float64()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Benchmark decontamination (word-n-gram overlap against an eval set)

_GRAM_P = np.uint64(1099511628211)  # FNV prime, the engine-wide poly base


def _doc_ngram_hashes(texts, n: int) -> "tuple[np.ndarray, np.ndarray]":
    """(gram_hashes:uint64, doc_offsets) — word-``n``-gram hashes per
    doc. Tokenization is the engine-wide single-space rule (pandas
    ``str.split(' ')`` — empties kept, null → ''), identical to
    :func:`~buteo_ray.stages.dedup.simhash64`, so an n-gram string is
    exactly ``' '.join(tokens[i:i+n])`` and the DuckDB twin can compare
    gram STRINGS (tokens cannot contain spaces → the join is injective;
    no hash replay needed, overlap COUNTS are hash-invariant). Token
    hashes come from :func:`~buteo_ray.stages.dedup._token_polyhash`;
    the n-gram combine is the same FNV polynomial over token hashes."""
    from buteo_ray.stages.dedup import _token_polyhash, _window_indices

    texts = pd.Series(
        ["" if t is None else t for t in
         (texts.to_pylist() if isinstance(texts, (pa.Array, pa.ChunkedArray))
          else texts)], dtype=object)
    tokens = texts.str.split(" ")
    n_tok = tokens.str.len().to_numpy().astype(np.int64)
    th = _token_polyhash(tokens.explode().to_numpy())
    starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]]).astype(np.int64)
    idx, doc_offsets = _window_indices(starts, n_tok, n)
    if not len(idx):
        return np.empty(0, dtype=np.uint64), doc_offsets
    g = th[idx].copy()
    for k in range(1, n):
        g = g * _GRAM_P + th[idx + k]
    return g, doc_offsets


def eval_ngram_hashes(eval_ds, n: int = 8, text_col: str = "text",
                      max_grams: int = 1 << 26) -> np.ndarray:
    """Sorted distinct word-n-gram hashes of the eval/benchmark side,
    ready for one ``ray.put`` broadcast. Per-batch distinct runs
    distributed; only the UNIQUE gram set reaches the driver — bounded
    by construction because benchmark suites are megabytes BY NATURE
    (the corpus is the 100-TB side, never this one). ``max_grams``
    enforces that contract; past it, swap the exact set for a Bloom
    filter (same broadcast + map-side probe, probabilistic instead of
    exact — the documented scale hatch, not the default)."""

    import ray

    def _partial(t: pa.Table) -> pa.Table:
        g, _ = _doc_ngram_hashes(t[text_col], n)
        return pa.table({"g": np.unique(g)})

    from buteo_ray.stages.aggregate import nonempty_arrow_blocks

    arrs = [t["g"].to_numpy(zero_copy_only=False)
            for t in nonempty_arrow_blocks(
                eval_ds.map_batches(_partial, batch_format="pyarrow",
                                    batch_size=None))]
    if not arrs:
        return np.empty(0, dtype=np.uint64)
    ev = np.unique(np.concatenate(arrs).astype(np.uint64))
    if len(ev) > max_grams:
        raise ValueError(
            f"eval n-gram set ({len(ev)}) exceeds max_grams ({max_grams}); "
            "use a Bloom filter for a corpus-sized 'eval' side")
    return ev


def _probe_counts(t: pa.Table, n: int, text_col: str, probe) -> np.ndarray:
    """Per-row count of DISTINCT word-n-gram hashes accepted by
    ``probe(gu) -> bool[]`` — the ONE dedup kernel (lexsort +
    first-mask + bincount) every membership variant shares, so a fix
    here cannot diverge between the exact and Bloom paths."""
    g, off = _doc_ngram_hashes(t[text_col], n)
    n_doc = len(t)
    cnt = np.zeros(n_doc, dtype=np.int64)
    if len(g):
        di = np.repeat(np.arange(n_doc, dtype=np.int64), np.diff(off))
        order = np.lexsort((g, di))
        gs, ds_ = g[order], di[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])
        gu, du = gs[first], ds_[first]
        hit = probe(gu)
        cnt = np.bincount(du[hit], minlength=n_doc).astype(np.int64)
    return cnt


def _overlap_counts(t: pa.Table, ev: np.ndarray, n: int,
                    text_col: str) -> np.ndarray:
    """Per-row count of DISTINCT word-n-gram hashes present in the
    sorted eval array ``ev`` (exact membership via one searchsorted)."""
    if not len(ev):
        return np.zeros(len(t), dtype=np.int64)

    def _probe(gu: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(ev, gu)
        return (pos < len(ev)) & (ev[np.minimum(pos, len(ev) - 1)] == gu)

    return _probe_counts(t, n, text_col, _probe)


def ngram_overlap(docs_ds, eval_grams, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Per-document count of DISTINCT word n-grams present in the eval
    set → Dataset[(id_col, n_overlap:int64)], docs with ≥1 hit only
    (clean docs — the overwhelming majority — emit nothing).

    ``eval_grams``: sorted uint64 hashes from :func:`eval_ngram_hashes`,
    or a ``ray.ObjectRef`` of them (put ONCE, read per task — never
    re-shipped per batch). The probe is one searchsorted per batch."""
    import ray

    ref = eval_grams if isinstance(eval_grams, ray.ObjectRef) \
        else ray.put(np.asarray(eval_grams, dtype=np.uint64))

    def _fn(t: pa.Table) -> pa.Table:
        cnt = _overlap_counts(t, ray.get(ref), n, text_col)
        keep = np.nonzero(cnt > 0)[0]
        ids = t[id_col].combine_chunks().take(pa.array(keep))
        return pa.table({id_col: ids.cast(pa.int64()),
                         "n_overlap": pa.array(cnt[keep])})

    return docs_ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def decontaminate(docs_ds, eval_ds, n: int = 8, min_overlap: int = 1,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Drop training documents whose word-n-gram overlap with the
    eval/benchmark set reaches ``min_overlap`` (the standard
    train/test decontamination step). One broadcast of the eval gram
    set, one streaming pass over the corpus — no shuffle, no join."""
    import ray

    ref = ray.put(eval_ngram_hashes(eval_ds, n=n, text_col=text_col))

    def _fn(t: pa.Table) -> pa.Table:
        cnt = _overlap_counts(t, ray.get(ref), n, text_col)
        return t.filter(pa.array(cnt < min_overlap))

    return docs_ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def term_frequencies(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact per-document term frequencies: (id, token, tf) rows via one
    vectorized tokenize + grouped count per block. Exact without any
    shuffle because every document is ONE input row, so all of a doc's
    tokens land in the same block (the documents-table contract shared
    with :func:`doc_freq`). Streams — a pure 1→N row explosion."""

    def _tf(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t[text_col], ""), " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"d": ids[parents], "token": flat.to_pandas()})
             .groupby(["d", "token"], sort=False).size().reset_index(name="tf"))
        return pa.table({id_col: pa.array(g["d"].to_numpy(), pa.int64()),
                         "token": pa.array(g["token"].to_numpy(), pa.string()),
                         "tf": pa.array(g["tf"].to_numpy().astype(np.int64))})

    return ds.map_batches(_tf, batch_format="pyarrow", batch_size=None)


def tf_idf_topk(ds, n_docs: int, text_col: str = "text",
                id_col: str = "doc_id", k: int = 3):
    """Per-document top-``k`` terms by TF-IDF — the keyword-extraction /
    salient-term step of a web-corpus curation pipeline (topic tagging,
    boilerplate discovery, per-domain vocabulary audits).

    score = tf · idf_q, idf_q = round6(ln(n_docs / df)); the idf is
    quantized to 1e-6 BEFORE the multiply so the only cross-engine
    libm-ulp exposure is one rounding per DISTINCT df value (≤ |vocab|),
    not one per (doc, token) pair — the float discipline established by
    the char-LM scorer. The final score is round4-quantized and top-k
    selection orders by (tfidf desc, token desc): a total order per doc,
    so the k-boundary is deterministic on both engines.

    Plan (all-streaming, two exchanges, both vocabulary-sized or
    skinnier):
      1. ``term_frequencies`` — per-block exact (id, token, tf), no
         shuffle.
      2. document frequency: per-block partial token counts (the (id,
         token) rows are already distinct, so a row count IS the
         distinct-doc count) → ``bucketed_sum`` — only (token, partial
         n) rows cross the exchange.
      3. ``hash_join_auto`` tf ⋈ df on token — the df side is
         vocabulary-sized (orders below corpus size), so it broadcasts
         under the 64 MB gate and falls back to the hash-partitioned
         join beyond it.
      4. score + ``topk_per_group`` (partial per-block top-k combiner:
         ≤ k rows per doc per block cross the final exchange).
    The tf stage executes twice (feeding the df fold and the join's left
    side) — deliberate recompute-over-pin: materializing the tf table
    would hold a corpus-scale intermediate in the object store, while
    re-tokenizing is a cheap vectorized pass.

    ``n_docs`` is the corpus document count — callers hold it from a
    metadata-only ``ds.count()`` on the raw read; taking it as a
    parameter keeps this stage lazy end-to-end.
    """
    from buteo_ray.stages.aggregate import bucketed_sum
    from buteo_ray.stages.join_partitioned import hash_join_auto
    from buteo_ray.stages.selection import topk_per_group

    tf = term_frequencies(ds, text_col=text_col, id_col=id_col)

    def _df_partial(t: pa.Table) -> pa.Table:
        vc = t["token"].to_pandas().value_counts()
        return pa.table({"token": pa.array(vc.index.to_numpy(), pa.string()),
                         "df": pa.array(vc.to_numpy().astype(np.int64))})

    df = bucketed_sum(
        tf.map_batches(_df_partial, batch_format="pyarrow", batch_size=None),
        ["token"], {"df": "df"})

    joined = hash_join_auto(tf, df, "token", "token")

    def _score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log(float(n_docs) / dfv)
        idf = np.floor(idf * 1e6 + 0.5) / 1e6
        s = np.floor(tfv * idf * 10000.0 + 0.5) / 10000.0
        return pa.table({id_col: t[id_col], "token": t["token"],
                         "tfidf": pa.array(s)})

    scored = joined.map_batches(_score, batch_format="pyarrow",
                                batch_size=None)
    return topk_per_group(scored, id_col, ["tfidf", "token"], k)


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the eval_ngram_hashes scale hatch)

def bloom_from_hashes(hashes: np.ndarray, m_bits: int = 1 << 23,
                      num_hashes: int = 4) -> np.ndarray:
    """Packed Bloom filter (uint64[m_bits/64]) over uint64 element
    hashes. Position i = splitmix64(h + i·golden) % m — k independent
    derived positions per element, all vectorized. m_bits must be a
    multiple of 64. False-positive rate ≈ (1 - e^(-k·n/m))^k; at the
    defaults (1 MiB filter, k=4) a 10⁶-gram eval set sits under 3 %."""
    from buteo_ray.stages.dedup import _splitmix64

    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    h = np.asarray(hashes, dtype=np.uint64)
    for i in range(num_hashes):
        # Python-int modular multiply: numpy's uint64 SCALAR product
        # warns on wraparound (the vector op doesn't).
        salt = np.uint64((i * 0x9E3779B97F4A7C15) % (1 << 64))
        pos = _splitmix64(h + salt) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bits


def bloom_probe_hashes(bits: np.ndarray, hashes: np.ndarray,
                       num_hashes: int = 4) -> np.ndarray:
    """bool per hash: all ``num_hashes`` derived bits set (possible
    member) — false positives possible, false negatives impossible."""
    from buteo_ray.stages.dedup import _splitmix64

    m_bits = np.uint64(len(bits) * 64)
    h = np.asarray(hashes, dtype=np.uint64)
    hit = np.ones(len(h), dtype=bool)
    for i in range(num_hashes):
        salt = np.uint64((i * 0x9E3779B97F4A7C15) % (1 << 64))
        pos = _splitmix64(h + salt) % m_bits
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= ((word >> (pos & np.uint64(63))) & np.uint64(1)) \
            .astype(bool)
    return hit


def bloom_decontaminate(docs_ds, eval_ds, n: int = 8,
                        min_overlap: int = 1, m_bits: int = 1 << 23,
                        num_hashes: int = 4, text_col: str = "text"):
    """Bloom-filter variant of :func:`decontaminate` — the documented
    scale hatch of :func:`eval_ngram_hashes` for when the eval side's
    DISTINCT gram set outgrows an exact broadcast array: the broadcast
    becomes a FIXED-SIZE bit array (1 MiB at the default m=2²³)
    regardless of eval-set size.

    One-sided error, conservative in the safe direction: the probe has
    NO false negatives, so every document the exact path would drop is
    dropped here too (decontamination still guaranteed); bit collisions
    can additionally drop clean documents at the per-GRAM false-positive
    rate — acceptable loss on a 100-TB corpus, never acceptable leakage.
    Pytests pin drops ⊇ exact drops and the measured FP rate against
    the (1-e^(-kn/m))^k bound."""
    import ray

    ev = eval_ngram_hashes(eval_ds, n=n, text_col=text_col)
    ref = ray.put(bloom_from_hashes(ev, m_bits=m_bits,
                                    num_hashes=num_hashes))

    def _fn(t: pa.Table) -> pa.Table:
        bits = ray.get(ref)
        cnt = _probe_counts(
            t, n, text_col,
            lambda gu: bloom_probe_hashes(bits, gu, num_hashes))
        return t.filter(pa.array(cnt < min_overlap))

    return docs_ds.map_batches(_fn, batch_format="pyarrow",
                               batch_size=None)


def prune_frequent_tokens(ds, id_col: str = "doc_id",
                          text_col: str = "text", sep: str = " ",
                          phi: float | None = None,
                          min_count: int | None = None,
                          max_frequent: int = 1 << 20):
    """Corpus-frequency token pruning — the C4-style frequent-line
    dedup machinery with a caller-chosen separator: split every
    document on ``sep``, find the segments whose CORPUS-WIDE count
    reaches a threshold, drop those segments from every document, and
    reassemble. With ``sep='\\n'`` this is exactly C4's repeated-line
    removal (Raffel et al. 2020 §2.2, boilerplate nav/footer lines);
    with ``sep=' '`` it is corpus-frequency vocabulary pruning.

    The frequent set is found by :func:`~buteo_ray.stages.sketch.heavy_hitters`
    — EXACT counts behind a hashed-bucket prefilter, O(buckets) driver
    state — and is bounded by construction: at most ``total_segments /
    threshold`` (≤ 1/phi) segments can reach the threshold, so the
    broadcast is ≤ ``1/phi`` strings regardless of corpus size
    (``max_frequent`` is the loud guard on that invariant, not a
    silent cap). The rewrite pass is a single stream: Arrow
    ``split_pattern`` → flat values + offsets, one ``np.isin`` against
    the sorted frequent array, ``np.add.reduceat`` for per-doc kept
    counts, rebuilt ``ListArray`` → ``binary_join``. Set membership is
    on the SEGMENT STRINGS themselves (the hashes only prefilter), so
    collisions cannot drop an innocent segment.

    ``ds`` is consumed three times (two heavy-hitter passes + the
    rewrite) — it is lazy, so materialize upstream first if it is
    expensive. Rows with a null ``id_col`` or ``text_col`` are dropped
    (SQL: unnest/aggregation skip them). Returns
    Dataset[(id_col, n_tokens:int64, n_kept:int64, clean_text:string)].
    """
    from buteo_ray.stages.sketch import heavy_hitters

    if (phi is None) == (min_count is None):
        raise ValueError("pass exactly one of phi= / min_count=")

    def _valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t[id_col]),
                                pc.is_valid(t[text_col])))

    docs = ds.map_batches(_valid, batch_format="pyarrow", batch_size=None)

    def _tokens(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(t[text_col], pattern=sep))
        return pa.table({"tok": toks})

    tok_ds = docs.map_batches(_tokens, batch_format="pyarrow",
                              batch_size=None)
    freq = heavy_hitters(tok_ds, "tok", threshold=min_count, phi=phi)
    freq_df = freq.to_pandas()  # bounded: <= total/threshold segments
    if len(freq_df) > max_frequent:
        raise ValueError(
            f"frequent-segment set has {len(freq_df)} entries > "
            f"max_frequent={max_frequent} — threshold too low for this "
            "corpus; raise phi/min_count or max_frequent")
    frequent = np.sort(freq_df["tok"].to_numpy())

    import ray
    freq_ref = ray.put(frequent)  # ship once, read per task

    def _rewrite(t: pa.Table) -> pa.Table:
        fr = ray.get(freq_ref)
        lists = pc.split_pattern(t[text_col], pattern=sep)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = lists.values.to_numpy(zero_copy_only=False)
        # .values is the FULL buffer — rebase when the array is a slice
        vals = vals[offs[0]:offs[-1]]
        offs = offs - offs[0]
        keep = ~np.isin(vals, fr)
        n_tok = np.diff(offs)
        # per-doc kept counts; reduceat misbehaves on empty slices
        # (repeated/equal indices return x[i], out-of-range raises) —
        # clamp the indices and mask zero-token docs after. split
        # never yields a zero-token list ('' -> ['']), so this only
        # triggers on degenerate inputs.
        if len(vals):
            idx = np.minimum(offs[:-1], len(vals) - 1)
            kept = np.add.reduceat(keep.astype(np.int64), idx)
            kept[n_tok == 0] = 0
        else:
            kept = np.zeros(len(n_tok), dtype=np.int64)
        new_offs = np.concatenate(
            [[0], np.cumsum(kept)]).astype(np.int32)
        new_vals = pa.array(vals[keep], pa.string())
        new_lists = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), new_vals)
        clean = pc.binary_join(new_lists, sep)
        return pa.table({id_col: t[id_col],
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_kept": pa.array(kept, pa.int64()),
                         "clean_text": clean})

    return docs.map_batches(_rewrite, batch_format="pyarrow",
                            batch_size=None)


def pack_sequences(ds, token_col: str = "n_tokens",
                   id_col: str = "doc_id", budget: int = 4096,
                   shard_col: str = "shard", mode: str = "cumsum",
                   bin_col: str = "bin",
                   num_buckets: Optional[int] = None):
    """Sequence packing for pretraining output: assign every document
    a BIN of ≈ ``budget`` tokens within its shard, so a downstream
    reader concatenates one bin per training sequence (the
    chunk → pack → shard tail of a token pipeline). Documents are
    packed in ``id_col`` order within each shard — deterministic and
    partition-independent, so a resumed run reproduces every bin.

    ``mode="cumsum"`` (default, the scale path): bin =
    (running_tokens − own_tokens) // budget — the SQL-window contract,
    one vectorized sort+cumsum per hash bucket. A bin may overrun by
    less than one document (the doc that crosses the boundary belongs
    to the bin it started in); an over-budget document occupies its
    bin(s) alone.
    ``mode="greedy"``: exact sequential fill — a new bin opens when
    adding the document would exceed ``budget`` (no overrun except
    single docs over budget). Per-shard SEQUENTIAL Python loop — exact
    but not vectorizable; use cumsum at scale (documented trade).

    Returns the input rows + ``bin_col`` (int64, shard-scoped).
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if mode not in ("cumsum", "greedy"):
        raise ValueError(f"unknown mode {mode!r}")

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([shard_col, id_col], kind="stable")
             .reset_index(drop=True))
        if g[shard_col].isna().any():
            # a null shard would split per-row in greedy mode (NaN !=
            # NaN) but group in cumsum mode (dropna=False) — fail loud
            # instead of mode-dependent bins
            raise ValueError(
                f"pack_sequences: null shard values in '{shard_col}'")
        n = g[token_col].to_numpy()
        if pd.isna(n).any():
            raise ValueError(
                f"pack_sequences: null token counts in '{token_col}'")
        n = n.astype(np.int64)
        if mode == "cumsum":
            cs = (g.groupby(shard_col, sort=False, dropna=False)
                  [token_col].cumsum().to_numpy().astype(np.int64))
            bins = (cs - n) // budget
        else:
            bins = np.empty(len(g), np.int64)
            shard_vals = g[shard_col].to_numpy()
            start = 0
            for i in range(1, len(g) + 1):
                if i == len(g) or shard_vals[i] != shard_vals[start]:
                    b = fill = 0
                    for j in range(start, i):
                        if fill and fill + n[j] > budget:
                            b += 1
                            fill = 0
                        fill += n[j]
                        bins[j] = b
                    start = i
        g = g.copy()
        g[bin_col] = bins
        return g

    return bucketed_fold(ds, [shard_col], _fold, num_buckets)


# BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct/space
# classes, rewritten without lookahead so it is pure RE2 — the dialect
# BOTH Arrow's count_substring_regex and DuckDB's regexp_* use, which
# is what makes the SQL oracle exact).
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[[:alpha:]]+"
    r"| ?[[:digit:]]+"
    r"| ?[^\s[:alpha:][:digit:]]+"
    r"|\s+"
)


def add_regex_token_count(ds, text_col: str = "text",
                          out_col: str = "n_tokens_re",
                          pattern: str = BPE_TOKEN_PATTERN):
    """BPE-style regex token count (the task brief's 'whitespace + a
    BPE-ish regex' counting pair — whitespace lives in
    :func:`add_token_count`): non-overlapping RE2 matches of
    ``pattern`` per document, one vectorized
    ``pc.count_substring_regex`` per batch. The pattern is compiled
    once inside Arrow's kernel; no per-row Python."""

    def _fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch[text_col], pattern)
        return _set_col(batch, out_col, n.cast(pa.int64()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)
