"""Inline crawl-time text curation — the crawl/curation fusion every
large-scale training-data pipeline runs in production (C4/CCNet/Gopher
style): language ID, token counts and quality features are computed in the
SAME worker task that parsed the page, while the text is already hot in
that worker's memory, and land as extra columns on the ``rec=t`` checkpoint
rows. The alternative — a separate curation pass — re-reads every text
byte from the checkpoint, which at 10^8 pages/wave doubles the crawl's
byte movement for features that cost microseconds once the text is in
cache.

The feature set reuses the standalone operators from
``functions/textstats.py`` (same math, same driver-query oracles), so a
curated crawl's columns are independently verifiable: recompute them from
``CrawlRun.texts()`` with the standalone functions and compare
(tests/test_curate.py does exactly that).

Shape notes for the three fetch paths:
- fetch-service / small-wave task paths write per-rec slices, so curation
  appends columns to the ``rec=t`` slice only (``curate_text_table``);
- the streaming Dataset path writes one mixed-rec table per block, so
  curation computes on the ``rec=='t'`` rows and scatters with nulls
  elsewhere (``curate_table``) — Arrow ``take`` with null indices makes
  the scatter vectorized, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textstats as ts

#: appended to rec=t rows (null on other rec types in mixed-rec blocks) —
#: the Gopher/C4-style crawl-time signal set: language, token volume,
#: quality ratios, repetition signals, and a winnowing content fingerprint
#: (the downstream exact/near-dup join key, computed while the text is hot)
CURATE_FIELDS = (
    ("lang", pa.string()),
    ("ws_tokens", pa.int64()),
    ("bpe_tokens", pa.int64()),
    ("n_words", pa.int64()),
    ("punct_ratio", pa.float64()),
    ("stopword_ratio", pa.float64()),
    ("dup_line_char_ratio", pa.float64()),
    ("top_bigram_ratio", pa.float64()),
    ("fingerprint", pa.uint64()),
    ("min_gram_hash", pa.uint64()),
)

_LANGID = None


def _langid() -> "ts.LangId":
    """Per-process LangId singleton: profile build is the stateful setup
    (the actor-pool ``__init__`` analog for plain-task call sites)."""
    global _LANGID
    if _LANGID is None:
        _LANGID = ts.LangId()
    return _LANGID


#: crawl-time signals are computed over the first SAMPLE_CHARS of each
#: text — the operating point of production inline curation (language
#: detectors and quality gates sample the head; CLD2/fastText default to
#: the first few KB). Full-document signals remain available as the
#: standalone operators in functions/textstats.py; the curated columns'
#: truth model (tests/test_curate.py) applies the same sample. Without a
#: cap, a 15 KB page costs ~12 ms of per-doc signal math and the inline
#: stage stops being "microseconds while the text is hot" — the cap keeps
#: curation compute bounded per PAGE, not per byte.
SAMPLE_CHARS = 4096


def curate_columns(texts: "pa.Array | pa.ChunkedArray") -> pa.Table:
    """CURATE_FIELDS columns for a text array (one row per text), computed
    over the first ``SAMPLE_CHARS`` of each text (head sample, see above)."""
    texts = pc.utf8_slice_codeunits(texts, 0, SAMPLE_CHARS)
    tmp = pa.table({"text": texts})
    tmp = ts.token_counts(tmp)
    tmp = ts.quality_scores(tmp)
    tmp = ts.repetition_scores(tmp)
    tmp = ts.fingerprints(tmp)
    tmp = _langid()(tmp)
    cols = {"lang": tmp["pred_lang"]}
    for name, _typ in CURATE_FIELDS[1:]:
        cols[name] = tmp[name]
    return pa.table(cols)


def curate_text_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Append curation columns to a table whose every row is a text row
    (the per-rec write paths hand us the already-filtered rec=t slice)."""
    cur = curate_columns(t[text_col])
    for name, _typ in CURATE_FIELDS:
        t = t.append_column(name, cur[name])
    return t


def curate_table(t: pa.Table) -> pa.Table:
    """Append curation columns to a mixed-rec PARSED_SCHEMA block: computed
    for ``rec=='t'`` rows, null elsewhere. Keeps the block schema uniform so
    the hive ``rec=`` partitioned write still sees one table type."""
    mask = pc.equal(t["rec"], "t").to_numpy(zero_copy_only=False)
    n = t.num_rows
    if not mask.any():
        out = t
        for name, typ in CURATE_FIELDS:
            out = out.append_column(name, pa.nulls(n, typ))
        return out
    cur = curate_columns(t.filter(pa.array(mask))["text"])
    # null-indexed take = vectorized scatter: t-row i reads cur row
    # (rank of i among t rows), every other row reads null
    ranks = np.cumsum(mask) - 1
    idx = pc.if_else(
        pa.array(mask), pa.array(ranks, pa.int64()), pa.scalar(None, pa.int64())
    )
    out = t
    for name, _typ in CURATE_FIELDS:
        out = out.append_column(name, pc.take(cur[name], idx))
    return out
