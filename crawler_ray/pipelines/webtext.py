"""End-to-end web-text training-data pipeline: crawl output → corpus.

The downstream consumer of the crawl engine: takes crawled page text (the
byte-exact ``rec='t'`` stream of a CrawlRun, or any (url, text) parquet),
and produces a deduplicated, quality-filtered, language-tagged, token-counted
training corpus — the standard Common-Crawl-style curation chain, each
stage one of this repo's operators:

  texts ──exact dedup (content-hash bucketed groupby)──▶
        ──quality features + heuristic filters (vectorized map_batches)──▶
        ──language-ID (actor pool)──▶
        ──token counts + fingerprints──▶
        ──write partitioned parquet (one dir per lang)──▶ stats

Every stage is a streaming Dataset op; the only shuffle is the dedup
hash exchange. Stats are partial-aggregated from the WRITTEN corpus with
column pruning (footers + three scalar columns), so the curated set is
never pinned whole in the object store between write and stats.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa


def _texts_ds(source: str):
    """Accept a CrawlRun output dir (reads wave parsed text rows) or a
    parquet path/dir with (url, text) columns."""
    import ray.data as rd

    p = Path(source)
    if p.is_dir() and list(p.glob("wave=*")):
        # hive layout: the text partition (rec=t) is read directly — the
        # findings/image partitions (and their heavy columns) never load
        paths = [
            str(f)
            for d in sorted(p.glob("wave=*"))
            if (d / "_COMPLETE").exists()
            for f in sorted((d / "parsed" / "rec=t").glob("*.parquet"))
        ]
        return rd.read_parquet(paths, columns=["url", "text"])
    return rd.read_parquet(source, columns=["url", "text"])


def build_training_set(
    source: str,
    dest: str,
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.0,
    max_dup_line_ratio: float | None = None,
    max_top_bigram_ratio: float | None = None,
    blocked_hosts: "tuple[str, ...]" = (),
    url_soft_words: "dict[str, float] | None" = None,
    url_score_cutoff: float = 2.0,
    gopher_rules: "dict | None" = None,
) -> pd.DataFrame:
    """Run the curation chain; writes ``dest/lang=XX/*.parquet`` and returns
    the per-language stats frame (docs, tokens, mean quality). The
    repetition gates (Gopher-style ``max_dup_line_ratio`` /
    ``max_top_bigram_ratio``), the RefinedWeb URL gate
    (``blocked_hosts`` / ``url_soft_words``) and the full Gopher
    rule-set gate (``gopher_rules`` — kwargs for
    textstats.gopher_quality) are all off by default; each adds one
    stateless vectorized stage when set."""
    from ..functions.dedup import exact_dedup
    from ..functions.textstats import (
        fingerprints,
        lang_id_block,
        quality_scores,
        repetition_scores,
        token_counts,
    )

    ds = _texts_ds(source)

    if blocked_hosts or url_soft_words:
        # cheapest gate first: URL-only, before any text is touched
        from ..functions.urlfilter import url_quality

        def url_gate(t: pa.Table) -> pa.Table:
            sig = url_quality(
                t,
                blocked_hosts=blocked_hosts,
                soft_words=url_soft_words,
                cutoff=url_score_cutoff,
            )
            return t.filter(sig["kept"])

        ds = ds.map_batches(url_gate, batch_format="pyarrow")

    # the crawl can legitimately fetch one URL under several fragment
    # aliases; identical text dedups right after by content anyway
    ds = exact_dedup(ds, col="text", id_col="url")

    if gopher_rules is not None:
        from ..functions.textstats import gopher_quality

        def gopher_gate(t: pa.Table) -> pa.Table:
            sig = gopher_quality(
                t.append_column(
                    "_i", pa.array(np.arange(t.num_rows), pa.int64())
                ),
                id_col="_i",
                **gopher_rules,
            )  # one output row per input row, in batch order
            return t.filter(sig["kept"])

        ds = ds.map_batches(gopher_gate, batch_format="pyarrow")

    ds = ds.map_batches(quality_scores, batch_format="pyarrow", batch_size=4096)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.greater_equal(t["n_words"], min_words),
            pc.less_equal(t["punct_ratio"], max_punct_ratio),
        )
        if min_stopword_ratio > 0:
            mask = pc.and_(
                mask, pc.greater_equal(t["stopword_ratio"], min_stopword_ratio)
            )
        return t.filter(mask)

    ds = ds.map_batches(keep, batch_format="pyarrow")

    if max_dup_line_ratio is not None or max_top_bigram_ratio is not None:
        ds = ds.map_batches(
            repetition_scores, batch_format="pyarrow", batch_size=4096
        )

        def keep_rep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pa.array(np.ones(t.num_rows, dtype=bool))
            if max_dup_line_ratio is not None:
                mask = pc.and_(
                    mask,
                    pc.less_equal(t["dup_line_char_ratio"], max_dup_line_ratio),
                )
            if max_top_bigram_ratio is not None:
                mask = pc.and_(
                    mask,
                    pc.less_equal(t["top_bigram_ratio"], max_top_bigram_ratio),
                )
            return t.filter(mask).drop_columns(
                ["dup_line_char_ratio", "top_bigram_ratio"]
            )

        ds = ds.map_batches(keep_rep, batch_format="pyarrow")

    ds = ds.map_batches(lang_id_block, batch_format="pyarrow", batch_size=2048)
    ds = ds.map_batches(token_counts, batch_format="pyarrow", batch_size=4096)
    ds = ds.map_batches(fingerprints, batch_format="pyarrow", batch_size=4096)

    # partitioned, resumable output in ONE pass: Ray's hive-style
    # partition_cols write puts each row group under lang=<value>/ without
    # re-scanning the curated set once per language
    out = Path(dest)
    out.mkdir(parents=True, exist_ok=True)
    # a previous run's partitions would double into the read-back stats
    # (write_parquet appends uniquely-named files, it doesn't truncate)
    import shutil

    for stale in out.glob("lang=*"):
        shutil.rmtree(stale)
    ds.map_batches(
        lambda t: t.append_column("lang", t["pred_lang"]),
        batch_format="pyarrow",
    ).write_parquet(str(out), partition_cols=["lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pred_lang", sort=False)
        return g.agg(
            docs=("ws_tokens", "size"),
            tokens=("ws_tokens", "sum"),
            punct_sum=("punct_ratio", "sum"),
        ).reset_index()

    # stats from the WRITTEN corpus, pruned to three scalar columns — the
    # curated set is never pinned whole in the object store (a full
    # materialize() between write and stats was the round-3 form; at the
    # design point the curated corpus is object-store-sized, while this
    # read-back touches only footers + three numeric/dict columns)
    import ray

    part_files = sorted(
        str(f) for d in out.glob("lang=*") for f in d.glob("*.parquet")
    )
    if part_files:  # read ONLY the hive partitions (dest also holds stats.json)
        back = ray.data.read_parquet(
            part_files, columns=["pred_lang", "ws_tokens", "punct_ratio"]
        )
        parts = back.map_batches(partial, batch_format="pandas").to_pandas()
    else:  # every row filtered out: empty corpus, empty stats
        parts = pd.DataFrame(
            columns=["pred_lang", "docs", "tokens", "punct_sum"]
        )
    stats = (
        parts.groupby("pred_lang", sort=True)
        .agg(docs=("docs", "sum"), tokens=("tokens", "sum"), punct_sum=("punct_sum", "sum"))
        .reset_index()
    )
    stats["mean_punct_ratio"] = (stats["punct_sum"] / stats["docs"]).round(6)
    stats = stats.drop(columns=["punct_sum"])
    stats.to_json(out / "stats.json", orient="records")
    return stats


def curation_funnel(
    docs_ds,
    bench_ds,
    langs: tuple = ("en", "de"),
    min_words: int = 30,
    max_top_bigram: float = 0.05,
    decon_n: int = 8,
    bench_mod: int = 7,
) -> pd.DataFrame:
    """Per-stage retention counts through a curation chain — the funnel
    report every production corpus pipeline publishes (how many docs
    survive language gate → length gate → repetition gate →
    decontamination).

    ONE streaming pass: each batch computes all four cumulative stage
    flags and emits a single row of partial sums, so the driver reduces
    #batches rows regardless of corpus size; no stage rescans the input
    and the only broadcast is the benchmark gram set. Stage predicates
    reuse the engine's per-doc kernels (repetition_scores, the
    decontamination tokenizer), so the funnel is consistent with the
    standalone queries to the bit.

    Returns ``(stage_idx, stage, kept)`` — kept is cumulative.
    """
    import ray

    from ..functions.dedup import _decon_tokens, collect_bench_grams
    from ..functions.textstats import repetition_scores

    bench_ref = collect_bench_grams(bench_ds, n=decon_n)
    lang_set = frozenset(langs)

    class FunnelFlags:
        def __init__(self) -> None:
            self.grams: frozenset = ray.get(bench_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rep = repetition_scores(batch)
            top = np.floor(
                rep["top_bigram_ratio"].to_numpy() * 1e6 + 0.5
            ) / 1e6  # half-up 6dp — the doc_repetition_scores convention
            texts = batch["text"].to_pylist()
            ids = batch["doc_id"].to_numpy()
            p1 = np.array(
                [l in lang_set for l in batch["lang"].to_pylist()], dtype=bool
            )
            n_words = np.array(
                [len((t or "").split()) for t in texts], dtype=np.int64
            )
            p2 = n_words >= min_words
            p3 = top <= max_top_bigram
            bench = self.grams
            p4 = np.zeros(len(texts), dtype=bool)
            for i, (d, t) in enumerate(zip(ids, texts)):
                if d % bench_mod == 0:
                    continue  # benchmark doc: never a training candidate
                w = _decon_tokens(t)
                hit = False
                for j in range(len(w) - decon_n + 1):
                    if " ".join(w[j : j + decon_n]) in bench:
                        hit = True
                        break
                p4[i] = not hit
            c1 = p1
            c2 = c1 & p2
            c3 = c2 & p3
            c4 = c3 & p4
            return pa.table(
                {
                    "total": pa.array([len(texts)], pa.int64()),
                    "lang": pa.array([int(c1.sum())], pa.int64()),
                    "length": pa.array([int(c2.sum())], pa.int64()),
                    "repetition": pa.array([int(c3.sum())], pa.int64()),
                    "decontaminate": pa.array([int(c4.sum())], pa.int64()),
                }
            )

    parts = docs_ds.map_batches(
        FunnelFlags, batch_format="pyarrow", concurrency=2
    ).to_pandas()  # one row per batch
    sums = parts.sum()
    stages = ["total", "lang", "length", "repetition", "decontaminate"]
    return pd.DataFrame(
        {
            "stage_idx": np.arange(len(stages), dtype=np.int64),
            "stage": stages,
            "kept": np.array([int(sums[s]) for s in stages], dtype=np.int64),
        }
    )
