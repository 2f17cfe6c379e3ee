"""Driver-contract extension queries vs their REAL SQL oracles at sf0.001
(a different corpus than the sf0.01 the driver gates on, so the SQL has to
generalize, not just replay). Pinned-truth oracles are sf0.01-specific and
excluded — the pytest suite checks their math separately."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

#: extension queries whose oracle is real SQL (not a pinned table)
REAL_SQL = [
    "dedup_jaccard_pairs",
    "docs_jaccard_clusters",
    "docs_snapshot_dedup",
    "docs_decontaminate",
    "docs_line_dedup",
    "docs_frequent_words",
    "docs_unigram_logprob",
    "docs_dsir_sample",
    "docs_perplexity_buckets",
    "docs_temperature_sample",
    "docs_window_dup_pairs",
    "docs_global_shuffle",
    "corpus_top_bigrams",
    "docs_curation_funnel",
    "doc_quality_scores",
    "doc_repetition_scores",
    "doc_normalized",
    "cosine_near_dups",
    "embeddings_semantic_dedup",
    "doc_redacted",
    "warc_roundtrip",
    "jsonl_roundtrip",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", REAL_SQL)
def test_extension_query_matches_oracle(entry_mod, con, name):
    got = entry_mod.queries()[name](SF)
    want = con.execute(entry_mod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_oracle_keys_subset_of_queries(entry_mod):
    """Driver contract invariant: every oracle_sql key must name an
    implemented query (a dangling oracle would make the driver's
    correctness pass KeyError), and the rows-only remainder stays
    exactly the crawl-semantics set."""
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, o - q
    assert q - o == {
        "crawl_archive",
        "crawl_curated_stats",
        "crawl_host_counts",
        "crawl_images",
        "crawl_metrics",
        "crawl_order",
        "crawl_texts",
        "extract_links",
    }
