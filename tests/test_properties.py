"""Property tests (SURVEY.md §5.5): invariants on random link graphs via
the oracle simulator, and URL-algebra round-trips. Pure Python — no Ray."""

from hypothesis import given, settings, strategies as st

from crawler_ray import oracle, urlnorm as un

hosts = st.integers(0, 5).map(lambda i: f"h{i}.test")
paths = st.integers(0, 30).map(lambda i: f"/p{i}")


@st.composite
def corpora(draw):
    n = draw(st.integers(1, 25))
    urls = [
        f"http://{draw(hosts)}{draw(paths)}"
        for _ in range(n)
    ]
    corpus = {}
    for u in set(urls):
        links = draw(st.lists(st.sampled_from(urls + ["/px", "ftp://x.test/y"]), max_size=6))
        body = "<html><body>t" + "".join(f'<a href="{x}">a</a>' for x in links)
        if draw(st.booleans()):
            body += '<img src="/i.png">'
        corpus[u] = (body + "</body></html>").encode()
    seeds = draw(st.lists(st.sampled_from(sorted(corpus)), min_size=1, max_size=3))
    return corpus, seeds


@given(corpora(), st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_crawl_invariants(data, limit):
    corpus, seeds = data
    res = oracle.simulate(corpus, seeds, host_limit=limit)

    # politeness: no host ever exceeds limit+1 dispatches
    assert all(v <= limit + 1 for v in res.host_counts.values())
    # every dispatch (order) entry refers to a host-bearing URL
    for _, _, u, kind, _ in res.order:
        assert un.parse(u).host is not None
    # archive keys: all archived non-seed findings are http-ish with a host
    for u, kind, _ in res.archive:
        p = un.parse(u)
        assert p.host is not None and un.scheme_is_httpish(p.scheme)
    # archive is consistent with dispatch: any URL dispatched more than
    # once per (kind, depth) must be a seed (seeds bypass the archive)
    from collections import Counter

    seen_dispatch = Counter((u, k, d) for _, _, u, k, d in res.order)
    seed_set = {str(un.parse(s)) for s in seeds}
    for (u, k, d), c in seen_dispatch.items():
        if c > 1:
            assert u in seed_set
    # determinism: identical input → identical result
    res2 = oracle.simulate(corpus, seeds, host_limit=limit)
    assert res2.order == res.order
    assert res2.archive == res.archive
    assert res2.metrics == res.metrics


@given(corpora())
@settings(max_examples=20, deadline=None)
def test_priority_modes_conserve_sets_when_budget_unbound(data):
    # with an unbound budget, priority only permutes the dispatch order —
    # the archive and texts are identical across priority modes
    corpus, seeds = data
    base = oracle.simulate(corpus, seeds, host_limit=10**6)
    for mode in ("shallow_first", "hot_host_first"):
        alt = oracle.simulate(corpus, seeds, host_limit=10**6, priority=mode)
        assert alt.archive == base.archive
        assert alt.texts == base.texts
        assert sorted(alt.order) != [] or base.order == []


_URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._", min_size=1, max_size=8
)


@given(
    st.sampled_from(["http", "https"]),
    _URL_CHARS,
    st.lists(_URL_CHARS, max_size=3),
    st.one_of(st.none(), _URL_CHARS),
    st.one_of(st.none(), _URL_CHARS),
)
@settings(max_examples=200, deadline=None)
def test_urlnorm_parse_serialize_roundtrip(scheme, host, segs, query, frag):
    s = f"{scheme}://{host}.test/" + "/".join(segs)
    if query is not None:
        s += f"?{query}"
    if frag is not None:
        s += f"#{frag}"
    u = un.parse(s)
    # serialization is a fixed point: parse(str(u)) == u
    assert un.parse(str(u)) == u
    assert u.host == f"{host}.test".lower()


@given(_URL_CHARS, st.lists(_URL_CHARS, min_size=1, max_size=3))
@settings(max_examples=100, deadline=None)
def test_join_always_lands_on_base_origin(host, segs):
    base = un.parse(f"http://{host}.test/a/b/c").origin_root()
    rel = "/".join(segs)
    joined = un.join(base, rel)
    assert joined.host == base.host
    assert joined.scheme == "http"
    assert joined.path.startswith("/")


@given(
    st.lists(st.text(alphabet="ab", min_size=1, max_size=6), min_size=0, max_size=30),
    st.lists(st.text(alphabet="ab", min_size=1, max_size=6), min_size=0, max_size=30),
)
@settings(max_examples=25, deadline=None)
def test_jsonl_salvage_matches_per_line_reference(snap_texts, new_texts):
    """parse_jsonl_bytes on an arbitrary mix of valid records, junk lines
    and url-less objects keeps exactly the per-line-json.loads survivors,
    in order."""
    import json

    from crawler_ray.sources.jsonl import parse_jsonl_bytes

    lines = []
    expect = []
    for i, t in enumerate(snap_texts):
        lines.append(json.dumps({"url": f"http://h/{i}", "text": t}))
        expect.append((f"http://h/{i}", t))
    for t in new_texts:
        lines.append(t if t != "" else "{broken")  # junk / malformed
    lines.append('{"no_url": 1}')
    data = ("\n".join(lines) + "\n").encode()
    out = parse_jsonl_bytes(data)
    got = list(zip(out["url"].to_pylist(), out["text"].to_pylist()))
    assert got == expect


# ---- canonical-URL kernel vs a per-row Python reference --------------------

_track_names = st.sampled_from(["utm_source", "utm_a", "fbclid", "gclid", "msclkid"])
_keep_names = st.sampled_from(["q", "x", "page", "utmx", "id"])
_vals = st.text(
    alphabet="abcZ019-._~", min_size=0, max_size=4
)


@st.composite
def messy_urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS"]))
    host = draw(st.sampled_from(["Ex.COM", "ex.com", "A.b.Test"]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(st.sampled_from(["", "/", "/P/x", "/a%20b"]))
    n = draw(st.integers(0, 5))
    params = []
    for _ in range(n):
        if draw(st.booleans()):
            params.append(f"{draw(_track_names)}={draw(_vals)}")
        else:
            params.append(f"{draw(_keep_names)}={draw(_vals)}")
    query = "?" + "&".join(params) if params else ""
    frag = draw(st.sampled_from(["", "#f", "#a?b&c"]))
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def _canon_ref(u: str) -> str:
    """Per-row reference of the canonicalization spec (independent of the
    RE2 kernels): fragment off, tracking params out, empty '?' off,
    scheme+authority lowercased, default port stripped."""
    import re as _re

    u = u.split("#", 1)[0]
    m = _re.match(r"(?s)^([^:/?#]+)://([^/?#]*)(.*)$", u)
    if m:
        scheme, auth, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
    else:
        scheme = auth = None
        rest = u
    if "?" in rest:
        base, q = rest.split("?", 1)
        kept = [
            p
            for p in q.split("&")
            if not _re.match(r"^(?:utm_[^=&]*|fbclid|gclid|msclkid)(?:=|$)", p)
        ]
        rest = base + ("?" + "&".join(kept) if kept else "")
    if scheme is None:
        return rest
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    return f"{scheme}://{auth}{rest}"


@given(st.lists(messy_urls(), min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_canonicalize_url_kernel_matches_reference(urls):
    import pyarrow as pa

    from crawler_ray.functions.dedup import canonicalize_url_batch

    got = canonicalize_url_batch(pa.array(urls, pa.string())).to_pylist()
    assert got == [_canon_ref(u) for u in urls]


# ------------------------------------------------------- C4 kernel algebra

_words = st.sampled_from(
    ["alpha", "beta", "javascript", "dup", "a", "{x}", "lorem", "ipsum", ""]
)
_lines = st.lists(_words, max_size=8).map(" ".join).flatmap(
    lambda s: st.sampled_from([s, s + ".", s + "!", s + '?"', s + " ?"])
)
_texts = st.lists(_lines, max_size=6).map("\n".join)


@given(st.lists(_texts, min_size=1, max_size=10), st.integers(1, 6), st.integers(0, 4))
@settings(max_examples=80, deadline=None)
def test_c4_signals_match_python_reference(texts, min_words, min_kept):
    """The vectorized C4 kernel (Arrow explode + bincount + binary_join)
    must agree with a plain per-document Python restatement of the rules
    on arbitrary punctuation/newline/bad-word soup — including empty
    lines, empty docs, quote terminals, and parameter sweeps."""
    import re

    import pyarrow as pa

    from crawler_ray.functions.c4 import c4_signals

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = c4_signals(
        batch,
        min_words_per_line=min_words,
        min_kept_lines=min_kept,
        doc_bad_words=("dup",),
    ).to_pydict()

    for i, text in enumerate(texts):
        lines = text.split("\n")
        kept_lines = [
            ln
            for ln in lines
            if re.search(r'[.!?"]$', ln)
            and "javascript" not in ln.lower()
            and len(ln.split(" ")) >= min_words
        ]
        toks = set(re.split(r"[ \n]", text))
        kept = (
            len(kept_lines) >= min_kept
            and "dup" not in toks
            and "{" not in text
            and "lorem ipsum" not in text.lower()
        )
        assert got["n_lines"][i] == len(lines)
        assert got["n_kept_lines"][i] == len(kept_lines)
        assert got["kept"][i] == kept
        assert got["clean_text"][i] == "\n".join(kept_lines)


# ---------------------------------------------------------- PQ/ADC algebra


@given(
    st.integers(0, 2**32 - 1),
    st.integers(2, 40),
    st.sampled_from([2, 4, 8]),
    st.integers(2, 8),
)
@settings(max_examples=25, deadline=None)
def test_pq_adc_matches_per_vector_loops(seed, n, m_sub, ks):
    """PQIndex encode + ADC gather (vectorized) must equal per-vector
    Python loops over the SAME codebooks for arbitrary shapes — pins the
    einsum/searchsorted/bincount plumbing, independent of Ray. Pure
    numpy — no Ray session."""
    import numpy as np

    from crawler_ray.functions.similarity import PQIndex, _normalize

    rng = np.random.default_rng(seed)
    d = 16
    X = _normalize(rng.normal(size=(n, d)).astype(np.float32))
    index = PQIndex(X, m_sub=m_sub, ks=ks, seed=7, iters=3)
    dsub = d // m_sub

    codes = index.encode(X)
    for vi in range(min(n, 10)):
        for j in range(m_sub):
            s = X[vi, j * dsub : (j + 1) * dsub]
            d2 = [float(((s - c) ** 2).sum()) for c in index.codebooks[j]]
            assert codes[vi, j] == int(np.argmin(d2))

    q = X[: min(3, n)]
    lut = index.lut(q)
    adc = index.adc(lut, codes)
    for qi in range(len(q)):
        for vi in range(min(n, 10)):
            want = sum(
                float(
                    np.dot(
                        q[qi, j * dsub : (j + 1) * dsub],
                        index.codebooks[j][codes[vi, j]],
                    )
                )
                for j in range(m_sub)
            )
            assert abs(adc[qi, vi] - want) < 1e-5
