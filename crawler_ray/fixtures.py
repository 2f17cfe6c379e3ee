"""Deterministic synthetic web-corpus generator (FIXTURES.md §1).

Emits a Parquet table with exactly the target data-model schema
(BASELINE.json input_hint): ``url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string``. The HTML of each page embeds a
seeded link graph covering every semantic branch of the reference crawler
(/root/reference/src/main.rs): absolute/relative/protocol-relative links,
cycles, a hub host that overflows the 257-dispatch politeness budget
(main.rs:24,103-107), malformed links (main.rs:212-215), non-http and
"contains-http" schemes (main.rs:218), host-less URLs (main.rs:219),
links hidden in comments/scripts (tokenizer-level extraction,
main.rs:227-262), duplicate href attributes, image-filename collisions and
empty-filename images (main.rs:271-278), and URLs that are linked but
absent from the corpus (fetch-miss ⇒ warn-and-drop, main.rs:136).

Everything is a pure function of (seed, host index, page index) — no wall
clock, no process state — so the corpus is bit-identical across runs and
can be generated in parallel with Ray (see gen_corpus_ray) for bench scale.

The per-page ``text`` column is composed from the exact character-data
pieces placed into the HTML, which is what the engine's extractor must
reproduce byte-identically (the input_hint invariant).
"""

from __future__ import annotations

import hashlib
import random
from pathlib import Path

import numpy as np
import pyarrow as pa

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z, fixed (no wall clock)
_LANGS = ["en", "de", "fr"]
_WORDS = (
    "data web crawl page link index fetch parse host queue depth frontier "
    "archive budget wave image text corpus shard token actor block batch"
).split()


def _rng(seed: int, *parts: object) -> random.Random:
    # str/tuple hash() is salted per process; derive an int seed stably.
    h = hashlib.blake2b(
        ("|".join(str(p) for p in parts) + f"|{seed}").encode(), digest_size=8
    )
    return random.Random(int.from_bytes(h.digest(), "big"))


def _host(i: int) -> str:
    return f"host{i}.test"


def _scheme(i: int) -> str:
    return "https" if i % 2 else "http"


def page_url(i: int, j: int) -> str:
    # every 7th-ish page lives in a deep directory to exercise the
    # origin-root relative-resolution quirk (main.rs:162-164)
    if j % 7 == 3:
        return f"{_scheme(i)}://{_host(i)}/dir/sub/p{j}"
    return f"{_scheme(i)}://{_host(i)}/p{j}"


def default_seeds(n_hosts: int) -> list[str]:
    seeds = [page_url(0, 0)]
    if n_hosts > 1:
        seeds.append(page_url(1, 0))
    seeds.append("http://hub.test/h0")
    return seeds


def _page_row(
    seed: int,
    i: int,
    j: int,
    n_hosts: int,
    pages_per_host: int,
    hub_linked: int,
    edge_cases: bool,
    page_weight: int = 1,
) -> dict:
    idx = i * pages_per_host + j
    rng = _rng(seed, "page", i, j)
    url = page_url(i, j)

    parts: list[str] = []
    text: list[str] = []

    def tag(s: str) -> None:
        parts.append(s)

    def data(s: str) -> None:
        parts.append(s)
        text.append(s)

    def link(href: str, anchor: str) -> None:
        tag(f'<a href="{href}">')
        data(anchor)
        tag("</a>")

    title = f"Page {j} of {_host(i)}"
    tag("<html><head><title>")
    data(title)
    tag("</title></head><body><h1>")
    data(title)
    tag("</h1><p>")
    data(" ".join(rng.choice(_WORDS) for _ in range(rng.randint(8, 24))) + ".")
    tag("</p>")
    # page_weight > 1 pads body paragraphs toward realistic web-page sizes
    # (the default tiny pages underweight parse cost relative to overheads)
    for _p in range(page_weight - 1):
        tag("<p>")
        data(" ".join(rng.choices(_WORDS, k=150)) + ".")
        tag("</p>")

    # same-host links in rotating syntactic forms (all resolve to /pT via the
    # origin-root base, regardless of this page's directory)
    for t in sorted(rng.sample(range(pages_per_host), min(3, pages_per_host))):
        form = (idx + t) % 4
        target = f"p{t}" if t % 7 != 3 else f"dir/sub/p{t}"
        if form == 0:
            href = target
        elif form == 1:
            href = "/" + target
        elif form == 2:
            href = "../" + target
        else:
            href = page_url(i, t)
        link(href, f"same{t}")

    # cross-host links (cycles + duplicate discoveries across pages)
    for _ in range(2):
        oi = rng.randrange(n_hosts)
        oj = rng.randrange(pages_per_host)
        link(page_url(oi, oj), f"x{oi}-{oj}")

    # hub pressure: every page points at a distinct hub page (hub.test gets
    # far more than 257 inbound findings at t2 scale)
    if hub_linked > 0:
        link(f"http://hub.test/h{idx % hub_linked}", "hub")

    # occasional link back to a seed (seeds are never archived at seed time —
    # reference quirk: a linked seed is re-dispatched)
    if idx % 11 == 5:
        link(page_url(0, 0), "seed")

    if edge_cases:
        case = idx % 13
        if case == 0:
            link("ftp://filez.test/f1", "ftp")
        elif case == 1:
            link("mailto:someone@a.test", "mail")
        elif case == 2:
            link("xhttpx://weird.test/z", "weird")  # kept by contains("http")
        elif case == 3:
            link("http://[bad", "malformed")
        elif case == 4:
            link("file:///etc/x", "hostless")
        elif case == 5:
            link(f"/p{(j + 1) % pages_per_host}#frag{idx % 3}", "frag")
        elif case == 6:
            link(f"/p{(j + 2) % pages_per_host}?q={idx % 5}", "query")
        elif case == 7:
            tag(f'<a href="/p{j}" href="/p{(j + 1) % pages_per_host}">')
            data("dupattr")
            tag("</a>")
        elif case == 8:
            tag(f'<!-- <a href="http://ghost.test/c{idx}"> -->')
            tag("<script>")
            tag(f'var x = \'<a href="http://ghost.test/s{idx}">\';')
            tag("</script>")
        elif case == 9:
            link(f"http://missing.test/m{idx}", "missing")  # fetch-miss
        elif case == 10:
            link(f"//{_host((i + 1) % n_hosts)}/p0", "protorel")
        elif case == 11:
            tag(f'<a href="/p{(j + 3) % pages_per_host}"/>')
        elif case == 12:
            link(f"HTTP://{_host(i).upper()}/p0", "upper")  # normalization

    # images
    if idx % 3 == 0:
        tag(f'<img src="http://img{idx % 3}.test/assets/im{idx % 50}.png">')
    if idx % 17 == 0:
        tag(f'<img src="/localimg{j}.png"/>')
    if idx % 29 == 0:
        tag('<img src="http://img0.test/dir/">')  # empty last segment

    data(" fin")
    tag("</body></html>")

    return {
        "url": url,
        "warc_ts": _EPOCH_US + idx * 1_000_000,
        "html": "".join(parts).encode("utf-8"),
        "text": "".join(text),
        "lang": rng.choice(_LANGS),
    }


def _aux_rows(seed: int, n_hosts: int, pages_per_host: int, hub_linked: int) -> list[dict]:
    """Hub pages, image resources, and local images referenced by pages."""
    rows: list[dict] = []
    n_pages = n_hosts * pages_per_host
    # hub pages exist for the first ~80% of linked ids (the rest are misses)
    for k in range(int(hub_linked * 0.8)):
        rng = _rng(seed, "hub", k)
        parts: list[str] = []
        text: list[str] = []
        title = f"Hub {k}"
        parts.append("<html><head><title>")
        parts.append(title)
        text.append(title)
        parts.append("</title></head><body>")
        body = "hub node " + " ".join(rng.choice(_WORDS) for _ in range(5))
        parts.append(body)
        text.append(body)
        if k % 5 == 0 and n_pages:
            parts.append(f'<a href="{page_url(k % n_hosts, k % pages_per_host)}">')
            parts.append("back")
            text.append("back")
            parts.append("</a>")
        parts.append("</body></html>")
        rows.append(
            {
                "url": f"http://hub.test/h{k}",
                "warc_ts": _EPOCH_US + (n_pages + k) * 1_000_000,
                "html": "".join(parts).encode(),
                "text": "".join(text),
                "lang": "en",
            }
        )
    # image resources: im0..im39 exist on each img host (im40..49 are misses)
    for ih in range(3):
        for n in range(40):
            payload = hashlib.blake2b(
                f"{seed}|img|{ih}|{n}".encode(), digest_size=32
            ).digest() * 8
            rows.append(
                {
                    "url": f"http://img{ih}.test/assets/im{n}.png",
                    "warc_ts": _EPOCH_US,
                    "html": payload,
                    "text": "",
                    "lang": "",
                }
            )
    # robots.txt rows (inert unless CrawlConfig.respect_robots — they are
    # never linked, so faithful-mode crawls never fetch them)
    robots = {
        "http://host2.test/robots.txt": "User-agent: *\nDisallow: /dir/\n",
        "http://hub.test/robots.txt": (
            "# hub rate rules\nUser-agent: *\nDisallow: /h1\nDisallow: /h3\n"
        ),
        "https://host3.test/robots.txt": "User-agent: *\nDisallow: /\n",
    }
    for r_url, r_body in robots.items():
        rows.append(
            {
                "url": r_url,
                "warc_ts": _EPOCH_US,
                "html": r_body.encode(),
                "text": r_body,
                "lang": "",
            }
        )
    # the empty-last-segment image URL exists, so the sink-error branch
    # (File::create on a directory path, main.rs:276) is reachable
    rows.append(
        {
            "url": "http://img0.test/dir/",
            "warc_ts": _EPOCH_US,
            "html": b"\x89PNGdir-listing",
            "text": "",
            "lang": "",
        }
    )
    # local images for pages where idx % 17 == 0 and j is even (odd j miss)
    for i in range(n_hosts):
        for j in range(pages_per_host):
            idx = i * pages_per_host + j
            if idx % 17 == 0 and j % 2 == 0:
                rows.append(
                    {
                        "url": f"{_scheme(i)}://{_host(i)}/localimg{j}.png",
                        "warc_ts": _EPOCH_US,
                        "html": hashlib.blake2b(
                            f"{seed}|limg|{i}|{j}".encode(), digest_size=16
                        ).digest(),
                        "text": "",
                        "lang": "",
                    }
                )
    return rows


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array(
                np.array([r["warc_ts"] for r in rows], dtype="int64"),
                type=pa.timestamp("us"),
            ),
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=SCHEMA,
    )


def hub_linked_for(n_hosts: int, pages_per_host: int) -> int:
    # enough distinct hub targets to overflow the 257 budget at t2+ scale
    return min(n_hosts * pages_per_host, 600)


def gen_corpus(
    n_hosts: int = 5,
    pages_per_host: int = 20,
    seed: int = 42,
    edge_cases: bool = True,
    page_weight: int = 1,
) -> pa.Table:
    hub = hub_linked_for(n_hosts, pages_per_host)
    rows = [
        _page_row(seed, i, j, n_hosts, pages_per_host, hub, edge_cases, page_weight)
        for i in range(n_hosts)
        for j in range(pages_per_host)
    ]
    rows += _aux_rows(seed, n_hosts, pages_per_host, hub)
    return _rows_to_table(rows)


def write_corpus_dir(
    tbl: pa.Table, out_dir: str, n_files: int = 32, row_group_size: int = 2048
) -> str:
    """Partitioned corpus layout: N part files with small row groups, so
    (a) Ray reads parallelize across files and (b) the crawl's per-wave
    ``isin`` pushdown can prune at row-group granularity. This is the
    shape the 100 TB corpus would have (one file per shard)."""
    import pyarrow.parquet as pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = tbl.num_rows
    per = max(1, (n + n_files - 1) // n_files)
    for i in range(0, n_files):
        lo = i * per
        if lo >= n:
            break
        part = tbl.slice(lo, min(per, n - lo))
        pq.write_table(
            part, out / f"part-{i:05d}.parquet", row_group_size=row_group_size
        )
    return str(out)


def gen_corpus_ray(
    out_dir: str,
    n_hosts: int,
    pages_per_host: int,
    seed: int = 42,
    edge_cases: bool = True,
) -> str:
    """Bench-scale generation: fan page synthesis out over Ray as a
    map_batches over host indices (each batch builds its hosts' pages), so
    corpus creation itself scales with the cluster."""
    import ray.data as rd

    hub = hub_linked_for(n_hosts, pages_per_host)

    def build(batch: dict) -> pa.Table:
        rows = [
            _page_row(seed, int(i), j, n_hosts, pages_per_host, hub, edge_cases)
            for i in batch["id"]
            for j in range(pages_per_host)
        ]
        return _rows_to_table(rows)

    rd.range(n_hosts).map_batches(
        build, batch_format="pandas", batch_size=max(1, 4096 // pages_per_host)
    ).write_parquet(out_dir)
    aux = _rows_to_table(_aux_rows(seed, n_hosts, pages_per_host, hub))
    import pyarrow.parquet as pq

    pq.write_table(aux, f"{out_dir}/aux_rows.parquet")
    return out_dir


def main() -> None:
    import argparse

    import pyarrow.parquet as pq

    ap = argparse.ArgumentParser(description="generate synthetic web corpus")
    ap.add_argument("--out", required=True)
    ap.add_argument("--hosts", type=int, default=5)
    ap.add_argument("--pages", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-edge-cases", action="store_true")
    args = ap.parse_args()
    tbl = gen_corpus(args.hosts, args.pages, args.seed, not args.no_edge_cases)
    from pathlib import Path

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, args.out)
    print(f"wrote {tbl.num_rows} rows to {args.out}")


if __name__ == "__main__":
    main()
