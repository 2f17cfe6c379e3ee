"""Bucketed grouped execution — the high-cardinality shuffle primitive.

Ray Data's ``groupby(key).aggregate(...)`` / ``map_groups`` iterate Python
per group after the sort shuffle, which is fine for dozens of groups and
pathological for 10^4+ (measured in this environment: ~3 minutes for 60k
int-keyed groups on 32 CPUs). Every high-cardinality grouped operator in
this repo therefore routes through ONE primitive:

    hash(key) % B  →  groupby("__bucket") over B ≈ 64 groups
                   →  vectorized pandas group-op inside each bucket task

All rows of a key land in the same bucket (co-location is exact), Ray only
manages B groups, and the per-bucket callback does the real keyed work
with vectorized pandas (``groupby().sum()``, ``drop_duplicates``,
``cumcount`` …) — no per-key Python in the engine's hot path.

This is also the honest 100 TB design: B is the shuffle fan-out knob
(pick B ≈ cluster cores), and skewed keys can be salted into sub-buckets
upstream without touching the primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BUCKET_COL = "__bucket"


def _as_arrow(t) -> pa.Table:
    """Defensive block coercion for tasks fed by ``to_arrow_refs``: Ray
    decides the zero-copy path from the DATASET-level schema, so a run
    whose blocks ended up in mixed formats can hand a task a pandas block
    (observed intermittently under full-suite load as
    ``AttributeError: 'DataFrame' object has no attribute 'num_rows'``
    inside ``split``)."""
    if isinstance(t, pa.Table):
        return t
    if isinstance(t, pd.DataFrame):
        return pa.Table.from_pandas(t, preserve_index=False)
    return pa.table(t)


def _bucket_ids(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Stable bucket assignment for int/string key columns."""
    import polars as pl

    s = pl.from_arrow(col)
    if s.dtype.is_integer():
        return (s.to_numpy().astype(np.uint64) % np.uint64(n_buckets)).astype(
            np.int32
        )
    return (s.hash(seed=0xB0C4) % n_buckets).to_numpy().astype(np.int32)


def add_bucket(batch: pa.Table, on: str, n_buckets: int) -> pa.Table:
    return batch.append_column(
        BUCKET_COL, pa.array(_bucket_ids(batch[on], n_buckets), pa.int32())
    )


def bucketed_group_map_sorted(
    ds,
    bucket_on: str,
    fn,
    n_buckets: int = 64,
    batch_size: int = 65536,
):
    """``bucketed_group_map`` via Ray Data's sort-based groupby — the
    fallback form (used for empty inputs, where the task exchange has no
    schema to propagate). The default form below replaces the range sort
    with a direct two-round hash exchange."""

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        out = fn(df.drop(columns=[BUCKET_COL]))
        return out

    return (
        ds.map_batches(
            add_bucket,
            batch_format="pyarrow",
            batch_size=batch_size,
            fn_kwargs={"on": bucket_on, "n_buckets": n_buckets},
        )
        .groupby(BUCKET_COL)
        .map_groups(strip, batch_format="pandas")
    )


#: cached (by fan-out) split / reduce remote functions — defining a fresh
#: ``@ray.remote`` per exchange exports a new function definition to every
#: worker each call, measurable GCS traffic for exchange-heavy pipelines.
_SPLIT_TASKS: dict = {}
_GROUP_REDUCE_TASK = None


def _split_task(n_buckets: int):
    """Map-side split task: one argsort + searchsorted per block → per-bucket
    zero-copy slices (never a comparison sort of the data). Returns
    ``n_buckets`` slice refs plus one int64 size vector the driver uses to
    skip empty buckets."""
    if n_buckets not in _SPLIT_TASKS:
        import ray

        @ray.remote(num_returns=n_buckets + 1)
        def split(key: str, *tables):
            live = [_as_arrow(t) for t in tables]
            live = [t for t in live if t.num_rows]
            if not live:
                return (*([None] * n_buckets), np.zeros(n_buckets, np.int64))
            t = pa.concat_tables(live) if len(live) > 1 else live[0]
            b = _bucket_ids(t[key], n_buckets)
            order = np.argsort(b, kind="stable")
            s = t.take(pa.array(order))
            bounds = np.searchsorted(b[order], np.arange(n_buckets + 1))
            sizes = np.diff(bounds)
            parts = [
                s.slice(int(bounds[i]), int(sizes[i])) if sizes[i] else None
                for i in range(n_buckets)
            ]
            return (*parts, sizes.astype(np.int64))

        _SPLIT_TASKS[n_buckets] = split
    return _SPLIT_TASKS[n_buckets]


#: map-side split tasks per exchange: bounds the exchange's object count at
#: ~_MAX_SPLITS × n_buckets mid-size slices instead of blocks × n_buckets
#: tiny ones (measured: 64 blocks × 64 buckets ⇒ ~150-row objects whose
#: per-object overhead dominated the exchange)
_MAX_SPLITS = 16


def _chunk_refs(refs: list, n_chunks: int = _MAX_SPLITS) -> list[list]:
    k = max(1, -(-len(refs) // n_chunks))
    return [refs[i : i + k] for i in range(0, len(refs), k)]


_BLOCK_APPLY_TASK = None


def _block_apply_task():
    global _BLOCK_APPLY_TASK
    if _BLOCK_APPLY_TASK is None:
        import ray

        @ray.remote
        def apply_block(fn, t) -> pa.Table:
            return fn(_as_arrow(t))

        _BLOCK_APPLY_TASK = apply_block
    return _BLOCK_APPLY_TASK


def apply_refs(fn, refs, empty: pa.Table | None = None) -> pd.DataFrame:
    """Run ``fn(block) -> pa.Table`` as one plain task per pinned block ref
    and concat the (small) outputs on the driver. The iterative-ML inner
    loop: a streaming-executor launch per pass costs more than the pass
    itself once blocks are pinned, while a task wave is just scheduling.
    Same dataflow at scale — block-parallel map, driver folds only the
    per-block combiner outputs, never the data. ``fn`` must emit combiner
    outputs (rows ∝ groups, not input rows)."""
    import ray

    task = _block_apply_task()
    # ship fn (and anything it closes over, e.g. a candidate-id array)
    # through the object store ONCE — passing it inline would serialize a
    # fresh copy per block task
    fn_ref = ray.put(fn)
    outs = [t for t in ray.get([task.remote(fn_ref, r) for r in refs]) if t.num_rows]
    if not outs:
        return (empty if empty is not None else pa.table({})).to_pandas()
    return pa.concat_tables(outs).to_pandas()


def _group_reduce_task():
    global _GROUP_REDUCE_TASK
    if _GROUP_REDUCE_TASK is None:
        import ray

        @ray.remote
        def reduce_bucket(fn, *parts) -> pa.Table:
            live = [p for p in parts if p is not None and p.num_rows]
            df = pa.concat_tables(live).to_pandas()
            return pa.Table.from_pandas(fn(df), preserve_index=False)

        _GROUP_REDUCE_TASK = reduce_bucket
    return _GROUP_REDUCE_TASK


def bucketed_group_map_refs(
    ds,
    bucket_on: str,
    fn,
    n_buckets: int = 64,
):
    """The core of ``bucketed_group_map``, returning the raw list of
    reduce-task output refs (one ``pa.Table`` per non-empty bucket) instead
    of a Dataset — or ``None`` when the input produced no rows (callers
    fall back to the sorted form, which can propagate an empty schema).
    ``ds`` may also be a LIST of table refs (e.g. a previous exchange's
    output), so multi-round exchanges chain without re-entering Ray Data.

    Refs-level access exists because wrapping the outputs back into a
    Dataset is NOT free: ``from_arrow_refs(...).materialize()`` plus each
    downstream ``count()`` / ``to_pandas()`` is a fresh streaming-executor
    launch with ~1-2 s fixed cost on a busy host (measured: the launches,
    not the exchange, dominated MinHash's banding phase). Consumers that
    immediately gather a small result should stay on plain tasks."""
    import ray

    refs = ds if isinstance(ds, list) else ds.to_arrow_refs()
    if not refs:
        return None

    split = _split_task(n_buckets)
    reduce_bucket = _group_reduce_task()
    slices = [split.remote(bucket_on, *chunk) for chunk in _chunk_refs(refs)]
    counts = sum(ray.get([s[-1] for s in slices]))
    nonempty = np.nonzero(counts)[0]
    if len(nonempty) == 0:
        return None
    return [reduce_bucket.remote(fn, *[s[b] for s in slices]) for b in nonempty]


def gather_refs_pd(refs: list, empty: pa.Table | None = None) -> pd.DataFrame:
    """ray.get + concat table refs to ONE pandas frame (for exchange
    outputs known to be small). Zero-row parts are dropped and the concat
    is permissive, because a bucket fn that saw no survivors may emit an
    empty frame whose inferred dtypes differ from the populated buckets'."""
    import ray

    parts = [_as_arrow(t) for t in ray.get(list(refs))]
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return (empty if empty is not None else pa.table({})).to_pandas()
    if len(parts) == 1:
        return parts[0].to_pandas()
    return pa.concat_tables(parts, promote_options="permissive").to_pandas()


_NROWS_TASK = None


def nrows_refs(refs: list) -> int:
    """Total row count across table refs via tiny metadata tasks — no
    table bytes move to the DRIVER (each ``_nrows`` task still dereferences
    its block argument, so on a multi-node cluster the block's bytes are
    fetched to whichever node runs the counting task; counts come from the
    producing task's return value where a stage can thread them instead)."""
    global _NROWS_TASK
    import ray

    if _NROWS_TASK is None:

        @ray.remote
        def _nrows(t) -> int:
            return int(_as_arrow(t).num_rows)

        _NROWS_TASK = _nrows
    return int(sum(ray.get([_NROWS_TASK.remote(r) for r in refs])))


def bucketed_group_map(
    ds,
    bucket_on: str,
    fn,
    n_buckets: int = 64,
    batch_size: int = 65536,
):
    """Apply ``fn(bucket_df) -> df`` once per hash bucket. ``fn`` sees every
    row whose ``bucket_on`` value hashes to its bucket and is expected to do
    its keyed work vectorized. Returns a Dataset (lazy over the reduce-task
    outputs).

    Physical plan: an explicit two-round TASK exchange — map tasks split
    each upstream block into per-bucket zero-copy slices (one argsort +
    searchsorted, no comparison sort of the data), one reduce task per
    non-empty bucket concatenates its slices and runs ``fn`` — instead of
    Ray Data's sort-based ``groupby``. Row co-location is identical (hash
    partition by key); what's removed is the global range sort's sample +
    sort + merge machinery, which dominates wall time for exchanges whose
    consumers don't need sorted buckets (none here do: every ``fn`` does
    its own keyed work). Nothing lands on the driver except one int64
    count per (block, bucket) used to skip empty buckets."""
    import ray.data as rd

    out_refs = bucketed_group_map_refs(ds, bucket_on, fn, n_buckets)
    if out_refs is None:
        return bucketed_group_map_sorted(ds, bucket_on, fn, n_buckets, batch_size)
    return rd.from_arrow_refs(out_refs)


SIDE_COL = "__side"


def bucketed_join(
    left,
    right,
    left_on: str,
    right_on: str | None = None,
    n_buckets: int = 64,
    left_prep=None,
    right_prep=None,
    post=None,
    how: str = "inner",
    right_suffix: str = "_r",
    batch_size: int = 65536,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Hash join of two Datasets on the bucketed exchange: both sides
    are tagged, null-padded to a shared Arrow schema, hash-bucketed on
    their key, and each bucket task runs ONE vectorized ``pd.merge``. Both
    sides ship through the exchange exactly once (linear passes, nothing
    on the driver) — the standard repartition join. Use a broadcast lookup
    instead when one side is dim-table small.

    ``left_prep(df)`` / ``right_prep(df)`` run on a bucket's rows of that
    side before the merge — the hooks exist for work that needs key
    co-location anyway, folding what would be separate exchanges into this
    one (pair dedup on the left; key-distinct on the right turns the inner
    merge into a semi join). ``post(df)`` runs on the merged frame inside
    the bucket (join+aggregate fusion: a grouped reduction whose key
    includes the join key finishes entirely bucket-locally); with ``post``
    the output schema is whatever ``post`` returns and must be
    dtype-stable. ``how`` is the pandas merge mode ("left" + a right
    indicator column + a ``post`` filter = anti join).
    Right value columns colliding with left names get ``right_suffix``.
    Without ``post``, output dtypes are pinned by an explicit Arrow
    schema, so the null-padded pandas roundtrip cannot silently float-ify
    int columns.

    Pass ``left_schema``/``right_schema`` when a side is a lazy pipeline:
    ``Dataset.schema()`` on an un-materialized all-to-all output forces an
    extra execution just to infer types, which this avoids. The output
    schema is left fields + right value fields, in that order."""
    right_on = right_on or left_on
    # normalize to arrow blocks so schemas are introspectable + unionable
    as_arrow = lambda t: t  # noqa: E731  (identity; forces pyarrow blocks)
    left = left.map_batches(as_arrow, batch_format="pyarrow", batch_size=batch_size)
    right = right.map_batches(as_arrow, batch_format="pyarrow", batch_size=batch_size)
    if left_schema is None:
        ls = left.schema()
        left_schema = pa.schema(list(zip(ls.names, ls.types)))
    if right_schema is None:
        rs = right.schema()
        right_schema = pa.schema(list(zip(rs.names, rs.types)))
    lschema, rschema = left_schema, right_schema

    lcols = list(lschema.names)
    rename = {right_on: left_on}
    for name in rschema.names:
        if name != right_on:
            rename[name] = name + right_suffix if name in lcols else name
    rcols_out = [rename[n] for n in rschema.names if n != right_on]

    union_fields = [(n, lschema.field(n).type) for n in lcols]
    union_fields += [
        (rename[n], rschema.field(n).type) for n in rschema.names if n != right_on
    ]
    union_schema = pa.schema(union_fields + [(SIDE_COL, pa.int8())])
    out_schema = pa.schema(union_fields)

    def pad(t: pa.Table, side: int) -> pa.Table:
        if side == 1:
            t = t.rename_columns([rename[n] for n in t.column_names])
        cols = []
        for f in union_schema:
            if f.name == SIDE_COL:
                cols.append(pa.array(np.full(t.num_rows, side, dtype=np.int8)))
            elif f.name in t.column_names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip(union_schema.names, cols)))

    tagged = left.map_batches(
        pad, batch_format="pyarrow", batch_size=batch_size, fn_kwargs={"side": 0}
    ).union(
        right.map_batches(
            pad, batch_format="pyarrow", batch_size=batch_size, fn_kwargs={"side": 1}
        )
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[df[SIDE_COL] == 0, lcols]
        r = df.loc[df[SIDE_COL] == 1, [left_on] + rcols_out]
        if left_prep is not None:
            l = left_prep(l)
        if right_prep is not None:
            r = right_prep(r)
        out = l.merge(r, on=left_on, how=how)
        return post(out) if post is not None else out

    def merge_arrow(t: pa.Table) -> pa.Table:
        out = merge(t.drop_columns([BUCKET_COL]).to_pandas())
        if post is not None:
            return pa.Table.from_pandas(out, preserve_index=False)
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return (
        tagged.map_batches(
            add_bucket,
            batch_format="pyarrow",
            batch_size=batch_size,
            fn_kwargs={"on": left_on, "n_buckets": n_buckets},
        )
        .groupby(BUCKET_COL)
        .map_groups(merge_arrow, batch_format="pyarrow")
    )


def bucketed_join_tasks(
    left,
    right,
    left_on: str,
    right_on: str | None = None,
    n_buckets: int = 64,
    left_prep=None,
    right_prep=None,
    post=None,
    how: str = "inner",
    right_suffix: str = "_r",
    batch_size: int = 65536,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Hash join of two Datasets on the explicit TASK exchange: each side's
    blocks are hash-split on its own key and each bucket task runs ONE
    vectorized ``pd.merge``. Both sides ship through the exchange exactly
    once (linear passes, nothing on the driver) — the standard repartition
    join. Use a broadcast lookup instead when one side is dim-table small,
    and the streaming ``bucketed_join`` when the join is a one-shot stage
    whose upstream reads dominate (one streaming topology pipelines the
    read into the exchange; this form pays a materialization barrier).

    ``left_prep(df)`` / ``right_prep(df)`` run on a bucket's rows of that
    side before the merge — the hooks exist for work that needs key
    co-location anyway, folding what would be separate exchanges into this
    one (pair dedup on the left; key-distinct on the right turns the inner
    merge into a semi join). ``post(df)`` runs on the merged frame inside
    the bucket (join+aggregate fusion: a grouped reduction whose key
    includes the join key finishes entirely bucket-locally); with ``post``
    the output schema is whatever ``post`` returns and must be
    dtype-stable. ``how`` is the pandas merge mode ("left" + a right
    indicator column + a ``post`` filter = anti join).
    Right value columns colliding with left names get ``right_suffix``.
    Without ``post``, output dtypes are pinned by an explicit Arrow
    schema, so a left-join's NaN-padded pandas merge cannot silently
    float-ify int columns.

    Pass ``left_schema``/``right_schema`` when a side is a lazy pipeline:
    ``Dataset.schema()`` on an un-materialized all-to-all output forces an
    extra execution just to infer types, which this avoids. The output
    schema is left fields + right value fields, in that order.

    Physical plan: the same explicit two-round task exchange as
    ``bucketed_group_map`` — each side's blocks are split into per-bucket
    zero-copy slices on its own key (the sides are never padded to a union
    schema or concatenated), and one reduce task per ACTIVE bucket (inner:
    rows on both sides; left: rows on the left) runs the vectorized
    ``pd.merge``. Both sides ship through the exchange exactly once and
    their upstream pipelines execute concurrently; the driver sees only
    the per-(block, bucket) int64 size vectors used to pick active
    buckets."""
    import ray
    import ray.data as rd

    right_on = right_on or left_on
    # normalize to arrow blocks so slices are zero-copy + schema-stable
    as_arrow = lambda t: t  # noqa: E731  (identity; forces pyarrow blocks)
    left = left.map_batches(as_arrow, batch_format="pyarrow", batch_size=batch_size)
    right = right.map_batches(as_arrow, batch_format="pyarrow", batch_size=batch_size)
    if left_schema is None:
        ls = left.schema()
        left_schema = pa.schema(list(zip(ls.names, ls.types)))
    if right_schema is None:
        rs = right.schema()
        right_schema = pa.schema(list(zip(rs.names, rs.types)))
    lschema, rschema = left_schema, right_schema

    lcols = list(lschema.names)
    rename = {right_on: left_on}
    for name in rschema.names:
        if name != right_on:
            rename[name] = name + right_suffix if name in lcols else name
    rcols_out = [rename[n] for n in rschema.names if n != right_on]
    rschema_renamed = pa.schema(
        [(rename[n], rschema.field(n).type) for n in rschema.names]
    )
    out_schema = pa.schema(
        [(n, lschema.field(n).type) for n in lcols]
        + [(rename[n], rschema.field(n).type) for n in rschema.names if n != right_on]
    )

    spec = dict(
        left_on=left_on,
        lcols=lcols,
        rcols_out=rcols_out,
        rnames=list(rschema.names),
        rrename=[rename[n] for n in rschema.names],
        lschema=lschema,
        rschema_renamed=rschema_renamed,
        out_schema=None if post is not None else out_schema,
        left_prep=left_prep,
        right_prep=right_prep,
        post=post,
        how=how,
    )

    # execute both upstream pipelines concurrently (separate streaming
    # executors), then hash-split each side's blocks on its own key
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        lf = ex.submit(left.to_arrow_refs)
        rf = ex.submit(right.to_arrow_refs)
        lrefs, rrefs = lf.result(), rf.result()

    split = _split_task(n_buckets)
    lslices = [split.remote(left_on, *chunk) for chunk in _chunk_refs(lrefs)]
    rslices = [split.remote(right_on, *chunk) for chunk in _chunk_refs(rrefs)]
    zeros = np.zeros(n_buckets, np.int64)
    lcounts = sum(ray.get([s[-1] for s in lslices]), zeros)
    rcounts = sum(ray.get([s[-1] for s in rslices]), zeros)
    if how == "inner":
        active = np.nonzero((lcounts > 0) & (rcounts > 0))[0]
    elif how == "left":
        active = np.nonzero(lcounts)[0]
    elif how == "right":
        active = np.nonzero(rcounts)[0]
    else:
        active = np.nonzero(lcounts | rcounts)[0]

    if len(active) == 0:
        # schema-correct empty result, produced by the same merge path
        empty = _join_bucket_impl(spec, [], [])
        return rd.from_arrow_refs([ray.put(empty)])

    join_bucket = _join_reduce_task()
    out_refs = [
        join_bucket.remote(
            spec, len(lslices), *[s[b] for s in lslices], *[s[b] for s in rslices]
        )
        for b in active
    ]
    # barrier before wrapping: from_arrow_refs over still-pending refs makes
    # the downstream consumer poll block metadata with multi-second backoff
    # (measured 2-3× wall on this join); the reduce tasks are the tail of
    # the exchange anyway, so waiting here costs only driver idle time
    ray.wait(out_refs, num_returns=len(out_refs), fetch_local=False)
    return rd.from_arrow_refs(out_refs)


_JOIN_REDUCE_TASK = None


def _join_bucket_impl(spec: dict, lparts: list, rparts: list) -> pa.Table:
    """One bucket's vectorized merge: concat this bucket's left slices and
    (key-renamed) right slices, run the preps / ``pd.merge`` / ``post``
    chain, pin the no-``post`` output schema."""
    live_l = [p for p in lparts if p is not None and p.num_rows]
    live_r = [p for p in rparts if p is not None and p.num_rows]
    if live_l:
        # select by name (block column order is not contractual), cast to
        # the declared side schema (callers may declare wider types)
        ltbl = pa.concat_tables(live_l).select(spec["lcols"]).cast(spec["lschema"])
    else:
        ltbl = spec["lschema"].empty_table()
    lpd = ltbl.to_pandas()
    if live_r:
        rtbl = (
            pa.concat_tables(live_r)
            .select(spec["rnames"])
            .rename_columns(spec["rrename"])
            .cast(spec["rschema_renamed"])
        )
    else:
        rtbl = spec["rschema_renamed"].empty_table()
    rpd = rtbl.to_pandas()[[spec["left_on"]] + spec["rcols_out"]]
    l, r = lpd, rpd
    if spec["left_prep"] is not None:
        l = spec["left_prep"](l)
    if spec["right_prep"] is not None:
        r = spec["right_prep"](r)
    out = l.merge(r, on=spec["left_on"], how=spec["how"])
    if spec["post"] is not None:
        out = spec["post"](out)
        return pa.Table.from_pandas(out, preserve_index=False)
    return pa.Table.from_pandas(
        out, schema=spec["out_schema"], preserve_index=False
    )


def _join_reduce_task():
    global _JOIN_REDUCE_TASK
    if _JOIN_REDUCE_TASK is None:
        import ray

        @ray.remote
        def join_bucket(spec, n_left, *parts) -> pa.Table:
            return _join_bucket_impl(
                spec, list(parts[:n_left]), list(parts[n_left:])
            )

        _JOIN_REDUCE_TASK = join_bucket
    return _JOIN_REDUCE_TASK


_REDUCE_BUCKET_TASK = None


def _reduce_bucket_task():
    """Module-singleton reduce task (``fn`` ships as an argument): defining
    a fresh ``@ray.remote`` per exchange exports a new function definition
    to every worker each wave — measurable GCS traffic on small waves."""
    global _REDUCE_BUCKET_TASK
    if _REDUCE_BUCKET_TASK is None:
        import ray

        @ray.remote
        def reduce_bucket(fn, part: pa.Table) -> pa.Table:
            out = fn(part.to_pandas())
            return pa.Table.from_pandas(out, preserve_index=False)

        _REDUCE_BUCKET_TASK = reduce_bucket
    return _REDUCE_BUCKET_TASK


def bucketed_exchange_tasks(
    table: pa.Table,
    bucket_on: str,
    fn,
    n_buckets: int = 32,
) -> pa.Table:
    """The same bucketed exchange on explicit Ray tasks (map side splits
    each block by hash bucket, one reduce task per bucket runs ``fn``
    vectorized). Used for the crawl's state ops, where results feed the
    deterministic wave protocol: every stage here is a plain task graph
    with no hidden re-execution, so a failure surfaces instead of
    degrading. Input is a driver-held Arrow table (wave frontiers are
    bounded by politeness); the map side still fans out across the
    cluster via ray.put of slices."""
    import ray

    if table.num_rows == 0:
        return table

    buckets = _bucket_ids(table[bucket_on], n_buckets)
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = table.take(pa.array(order))
    sorted_buckets = buckets[order]
    bounds = np.searchsorted(sorted_buckets, np.arange(n_buckets + 1))

    reduce_bucket = _reduce_bucket_task()
    futures = []
    for b in range(n_buckets):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if hi > lo:
            futures.append(
                reduce_bucket.remote(fn, sorted_tbl.slice(lo, hi - lo))
            )
    parts = [t for t in ray.get(futures) if t.num_rows]
    if not parts:
        first = fn(table.slice(0, 0).to_pandas())
        return pa.Table.from_pandas(first, preserve_index=False)
    return pa.concat_tables(parts).combine_chunks()


def with_prefix_sum(ds, order_col: str, value_col: str, out_col: str):
    """Global ORDERED prefix scan — the two-phase parallel-scan primitive
    Ray Data has no operator for (cumulative aggregates need a total order,
    which map_batches can't see). Phase 0: range-partitioned sort on
    ``order_col`` (blocks come back globally ordered). Phase 1: one tiny
    task per block computes its value sum; the driver takes the exclusive
    prefix over the B block sums (B scalars — never the data). Phase 2:
    one task per block adds ``out_col`` = global exclusive running sum for
    each row. Both task waves are embarrassingly parallel; the only serial
    work is an O(B) cumsum of Python ints. Returns a new Dataset."""
    import ray
    import ray.data as rd

    refs = ds.sort(order_col).to_arrow_refs()

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        t = _as_arrow(t)
        if t.num_rows == 0:
            return 0
        import pyarrow.compute as pc

        return int(pc.sum(t[value_col]).as_py() or 0)

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if sums else []

    @ray.remote
    def add_prefix(t: pa.Table, off: int) -> pa.Table:
        t = _as_arrow(t)
        v = t[value_col].to_numpy() if t.num_rows else np.zeros(0, dtype=np.int64)
        pre = off + np.cumsum(v) - v
        return t.append_column(out_col, pa.array(pre.astype(np.int64)))

    return rd.from_arrow_refs(
        [add_prefix.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def with_prefix_max(ds, order_col: str, value_col: str, out_col: str):
    """Global ordered EXCLUSIVE prefix max — ``out_col[i]`` = max of
    ``value_col`` over all rows strictly preceding row i in ``order_col``
    order (NULL for the globally first row). The streaming-watermark
    primitive: with ``value_col`` = event time and ``order_col`` = arrival
    order, the result IS the high watermark each event observed on
    arrival. Same two-phase parallel-scan shape as ``with_prefix_sum``:
    range sort, one scalar per block to the driver (the block maxima),
    exclusive max over B scalars, then a per-block vectorized shifted
    ``maximum.accumulate``. Values are int64 (cast timestamps to their
    us view first)."""
    import ray
    import ray.data as rd

    refs = ds.sort(order_col).to_arrow_refs()

    @ray.remote
    def block_max(t: pa.Table):
        t = _as_arrow(t)
        if t.num_rows == 0:
            return None
        import pyarrow.compute as pc

        return pc.max(t[value_col]).as_py()

    maxes = ray.get([block_max.remote(r) for r in refs])
    lo = np.iinfo(np.int64).min
    offs, run = [], lo
    for m in maxes:
        offs.append(run)
        if m is not None:
            run = max(run, int(m))

    @ray.remote
    def add_prefix(t: pa.Table, off: int) -> pa.Table:
        t = _as_arrow(t)
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        v = t[value_col].to_numpy().astype(np.int64)
        cum = np.maximum.accumulate(v)
        pre = np.empty_like(v)
        pre[0] = off
        pre[1:] = np.maximum(cum[:-1], off)
        mask = pre != lo  # rows with no predecessor anywhere -> NULL
        return t.append_column(
            out_col, pa.array(pre, pa.int64(), mask=~mask)
        )

    return rd.from_arrow_refs(
        [add_prefix.remote(r, int(o)) for r, o in zip(refs, offs)]
    )


def bucketed_group_agg(
    ds,
    keys: list[str],
    agg: dict[str, tuple[str, str]],
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Grouped aggregation at any key cardinality:
    ``agg`` = {out_col: (in_col, op)} with pandas named-agg ops.
    Two phases: per-batch partial (combiner) → bucketed final merge."""
    ops = {out: (col, op) for out, (col, op) in agg.items()}
    # ops that merge by the same op on partials; counts merge by sum
    merge_ops = {
        out: (out, "sum" if op in ("sum", "count", "size") else op)
        for out, (col, op) in ops.items()
    }

    def _agg(df: pd.DataFrame, spec: dict[str, tuple[str, str]]) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        named = {
            out: pd.NamedAgg(column=col, aggfunc=op)
            for out, (col, op) in spec.items()
            if op != "size"
        }
        out = g.agg(**named) if named else pd.DataFrame(index=g.size().index)
        for name, (_, op) in spec.items():
            if op == "size":
                out[name] = g.size()
        return out.reset_index()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _agg(df, ops)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return _agg(df, merge_ops)

    out = bucketed_group_map(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        bucket_on=keys[0],
        fn=final,
        n_buckets=n_buckets,
    ).to_pandas()
    return out
