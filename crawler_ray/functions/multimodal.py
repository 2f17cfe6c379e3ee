"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
alongside (the crawl engine's image path already produces exactly this:
``url, filename, data, nbytes``). The decode / feature-extract / resize /
frame-sample stages are actor-pool ``map_batches`` stages whose Ray-side
shape — schema, batch sizing for large payloads, per-actor codec setup,
output layout — is real and tested. AUDIO decode/resample are REAL for
WAV payloads (stdlib ``wave``/``audioop`` ship here — see ``DecodeAudio``
/ ``ResampleAudio``); the IMAGE codec call is STUBBED because no image
library ships in this container:

- ``DecodeImage(strict=True)`` raises NotImplementedError at the codec
  boundary (the honest production stub);
- ``DecodeImage(strict=False)`` substitutes a deterministic fake decode
  (dimensions/features derived from the bytes) so pipelines and tests can
  exercise the full path end-to-end.

Batch-size guidance encoded here: media batches are sized by BYTES not
rows (`suggest_batch_size`), because a 4k image row is ~10^4× a text row;
the object store spills whole blocks, so blocks must stay ≪ worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("data", pa.binary()),
        ("nbytes", pa.int64()),
        ("content_sha", pa.string()),
    ]
)


def suggest_batch_size(mean_payload_bytes: int, budget_bytes: int = 64 << 20) -> int:
    """Rows per batch so one batch stays under the per-task byte budget."""
    return max(1, budget_bytes // max(1, mean_payload_bytes))


def wrap_binary(batch: pa.Table, data_col: str, kind: str) -> pa.Table:
    """Lift an arbitrary binary column into the MEDIA_SCHEMA shape.

    ``media_id`` is content-derived (first 8 bytes of the sha-256, masked
    to a non-negative int64) so it is stable across batches/blocks and
    usable as a join identity downstream — a per-batch range would restart
    at 0 in every block and collide."""
    data = batch[data_col].to_pylist()
    shas = [hashlib.sha256(d or b"").hexdigest() for d in data]
    ids = [int(s[:16], 16) & 0x7FFF_FFFF_FFFF_FFFF for s in shas]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kind] * len(data)),
            "data": pa.array(data, pa.binary()),
            "nbytes": pa.array([len(d or b"") for d in data], pa.int64()),
            "content_sha": pa.array(shas),
        }
    )


class DecodeImage:
    """Actor-pool decode stage. ``__init__`` loads the codec ONCE per actor:
    it import-tries PIL and keeps the module handles if present; without a
    codec library the deterministic fake decode substitutes (``codec="fake"``
    forces it, ``codec="pil"`` requires the real one). ``strict=True`` means
    "never fake": with PIL present strict mode exercises the REAL decode
    path; without it (this container ships no image library) the codec
    boundary raises NotImplementedError — the honest production stub."""

    def __init__(self, strict: bool = False, codec: str = "auto") -> None:
        self.strict = strict
        self.codec = None
        if codec in ("auto", "pil"):
            try:
                import io as _io

                from PIL import Image as _Image  # optional, not shipped here

                self.codec = (_Image, _io)
            except ImportError:
                if codec == "pil":
                    raise

    def _decode(self, data: bytes) -> tuple[int, int, int, np.ndarray]:
        if self.codec is not None:
            _Image, _io = self.codec
            try:
                img = _Image.open(_io.BytesIO(data or b""))
                img.load()
                w, h = img.size
                c = len(img.getbands())
                # small deterministic feature vector: 4×4 grayscale grid
                feats = (
                    np.asarray(
                        img.convert("L").resize((4, 4)), dtype=np.float32
                    ).reshape(-1)
                    / 255.0
                )
                return w, h, c, feats
            except NotImplementedError:
                raise
            except Exception:
                if self.strict:
                    raise  # undecodable bytes are an error in strict mode
                # else fall through to the deterministic fake
        if self.strict:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "install pillow/turbojpeg (DecodeImage picks it up per actor)"
            )
        # deterministic fake decode: dims + features derived from content
        h = hashlib.blake2b(data or b"", digest_size=16).digest()
        width = 64 + h[0] * 4
        height = 64 + h[1] * 4
        feats = (
            np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
        )
        return width, height, 3, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, fs = [], [], [], []
        for data in batch["data"].to_pylist():
            w, h, c, f = self._decode(data)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            fs.append(f.tolist())
        return (
            batch.drop_columns(["data"])  # decoded stages drop the payload
            .append_column("width", pa.array(ws, pa.int32()))
            .append_column("height", pa.array(hs, pa.int32()))
            .append_column("channels", pa.array(cs, pa.int32()))
            .append_column("features", pa.array(fs, pa.list_(pa.float32())))
        )


class DecodeAudio:
    """Actor-pool audio decode stage — REAL for WAV payloads.

    Unlike ``DecodeImage`` (no image library ships in this container),
    WAV decode needs only stdlib ``wave``/``audioop``, so this stage does
    real container parsing and real signal features: sample rate /
    channels / width / frame count from the header, duration, full-clip
    RMS, and an ``n_env``-bin RMS-envelope feature vector over the mono
    mix — all deterministic and cross-checked in tests against an
    independent numpy implementation. Only NON-WAV containers (mp3/flac/
    ogg need external codecs) hit the stub boundary: ``strict=True``
    raises, ``strict=False`` substitutes the same deterministic fake
    shape as DecodeImage so mixed-corpus pipelines still flow.

    Stdlib note: ``audioop`` is deprecated for removal in Python 3.13;
    this container runs 3.11. The import is done once per actor in
    ``__init__`` (actor-pool contract) and would be the swap point for
    ``numpy``-only kernels on newer interpreters."""

    def __init__(self, strict: bool = False, n_env: int = 16) -> None:
        import io as _io
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore", DeprecationWarning)
            import audioop as _audioop
        import wave as _wave

        self.codec = (_wave, _audioop, _io)
        self.strict = strict
        self.n_env = n_env

    def _decode(self, data: bytes):
        _wave, _audioop, _io = self.codec
        try:
            with _wave.open(_io.BytesIO(data or b"")) as w:
                nch = w.getnchannels()
                sw = w.getsampwidth()
                rate = w.getframerate()
                nframes = w.getnframes()
                pcm = w.readframes(nframes)
        except (Exception, EOFError):
            if self.strict:
                raise NotImplementedError(
                    "non-WAV audio container: codec not available in this "
                    "environment (WAV decodes for real via stdlib)"
                )
            h = hashlib.blake2b(data or b"", digest_size=16).digest()
            fake = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
            env = np.resize(fake, self.n_env)
            return 8000, 1, 2, 0, 0.0, 0.0, env
        if sw not in (1, 2, 4) or rate <= 0:
            # 24-bit needs manual repacking (rare); wave happily parses a
            # framerate-0 header, so guard the division here too
            if self.strict:
                raise NotImplementedError(
                    f"unsupported sample width {sw} / rate {rate}"
                )
            return rate, nch, sw, nframes, (
                nframes / rate if rate > 0 else 0.0
            ), 0.0, np.zeros(self.n_env, dtype=np.float32)
        if sw == 1:
            # WAV 8-bit PCM is UNSIGNED (silence = 0x80) but audioop's
            # width-1 kernels assume signed: rebias before any math, or a
            # silent clip reads as maximum loudness
            pcm = _audioop.bias(pcm, 1, -128)
        if nch > 1:
            # real mono mixdown (equal weights), vectorized in C
            pcm = _audioop.tomono(pcm, sw, 0.5, 0.5)
        full = float(2 ** (8 * sw - 1))
        rms = (_audioop.rms(pcm, sw) / full) if pcm else 0.0
        env = np.zeros(self.n_env, dtype=np.float32)
        n_samples = len(pcm) // sw
        if n_samples:
            step = max(1, -(-n_samples // self.n_env))  # ceil-div bins
            for i in range(self.n_env):
                chunk = pcm[i * step * sw : (i + 1) * step * sw]
                if chunk:
                    env[i] = _audioop.rms(chunk, sw) / full
        dur = nframes / rate if rate else 0.0
        return rate, nch, sw, nframes, dur, rms, env

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, chans, widths, frames, durs, rmss, envs = (
            [], [], [], [], [], [], [],
        )
        for data in batch["data"].to_pylist():
            rate, nch, sw, nf, dur, rms, env = self._decode(data)
            rates.append(rate)
            chans.append(nch)
            widths.append(sw)
            frames.append(nf)
            durs.append(dur)
            rmss.append(rms)
            envs.append(env.tolist())
        return (
            batch.drop_columns(["data"])
            .append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("channels", pa.array(chans, pa.int32()))
            .append_column("sample_width", pa.array(widths, pa.int32()))
            .append_column("n_frames", pa.array(frames, pa.int64()))
            .append_column("duration_s", pa.array(durs, pa.float64()))
            .append_column("rms", pa.array(rmss, pa.float64()))
            .append_column("features", pa.array(envs, pa.list_(pa.float32())))
        )


class ResampleAudio:
    """Real WAV resample stage (stdlib ``audioop.ratecv`` — C-rate
    conversion, stateful across chunks but each payload converts whole).
    Emits the payload re-encoded as a proper WAV at ``target_rate`` so
    downstream stages (DecodeAudio included) read it like any other WAV.
    Non-WAV bytes: strict raises, else passthrough unchanged (documented
    no-op, so mixed corpora keep flowing)."""

    def __init__(self, target_rate: int = 16000, strict: bool = False) -> None:
        import io as _io
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore", DeprecationWarning)
            import audioop as _audioop
        import wave as _wave

        self.codec = (_wave, _audioop, _io)
        self.target = target_rate
        self.strict = strict

    def _resample(self, data: bytes) -> bytes:
        _wave, _audioop, _io = self.codec
        try:
            with _wave.open(_io.BytesIO(data or b"")) as w:
                nch = w.getnchannels()
                sw = w.getsampwidth()
                rate = w.getframerate()
                pcm = w.readframes(w.getnframes())
        except (Exception, EOFError):
            if self.strict:
                raise NotImplementedError("non-WAV audio container")
            return data
        if rate <= 0 or sw not in (1, 2, 4):
            # wave parses framerate-0 / odd-width headers without error;
            # ratecv would raise audioop.error OUTSIDE the try above —
            # treat such payloads as undecodable, same contract as non-WAV
            if self.strict:
                raise NotImplementedError(
                    f"malformed WAV header: rate {rate}, width {sw}"
                )
            return data
        if rate != self.target:
            pcm, _ = _audioop.ratecv(pcm, sw, nch, rate, self.target, None)
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sw)
            w.setframerate(self.target)
            w.writeframes(pcm)
        return buf.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resample(d) for d in batch["data"].to_pylist()]
        i = batch.column_names.index("data")
        return batch.set_column(i, "data", pa.array(out, pa.binary()))


class SampleFrames:
    """Video frame-sampling stage shape: emits ``n_frames`` rows per input
    row (flat-map inside map_batches), each tagged (media_id, frame_idx)
    with a deterministic fake frame payload when not strict."""

    def __init__(self, n_frames: int = 4, strict: bool = False) -> None:
        self.n = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, data in zip(
            batch["media_id"].to_pylist(), batch["data"].to_pylist()
        ):
            if self.strict:
                raise NotImplementedError("video codec not available")
            for i in range(self.n):
                ids.append(mid)
                idxs.append(i)
                frames.append(
                    hashlib.blake2b(
                        (data or b"") + i.to_bytes(4, "big"), digest_size=32
                    ).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


class ResizeImage:
    """Actor-pool image RESIZE stage — the remaining member of the
    decode / feature-extract / resize / frame-sample family. Same codec
    discipline as ``DecodeImage``: PIL if importable (``codec="pil"``
    requires it, real thumbnail-to-fit + re-encode to PNG), otherwise a
    deterministic fake that preserves the CONTRACT (output payload is a
    content-derived byte string whose length scales with the target box,
    plus the post-resize dims computed by the real aspect-fit rule);
    ``strict=True`` without a codec raises at the boundary — the honest
    production stub. Dims math is shared by both branches, so the
    fake-path plumbing tests pin the same aspect-fit behavior the PIL
    branch ships.

    Output: input columns with ``data`` replaced by the resized payload
    and ``out_w`` / ``out_h`` appended. Keep payload batches small
    (``suggest_batch_size``) — resize holds ~2× the payload in memory."""

    def __init__(
        self,
        max_w: int = 256,
        max_h: int = 256,
        strict: bool = False,
        codec: str = "auto",
    ) -> None:
        self.max_w, self.max_h = int(max_w), int(max_h)
        self.strict = strict
        self.codec = None
        if codec in ("auto", "pil"):
            try:
                import io as _io

                from PIL import Image as _Image

                self.codec = (_Image, _io)
            except ImportError:
                if codec == "pil":
                    raise

    @staticmethod
    def fit(w: int, h: int, max_w: int, max_h: int) -> "tuple[int, int]":
        """Aspect-preserving fit into (max_w, max_h), never upscaling —
        PIL.Image.thumbnail's box rule (floor with a 1px floor)."""
        scale = min(max_w / max(w, 1), max_h / max(h, 1), 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def _resize(self, data: bytes) -> "tuple[bytes, int, int]":
        if self.codec is not None:
            _Image, _io = self.codec
            try:
                img = _Image.open(_io.BytesIO(data or b""))
                img.load()
                ow, oh = self.fit(*img.size, self.max_w, self.max_h)
                img = img.resize((ow, oh))
                buf = _io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue(), ow, oh
            except NotImplementedError:
                raise
            except Exception:
                if self.strict:
                    raise
        if self.strict:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "install pillow (ResizeImage picks it up per actor)"
            )
        # deterministic fake: reuse DecodeImage's content-derived dims,
        # apply the REAL fit rule, emit a content-keyed payload sized to
        # the target box (so byte-budget math stays realistic downstream)
        hd = hashlib.blake2b(data or b"", digest_size=16).digest()
        w, h = 64 + hd[0] * 4, 64 + hd[1] * 4
        ow, oh = self.fit(w, h, self.max_w, self.max_h)
        n = max(1, (ow * oh) // 16)
        reps = -(-n // len(hd))
        return (hd * reps)[:n], ow, oh

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, ws, hs = [], [], []
        for data in batch["data"].to_pylist():
            b, w, h = self._resize(data)
            outs.append(b)
            ws.append(w)
            hs.append(h)
        i = batch.column_names.index("data")
        return (
            batch.set_column(i, "data", pa.array(outs, pa.binary()))
            .append_column("out_w", pa.array(ws, pa.int32()))
            .append_column("out_h", pa.array(hs, pa.int32()))
        )


class PHashImage:
    """Actor-pool perceptual-hash stage (pHash, the classic DCT variant:
    Zauner 2010 "Implementation and Benchmarking of Perceptual Image Hash
    Functions" §3.2): grayscale 32×32 → 2-D DCT-II → keep the top-left
    8×8 low-frequency block → threshold each coefficient against the
    MEDIAN of the 63 non-DC coefficients → 64-bit hash (bit i set iff
    coefficient i > median; the DC term compares against the same
    median). Near-duplicate images differ in a few low-frequency bits, so
    Hamming distance on the hash is the dedup metric.

    Codec contract mirrors ``DecodeImage``: PIL if importable (grayscale
    + BILINEAR 32×32 resize), else a deterministic fake pixel grid
    expanded from the payload's blake2b (identical bytes ⇒ identical
    grid ⇒ identical hash — so EXACT duplicates are found even under the
    fake codec, while pixel-level NEAR-dups need the real codec);
    ``strict=True`` raises at the codec boundary instead of faking.

    Determinism: coefficients are rounded half-up at 1e-4 BEFORE the
    median/compare (engine and the independent pytest DCT reference round
    identically), so summation-order float noise cannot flip a bit. The
    DCT is two batched BLAS matmuls per batch (D @ G @ Dᵀ over the
    stacked grids); the basis matrix is built ONCE per actor in
    ``__init__``.
    """

    GRID = 32

    def __init__(self, strict: bool = False, codec: str = "auto") -> None:
        self.strict = strict
        self.codec = None
        if codec in ("auto", "pil"):
            try:
                import io as _io

                from PIL import Image as _Image

                self.codec = (_Image, _io)
            except ImportError:
                if codec == "pil":
                    raise
        n = self.GRID
        # orthonormal DCT-II basis: D[k, x] = c(k) cos(pi (2x+1) k / 2n)
        k = np.arange(n)[:, None].astype(np.float64)
        x = np.arange(n)[None, :].astype(np.float64)
        d = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
        d[0, :] *= np.sqrt(1.0 / n)
        d[1:, :] *= np.sqrt(2.0 / n)
        self._dct = d

    def _grid(self, data: bytes) -> np.ndarray:
        n = self.GRID
        if self.codec is not None:
            _Image, _io = self.codec
            try:
                img = _Image.open(_io.BytesIO(data or b""))
                img = img.convert("L").resize((n, n), _Image.BILINEAR)
                return np.asarray(img, dtype=np.float64) / 255.0
            except NotImplementedError:
                raise
            except Exception:
                if self.strict:
                    raise
        if self.strict:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "install pillow (PHashImage picks it up per actor)"
            )
        # deterministic fake pixels: blake2b XOF-style expansion of the
        # payload into n*n bytes (identical bytes -> identical grid)
        chunks = [
            hashlib.blake2b(
                (data or b"") + bytes([i]), digest_size=64
            ).digest()
            for i in range((n * n) // 64)
        ]
        raw = np.frombuffer(b"".join(chunks), dtype=np.uint8)
        return raw.reshape(n, n).astype(np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        grids = np.stack(
            [self._grid(d) for d in batch["data"].to_pylist()]
        ) if len(batch) else np.zeros((0, self.GRID, self.GRID))
        d = self._dct
        # D @ G @ Dᵀ as two batched BLAS matmuls — measured ~45× faster
        # than the equivalent un-optimized einsum contraction at 5k
        # images/batch, and identical after the 1e-4 quantization below
        coef = np.matmul(np.matmul(d, grids), d.T)
        block = coef[:, :8, :8].reshape(len(batch), 64)
        block = np.floor(block * 1e4 + 0.5) / 1e4  # quantize pre-compare
        med = np.median(block[:, 1:], axis=1, keepdims=True)
        bits = (block > med).astype(np.uint64)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        phash = (bits * weights).sum(axis=1, dtype=np.uint64)
        return batch.drop_columns(["data"]).append_column(
            "phash", pa.array(phash, pa.uint64())
        )


#: per-worker PHashImage instances for the TASK form of the stage —
#: bounded: one instance per (strict, codec) parameter set, cleared on a
#: new set (same single-entry discipline as dedup._MINHASHERS)
_PHASHERS: dict = {}


def phash_batch(
    batch: pa.Table, strict: bool = False, codec: str = "auto"
) -> pa.Table:
    """Task-form pHash stage: identical arithmetic to ``PHashImage`` via
    a per-worker cached instance. Use this with plain
    ``map_batches(phash_batch)`` when the codec setup is trivial (the
    fake-codec path, or PIL already resident) — an actor pool's spin-up
    dominates a stage whose ``__init__`` costs microseconds (the same
    measurement that moved MinHash signatures from actors to tasks);
    keep the ``PHashImage`` actor-pool form when construction is
    genuinely expensive (codec/model load)."""
    key = (strict, codec)
    st = _PHASHERS.get(key)
    if st is None:
        _PHASHERS.clear()
        st = _PHASHERS.setdefault(key, PHashImage(strict=strict, codec=codec))
    return st(batch)


#: band-value groups above this size switch from all-pairs to a hub star
#: (min-id member vs the rest) — same clip MinHash's ``_bucket_pairs_vec``
#: applies at ``_STAR_CLIP``. A group only grows this large when hundreds
#: of images share 16 identical hash bits; in practice that is an
#: exact-duplicate flood (all 64 bits equal), where the hub star yields
#: the SAME connected components as the full clique at linear cost. For a
#: mixed giant group the star may miss a non-hub pair in THIS band, but
#: any pair within ``max_hamming`` still has ≥1 identical band out of
#: ``max_hamming+1`` by pigeonhole, so it gets ``max_hamming+1`` chances
#: across bands — only pairs whose every identical band is a clipped
#: giant group can be lost, and those live inside near-duplicate floods
#: already connected through the hubs.
_PHASH_CLIP = 200


def phash_dup_pairs(ds, max_hamming: int = 3, id_col: str = "img_id"):
    """Near-duplicate image pairs by pHash banding: the 64-bit hash is
    split into ``max_hamming + 1`` contiguous bands (4 bands × 16 bits at
    the default ``max_hamming=3``); images sharing ANY band value are
    candidates — pigeonhole is exact, a pair with ≤ ``max_hamming``
    differing bits cannot differ in all ``max_hamming + 1`` bands — then
    the exact Hamming distance verifies. Wider bands keep buckets small
    at scale: 16-bit bands give 65 536 values/band, so at 10⁹ images an
    average band-value group is ~15 k rows, vs ~4 M for the old 8-bit
    bands whose unclipped all-pairs went quadratic on hot values; groups
    above ``_PHASH_CLIP`` are additionally clipped to a min-id hub star
    (see the clip note above). Returns ``(a, b, hamming)`` pairs sorted
    by id — candidate-bounded, never all-pairs (same exchange shape as
    dedup.simhash_pairs; the input Dataset must already carry the
    ``phash`` column from the ``PHashImage`` stage). Band count caps at 8
    (8-bit bands) for ``max_hamming > 7``, where banding recall is no
    longer exhaustive — same contract as before.
    """
    import pandas as pd

    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    nb = min(8, max(1, int(max_hamming) + 1))
    widths = [64 // nb + (1 if i < 64 % nb else 0) for i in range(nb)]
    offs = np.cumsum([0] + widths[:-1])
    shifts = np.array(offs, dtype=np.uint64)
    masks = np.array(
        [(1 << w) - 1 if w < 64 else ~0 & 0xFFFFFFFFFFFFFFFF for w in widths],
        dtype=np.uint64,
    )

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        ph = batch["phash"].to_numpy().astype(np.uint64)
        chunks = (ph[:, None] >> shifts) & masks
        # mix the band index in so equal chunk values in different bands
        # never share a bucket; uint64 wraparound mixing is a pure
        # function of (chunk, band) so recall is unaffected and any hash
        # collision only ADDS candidates for the verify step to discard
        with np.errstate(over="ignore"):
            bvs = chunks * np.uint64(0x9E3779B97F4A7C15) + np.arange(
                nb, dtype=np.uint64
            )
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, nb), pa.int64()),
                "band_val": pa.array(bvs.ravel(), pa.uint64()),
                "phash": pa.array(np.repeat(ph, nb), pa.uint64()),
            }
        )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("band_val", sort=False):
            rows = g.drop_duplicates(id_col).sort_values(id_col)
            if len(rows) < 2:
                continue
            ids = rows[id_col].to_numpy()
            ph = rows["phash"].to_numpy(dtype=np.uint64)
            if len(ids) > _PHASH_CLIP:
                # hub star: min id vs the rest, linear in group size
                x = ph[0] ^ ph[1:]
                dist = np.unpackbits(
                    x[:, None].view(np.uint8), axis=1
                ).sum(axis=1)
                keep = dist <= max_hamming
                ia = np.zeros(int(keep.sum()), dtype=np.intp)
                ib = np.nonzero(keep)[0] + 1
            else:
                iu = np.triu_indices(len(ids), k=1)
                x = ph[iu[0]] ^ ph[iu[1]]
                dist = np.unpackbits(
                    x[:, None].view(np.uint8), axis=1
                ).sum(axis=1)
                keep = dist <= max_hamming
                ia, ib = iu[0][keep], iu[1][keep]
            if len(ia):
                out.append(
                    pd.DataFrame(
                        {
                            "a": ids[ia],
                            "b": ids[ib],
                            "hamming": dist[keep],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {"a": [], "b": [], "hamming": []}, dtype="int64"
            )
        return pd.concat(out, ignore_index=True)

    refs = bucketed_group_map_refs(
        ds.map_batches(bands, batch_format="pyarrow"),
        bucket_on="band_val",
        fn=pairs_in_bucket,
    )
    got = (
        gather_refs_pd(refs)
        if refs is not None
        else pd.DataFrame({"a": [], "b": [], "hamming": []})
    )
    if len(got) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": []}, dtype="int64")
    return (
        got.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64", "hamming": "int64"})
    )


# ------------------------------------------------------ content sniffing

#: magic-byte table, longest-prefix-first (every signature is a public
#: file-format magic: PNG/JPEG/GIF/PDF/gzip/ZIP/RIFF/WEBP containers,
#: plus the WHATWG MIME-sniffing HTML heuristic below). Served
#: Content-Type headers lie constantly at crawl scale; sinks and decode
#: stages route on SNIFFED type.
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"%PDF-", "application/pdf"),
    (b"\x1f\x8b", "application/gzip"),
    (b"PK\x03\x04", "application/zip"),
    (b"RIFF", "application/riff"),  # refined to wav/webp below
    (b"OggS", "application/ogg"),
]


def sniff_mime(data_col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Vectorized magic-byte MIME sniffing over a binary column: compare
    fixed-length prefixes with numpy (no per-row Python beyond one slice),
    longest/most-specific signature wins; RIFF containers refine on the
    format tag at offset 8 (WAVE → audio/wav, WEBP → image/webp); payloads
    starting with optional whitespace then ``<`` classify as text/html
    (the WHATWG sniffing heuristic's HTML arm, simplified and stated);
    anything else is application/octet-stream, empty/null is NULL."""
    if isinstance(data_col, pa.ChunkedArray):
        data_col = data_col.combine_chunks()
    vals = data_col.to_pylist()
    # one fixed-width prefix matrix; per-row cost is a single memcpy
    W = 16
    n = len(vals)
    pref = np.zeros((n, W), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    for i, b in enumerate(vals):
        if b:
            lens[i] = len(b)
            chunk = b[:W]
            pref[i, : len(chunk)] = np.frombuffer(chunk, dtype=np.uint8)
    out = np.full(n, "application/octet-stream", dtype=object)

    def starts(sig: bytes) -> np.ndarray:
        s = np.frombuffer(sig, dtype=np.uint8)
        return (lens >= len(s)) & (pref[:, : len(s)] == s).all(axis=1)

    # HTML heuristic first so specific magics below override it
    stripped_lt = np.zeros(n, dtype=bool)
    for i, b in enumerate(vals):
        if b:
            s = b[:64].lstrip(b" \t\r\n\f")
            stripped_lt[i] = s[:1] == b"<"
    out[stripped_lt] = "text/html"
    for sig, mime in _MAGIC:
        m = starts(sig)
        if mime == "application/riff":
            tag = (lens >= 12) & m
            wave = tag & (pref[:, 8:12] == np.frombuffer(b"WAVE", np.uint8)).all(axis=1)
            webp = tag & (pref[:, 8:12] == np.frombuffer(b"WEBP", np.uint8)).all(axis=1)
            out[wave] = "audio/wav"
            out[webp] = "image/webp"
            out[m & ~wave & ~webp] = "application/octet-stream"
        else:
            out[m] = mime
    out[lens == 0] = None
    return pa.array(out.tolist(), pa.string())
