"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
alongside (the crawl engine's image path already produces exactly this:
``url, filename, data, nbytes``). The decode / feature-extract / resize /
frame-sample stages are actor-pool ``map_batches`` stages whose Ray-side
shape — schema, batch sizing for large payloads, per-actor codec setup,
output layout — is real and tested; the codec call itself is STUBBED
because no image/audio library ships in this container:

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
