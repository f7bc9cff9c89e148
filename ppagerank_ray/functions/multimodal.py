"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `payload: binary` columns with a
`media_type` string and decode/feature stages are actor-pool map_batches.
The actual codecs are NOT available in this environment, so `decode=True`
raises NotImplementedError by design (clearly-marked stub); the default path
computes deterministic byte-level features so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and tested.

A real deployment would put PIL/ffmpeg in `MediaFeatureExtractor.__init__`
(once per actor) and decode in `__call__`, keeping batches small
(large binary rows → small batch_size per the memory guidance).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
    ]
)

FEATURE_DIM = 8


def synth_media_from_documents(docs: rd.Dataset) -> rd.Dataset:
    """Deterministic fake media table: payload = utf-8 bytes of the text
    (stands in for encoded image/audio bytes)."""

    def to_media(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy()
        types = ["image/fake" if i % 2 == 0 else "audio/fake" for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(types, type=pa.string()),
                pa.array([x.encode("utf-8") for x in texts], type=pa.binary()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow", batch_size=1024
    )


class MediaFeatureExtractor:
    """Actor-pool stage. decode=False → deterministic byte-level features
    (n_bytes, first, last, checksum mod 2^31, 4 quartile bytes).
    decode=True → STUB: the container has no image/audio codecs."""

    def __init__(self, decode: bool = False):
        self.decode = decode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decode:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg, not available in this "
                "environment; run with decode=False for byte-level features"
            )
        payloads = t["payload"].to_pylist()
        feats = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
        for i, p in enumerate(payloads):
            b = np.frombuffer(p, dtype=np.uint8)
            if len(b) == 0:
                continue
            q = np.quantile(b, [0.25, 0.5, 0.75, 1.0])
            feats[i] = [
                len(b),
                b[0],
                b[-1],
                int(b.astype(np.int64).sum()) % (1 << 31),
                *q,
            ]
        return pa.Table.from_pydict(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "features": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


def media_features(
    media: rd.Dataset, decode: bool = False, concurrency: int = 2
) -> rd.Dataset:
    import ray

    from ppagerank_ray.config import safe_concurrency

    concurrency = safe_concurrency(concurrency)
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=(decode,),
        batch_format="pyarrow",
        batch_size=512,  # binary payloads: keep batches small
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool stage: sample up to `n_frames` evenly-spaced "frames"
    from each payload. Real codecs are unavailable in this environment, so
    decode=True raises (clearly-marked stub, like MediaFeatureExtractor);
    the default path treats the payload as a fixed-stride frame container
    (frame i = bytes[i*frame_bytes : (i+1)*frame_bytes]) — a deterministic
    fake that exercises the real Ray-side shape: one input row fans out to
    ≤ n_frames rows of (media_id, frame_idx, frame: binary)."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 64,
                 decode: bool = False):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self.decode = decode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decode:
            raise NotImplementedError(
                "video/audio frame decode requires ffmpeg, not available in "
                "this environment; run with decode=False for the container-"
                "slicing fake"
            )
        ids, idxs, frames = [], [], []
        for mid, payload in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist()
        ):
            total = max(len(payload) // self.frame_bytes, 0)
            take = min(self.n_frames, total)
            if take == 0:
                continue
            # evenly spaced frame indices across the container
            for k in range(take):
                fi = k * total // take
                ids.append(mid)
                idxs.append(fi)
                frames.append(
                    payload[fi * self.frame_bytes : (fi + 1) * self.frame_bytes]
                )
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def frame_sample(
    media: rd.Dataset,
    n_frames: int = 4,
    frame_bytes: int = 64,
    decode: bool = False,
    concurrency: int = 2,
) -> rd.Dataset:
    from ppagerank_ray.config import safe_concurrency

    return media.map_batches(
        FrameSampler,
        fn_constructor_args=(n_frames, frame_bytes, decode),
        batch_format="pyarrow",
        batch_size=256,  # fan-out stage: keep input batches small
        concurrency=safe_concurrency(concurrency),
    )


class Resizer:
    """Actor-pool stage: "resize" each payload to a fixed byte budget.
    decode=True (real image resize via PIL) raises — stub; the default
    path is deterministic byte-domain downsampling (stride-sampled bytes),
    preserving the schema contract of a real resize stage: same rows,
    bounded payload size, (orig_bytes, out_bytes) metadata."""

    def __init__(self, target_bytes: int = 256, decode: bool = False):
        self.target_bytes = target_bytes
        self.decode = decode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decode:
            raise NotImplementedError(
                "image resize requires PIL, not available in this "
                "environment; run with decode=False for byte downsampling"
            )
        out, orig_n, out_n = [], [], []
        for payload in t["payload"].to_pylist():
            b = np.frombuffer(payload, dtype=np.uint8)
            if len(b) > self.target_bytes:
                idx = np.linspace(0, len(b) - 1, self.target_bytes).astype(np.int64)
                b = b[idx]
            out.append(b.tobytes())
            orig_n.append(len(payload))
            out_n.append(len(b))
        return pa.Table.from_pydict(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "payload": pa.array(out, pa.binary()),
                "orig_bytes": pa.array(orig_n, pa.int64()),
                "out_bytes": pa.array(out_n, pa.int64()),
            }
        )


def resize_media(
    media: rd.Dataset,
    target_bytes: int = 256,
    decode: bool = False,
    concurrency: int = 2,
) -> rd.Dataset:
    from ppagerank_ray.config import safe_concurrency

    return media.map_batches(
        Resizer,
        fn_constructor_args=(target_bytes, decode),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=safe_concurrency(concurrency),
    )
