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
