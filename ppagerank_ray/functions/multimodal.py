"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `payload: binary` columns with a
`media_type` string and decode/feature stages are actor-pool map_batches.

Round 3: `decode=True` is REAL for the formats decodable with
stdlib+numpy alone — netpbm P5/P6 images and RIFF PCM16 WAV (codecs at
the bottom of this module): decoded features, nearest-neighbor image
resize, and temporal audio frame windows. Formats that genuinely require
external codecs (jpeg/png/mp4) raise NotImplementedError naming what is
missing. The decode=False byte-domain paths remain the SQL-oracled
plumbing checks.

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
    decode=True → REAL decode for netpbm images and PCM16 WAV
    (stdlib+numpy codecs below, round 3); other media types raise
    NotImplementedError (jpeg/png/mp4 need PIL/ffmpeg, absent here)."""

    def __init__(self, decode: bool = False):
        self.decode = decode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decode:
            feats = [
                decoded_features(mt, p)
                for mt, p in zip(
                    t["media_type"].to_pylist(), t["payload"].to_pylist()
                )
            ]
            return pa.Table.from_pydict(
                {
                    "media_id": t["media_id"],
                    "media_type": t["media_type"],
                    "features": pa.array(feats, type=pa.list_(pa.float64())),
                }
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
            # REAL temporal frames for PCM16 WAV (round 3): up to n_frames
            # evenly-spaced windows of frame_bytes//2 samples, emitted as
            # raw little-endian PCM16 bytes. Still images have no temporal
            # axis; video containers need ffmpeg — both raise.
            ids, idxs, frames = [], [], []
            for mid, mt, payload in zip(
                t["media_id"].to_pylist(),
                t["media_type"].to_pylist(),
                t["payload"].to_pylist(),
            ):
                if mt != WAV_TYPE:
                    raise NotImplementedError(
                        f"frame decode of {mt!r} needs ffmpeg (absent); "
                        f"only {WAV_TYPE} frames decode here"
                    )
                samples, _ = decode_wav(payload)
                win = max(1, self.frame_bytes // 2)
                # clamp: a non-empty clip shorter than one window still
                # emits one (truncated) frame instead of silently dropping
                total = len(samples) // win
                if total == 0 and len(samples):
                    total = 1
                take = min(self.n_frames, total)
                for k in range(take):
                    fi = k * total // take
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        samples[fi * win : (fi + 1) * win].astype("<i2").tobytes()
                    )
            return pa.Table.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "frame_idx": pa.array(idxs, pa.int64()),
                    "frame": pa.array(frames, pa.binary()),
                }
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
            # REAL nearest-neighbor image resize for netpbm payloads
            # (round 3): halve each dimension (min 1), re-encode. Other
            # types need PIL — raise.
            out, orig_n, out_n = [], [], []
            for mt, payload in zip(
                t["media_type"].to_pylist(), t["payload"].to_pylist()
            ):
                if mt not in PNM_TYPES:
                    raise NotImplementedError(
                        f"decoded resize of {mt!r} needs PIL (absent); "
                        f"only {PNM_TYPES} resize here"
                    )
                img = decode_pnm(payload)
                h, w = img.shape[:2]
                nh, nw = max(1, h // 2), max(1, w // 2)
                ri = (np.arange(nh) * h // nh)
                ci = (np.arange(nw) * w // nw)
                small = img[np.ix_(ri, ci)]
                enc = encode_pgm(small)
                out.append(enc)
                orig_n.append(len(payload))
                out_n.append(len(enc))
            return pa.Table.from_pydict(
                {
                    "media_id": t["media_id"],
                    "media_type": t["media_type"],
                    "payload": pa.array(out, pa.binary()),
                    "orig_bytes": pa.array(orig_n, pa.int64()),
                    "out_bytes": pa.array(out_n, pa.int64()),
                }
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


# ---------- real codecs (stdlib + numpy only — round 3 de-stubbing) ----------
#
# The container has no PIL/ffmpeg, but two honest formats need neither:
# PGM/PPM (netpbm binary P5/P6) and WAV (RIFF PCM16). decode=True is REAL
# for these; formats that genuinely require external codecs (jpeg/png/mp4)
# still raise NotImplementedError, now listed explicitly.

PNM_TYPES = ("image/x-portable-graymap", "image/x-portable-pixmap")
WAV_TYPE = "audio/wav"
DECODABLE_TYPES = PNM_TYPES + (WAV_TYPE,)


def encode_pgm(img: np.ndarray) -> bytes:
    """uint8 HxW (P5) or HxWx3 (P6) array → binary netpbm bytes."""
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError("expect HxW or HxWx3 uint8")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_pnm(b: bytes) -> np.ndarray:
    """Binary netpbm P5 (gray) / P6 (rgb) → uint8 array."""
    if b[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    # header: magic, width, height, maxval — whitespace separated, with
    # optional '#' comments; pixel data starts after ONE whitespace byte
    # following maxval
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    depth = 1 if b[:2] == b"P5" else 3
    arr = np.frombuffer(b, dtype=np.uint8, count=w * h * depth, offset=i)
    return arr.reshape((h, w) if depth == 1 else (h, w, 3))


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → (int16 samples [n, channels], rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(b), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 wav supported")
        raw = f.readframes(f.getnframes())
        rate = f.getframerate()
        ch = f.getnchannels()
    return np.frombuffer(raw, dtype="<i2").reshape(-1, ch), rate


def decoded_features(media_type: str, payload: bytes) -> list[float]:
    """FEATURE_DIM real decoded features per payload. Images: (width,
    height, channels, mean, std, min, max, 0). Audio: (n_samples, rate,
    channels, mean, rms, min, max, zero_crossings)."""
    if media_type in PNM_TYPES:
        img = decode_pnm(payload).astype(np.float64)
        ch = 1 if img.ndim == 2 else img.shape[2]
        return [
            float(img.shape[1]), float(img.shape[0]), float(ch),
            round(float(img.mean()), 6), round(float(img.std()), 6),
            float(img.min()), float(img.max()), 0.0,
        ]
    if media_type == WAV_TYPE:
        s, rate = decode_wav(payload)
        x = s.astype(np.float64)
        zc = int(np.sum(np.abs(np.diff(np.signbit(x[:, 0]).astype(np.int8))))) if len(x) > 1 else 0
        return [
            float(len(x)), float(rate), float(s.shape[1]),
            round(float(x.mean()), 6),
            round(float(np.sqrt(np.mean(x * x))), 6),
            float(x.min()), float(x.max()), float(zc),
        ]
    raise NotImplementedError(
        f"decode of {media_type!r} requires external codecs (PIL/ffmpeg) "
        f"not present in this environment; decodable here: {DECODABLE_TYPES}"
    )


def synth_codec_media_from_documents(docs: rd.Dataset) -> rd.Dataset:
    """Deterministic REAL-format media table from the documents: even
    doc_id → 16×24 grayscale PGM, odd → 256-sample PCM16 WAV; pixel/sample
    values are splitmix64-derived from (doc_id, position) so every payload
    is reproducible without the text."""

    def to_media(t: pa.Table) -> pa.Table:
        from ppagerank_ray.algos.anf import splitmix64

        ids = t["doc_id"].to_numpy()
        types, payloads = [], []
        for did in ids:
            h = splitmix64(
                np.uint64(did) + np.arange(16 * 24, dtype=np.uint64) * np.uint64(0x9E3779B9)
            )
            if did % 2 == 0:
                img = (h % np.uint64(256)).astype(np.uint8).reshape(16, 24)
                types.append(PNM_TYPES[0])
                payloads.append(encode_pgm(img))
            else:
                samples = (h[:256] % np.uint64(4096)).astype(np.int64) - 2048
                types.append(WAV_TYPE)
                payloads.append(encode_wav(samples.astype(np.int16)))
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(types, type=pa.string()),
                pa.array(payloads, type=pa.binary()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        to_media, batch_format="pyarrow", batch_size=1024
    )
