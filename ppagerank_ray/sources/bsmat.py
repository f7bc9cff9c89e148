"""BSMAT source/sink — the reference's primary binary matrix format.

Format (petsc_util.cc:303-318 header, :560-597 triple decode): native-endian
header `int32 M, int32 N, uint32 nnz`, then packed 16-byte triples
`(uint32 row, uint32 col, float64 val)`; required sidecar `<base>.degs` of
raw int32 per-row out-degrees (petsc_util.cc:360-390, headerless); either
file may be gzipped (sniffed by magic, util/file.hpp:199-211).

The reference loads this with a root-reader + MPI_Scatterv pipeline
(petsc_util.cc:505-670); here the uncompressed path is a PARALLEL byte-range
read — the triple region is split into 16-byte-aligned chunks and each Ray
task seeks+reads its own range, which is exactly what Ray's parquet reader
does for row groups and removes the reference's serial-I/O bottleneck
(SURVEY.md §4 'Input parallelism'). Gzip falls back to a streaming
sequential read (gzip is not splittable), mirroring the reference's gzread
path.

Bounds validation matches petsc_util.cc:564-575 (row < M, col < N → error
naming the offending nonzero), and the degs sidecar is cross-checked against
the actual row counts like petsc_util.cc:633-637.
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

TRIPLE = np.dtype([("row", "<u4"), ("col", "<u4"), ("val", "<f8")])
HEADER_BYTES = 4 + 4 + 4


def write_bsmat(
    path: str,
    src: np.ndarray,
    dst: np.ndarray,
    vals: np.ndarray,
    m: int,
    n: int,
    compress: bool = False,
    write_degs: bool = True,
):
    """Sink: edge arrays → BSMAT + .degs sidecar (reference-compatible)."""
    triples = np.empty(len(src), dtype=TRIPLE)
    triples["row"] = src
    triples["col"] = dst
    triples["val"] = vals
    opener = gzip.open if compress else open
    with opener(path, "wb") as f:
        f.write(struct.pack("<iiI", m, n, len(src)))
        f.write(triples.tobytes())
    if write_degs:
        degs = np.bincount(src, minlength=m).astype("<i4")
        base = path[: -len(".gz")] if path.endswith(".gz") else path
        with open(base + ".degs", "wb") as f:
            f.write(degs.tobytes())


def _is_gzip(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == b"\x1f\x8b"


def read_bsmat_header(path: str) -> tuple[int, int, int]:
    opener = gzip.open if _is_gzip(path) else open
    with opener(path, "rb") as f:
        m, n, nnz = struct.unpack("<iiI", f.read(HEADER_BYTES))
    return m, n, nnz


def read_degs(path: str, m: int) -> np.ndarray:
    """<base>.degs (or .degs.gz): raw int32 per row."""
    if os.path.exists(path):
        with open(path, "rb") as f:
            raw = f.read()
    elif os.path.exists(path + ".gz"):
        with gzip.open(path + ".gz", "rb") as f:
            raw = f.read()
    else:
        raise FileNotFoundError(f"cannot find degree file {path} or {path}.gz")
    degs = np.frombuffer(raw, dtype="<i4")
    if len(degs) != m:
        raise ValueError(f"degs file has {len(degs)} rows, matrix has {m}")
    return degs.astype(np.int64)


@ray.remote
def _read_range(path: str, offset: int, count: int, m: int, n: int, base_idx: int):
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(count * TRIPLE.itemsize)
    t = np.frombuffer(raw, dtype=TRIPLE)
    _validate(t, m, n, base_idx)
    return pa.Table.from_pydict(
        {
            "src": t["row"].astype(np.int64),
            "dst": t["col"].astype(np.int64),
            "weight": t["val"].astype(np.float64),
        }
    )


def _validate(t: np.ndarray, m: int, n: int, base_idx: int):
    bad = np.flatnonzero(t["row"] >= m)
    if len(bad):
        raise ValueError(
            f"row={int(t['row'][bad[0]])} is out of range in non-zero "
            f"{base_idx + int(bad[0]) + 1}"
        )
    bad = np.flatnonzero(t["col"] >= n)
    if len(bad):
        raise ValueError(
            f"column={int(t['col'][bad[0]])} is out of range in non-zero "
            f"{base_idx + int(bad[0]) + 1}"
        )


def read_bsmat(
    path: str,
    parallelism: int = 0,
    validate_degs: bool = True,
    chunk_nnz: int = 1 << 22,
) -> tuple[rd.Dataset, int, int, int]:
    """BSMAT → ((src, dst, weight) Dataset, M, N, nnz)."""
    gz = _is_gzip(path)
    m, n, nnz = read_bsmat_header(path)
    if gz:
        # gzip is not splittable: stream in chunks (reference gzread path)
        def gen():
            with gzip.open(path, "rb") as f:
                f.read(HEADER_BYTES)
                done = 0
                while done < nnz:
                    take = min(chunk_nnz, nnz - done)
                    t = np.frombuffer(
                        f.read(take * TRIPLE.itemsize), dtype=TRIPLE
                    )
                    _validate(t, m, n, done)
                    yield pa.Table.from_pydict(
                        {
                            "src": t["row"].astype(np.int64),
                            "dst": t["col"].astype(np.int64),
                            "weight": t["val"].astype(np.float64),
                        }
                    )
                    done += take
        tables = list(gen())
        ds = rd.from_arrow(tables) if tables else rd.from_arrow(
            pa.Table.from_pydict(
                {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64),
                 "weight": np.empty(0, np.float64)}
            )
        )
    else:
        if parallelism <= 0:
            parallelism = max(
                1, min(int(ray.cluster_resources().get("CPU", 8)) * 2, nnz // 65536 + 1)
            )
        bounds = [nnz * i // parallelism for i in range(parallelism + 1)]
        refs = [
            _read_range.remote(
                os.path.abspath(path),
                HEADER_BYTES + bounds[i] * TRIPLE.itemsize,
                bounds[i + 1] - bounds[i],
                m,
                n,
                bounds[i],
            )
            for i in range(parallelism)
            if bounds[i + 1] > bounds[i]
        ]
        ds = rd.from_arrow_refs(refs)
    if validate_degs:
        base = path[: -len(".gz")] if path.endswith(".gz") else path
        degs = read_degs(
            (os.path.splitext(base)[0] + ".degs")
            if base.endswith(".gz")
            else base + ".degs",
            m,
        )
        actual = np.zeros(m, dtype=np.int64)
        for t in ray.get(ds.to_arrow_refs()):
            if t.num_rows:
                actual += np.bincount(t["src"].to_numpy(), minlength=m)
        if not np.array_equal(actual, degs):
            i = int(np.flatnonzero(actual != degs)[0])
            raise ValueError(
                f"degree file mismatch at row {i}: degs={int(degs[i])} "
                f"actual={int(actual[i])}"
            )
    return ds, m, n, nnz


def load_matrix(path: str, hint: str | None = None):
    """Format dispatch by hint or extension+sniff — MatLoadPickType
    (ppagerank_main.cc:268-344). Returns (edges Dataset, M, N, nnz).
    Known formats: bsmat (+gz), parquet edge tables. The reference's empty
    cluto/smat/graph-text stubs (ppagerank_main.cc:291-326) are not
    reproduced; unknown formats raise."""
    ext = os.path.splitext(path)[1].lower()
    if hint == "bvgraph" or ext == ".graph" or (
        hint is None
        and os.path.exists(path + ".properties")
        and os.path.exists(path + ".graph")
    ):
        from ppagerank_ray.sources.bvgraph import read_bvgraph

        basename = path[: -len(".graph")] if ext == ".graph" else path
        return read_bvgraph(basename)
    if hint == "bsmat" or ext in (".bsmat", ".smat") or (
        hint is None and ext == ".gz" and ".bsmat" in path
    ):
        return read_bsmat(path)
    if hint == "parquet" or ext == ".parquet" or os.path.isdir(path):
        ds = rd.read_parquet(path)
        names = ds.schema().names
        if "src" not in names or "dst" not in names:
            raise ValueError(f"parquet edge table needs src/dst columns, got {names}")
        import ray.data.aggregate as agg

        mx = ds.aggregate(agg.Max("src"), agg.Max("dst"))
        m = int(mx["max(src)"]) + 1
        n = int(mx["max(dst)"]) + 1
        return ds, m, n, ds.count()
    raise ValueError(f"unknown matrix format for {path} (hint={hint})")
