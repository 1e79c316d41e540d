"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Large-scale training pipelines treat media as ``BinaryType`` content columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``
stages — that plumbing (schemas, batch shapes, 1→N frame fanout,
partitioning) is fully real and tested here.  Only the *codec* decode step
is environment-gated: with no image/audio libraries in the runtime, "raw"
payloads are processed with pure numpy, and compressed codecs raise a
clearly marked ``NotImplementedError`` unless PIL/soundfile happen to be
installed (import-try, never a hard dependency).

Scale notes: media rows are large (MBs); the stages below never shuffle the
content column — features/frames project it away as early as possible, and
fanout stages emit only the slices they keep.  Partition sizing is by bytes,
not rows: repartition upstream so a partition's content fits executor
memory (``spark.sql.files.maxPartitionBytes`` governs the scan side).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - environment-dependent
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

MEDIA_METADATA = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("codec", StringType(), True),  # 'raw' | 'jpeg' | 'png' | 'pcm16' | 'rawvideo'
        StructField("n_frames", IntegerType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("metadata", MEDIA_METADATA, True),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_histogram", ArrayType(FloatType()), True),  # 16 bins, normalized
        StructField("mean_intensity", FloatType(), True),
    ]
)

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("rms", FloatType(), True),
        StructField("peak", FloatType(), True),
        StructField("chunk_rms", ArrayType(FloatType()), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def _decode_image(content: bytes, meta) -> np.ndarray:
    """Binary → HxWxC uint8 array.  'raw' is real (numpy reshape); codec
    formats need an image library (stubbed)."""
    codec = meta["codec"]
    if codec == "raw":
        w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"] or 1)
        return np.frombuffer(content, dtype=np.uint8)[: w * h * c].reshape(h, w, c)
    if not _HAS_PIL:  # pragma: no cover
        raise NotImplementedError(
            f"decoding codec {codec!r} requires an image library not present in this "
            "runtime; supply 'raw' payloads or install PIL"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(content)))  # pragma: no cover


def extract_image_features(media: DataFrame) -> DataFrame:
    """Per-image features via Arrow-batched mapInPandas (pure numpy).

    Content is consumed inside the stage and never emitted — the output is
    feature-sized, so downstream shuffles move KBs, not media bytes.
    """
    cols = [f.name for f in IMAGE_FEATURE_SCHEMA.fields]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                buf = np.frombuffer(r["content"] or b"", dtype=np.uint8)
                hist = np.histogram(buf, bins=16, range=(0, 256))[0].astype(np.float64)
                total = hist.sum() or 1.0
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(buf),
                        "byte_histogram": (hist / total).astype(np.float32).tolist(),
                        "mean_intensity": float(buf.mean()) if len(buf) else None,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.filter(F.col("kind") == "image").mapInPandas(feats, IMAGE_FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize for 'raw' images (pure numpy); codec formats
    are the stubbed path (`_decode_image`).  Output keeps MEDIA_SCHEMA."""
    cols = [f.name for f in MEDIA_SCHEMA.fields]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["metadata"]
                img = _decode_image(r["content"], meta)
                h, w = img.shape[0], img.shape[1]
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = img[yi][:, xi]
                new_meta = dict(meta.asDict() if hasattr(meta, "asDict") else meta)
                new_meta.update(width=out_w, height=out_h)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "content": resized.tobytes(),
                        "metadata": new_meta,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.filter(F.col("kind") == "image").mapInPandas(resize, MEDIA_SCHEMA)


def extract_audio_features(media: DataFrame, chunk: int = 1024) -> DataFrame:
    """PCM16 audio → RMS/peak + per-chunk RMS profile (pure numpy)."""
    cols = [f.name for f in AUDIO_FEATURE_SCHEMA.fields]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["metadata"]
                if meta["codec"] != "pcm16":
                    raise NotImplementedError(
                        f"audio codec {meta['codec']!r} requires an audio library not "
                        "present in this runtime; supply 'pcm16' payloads"
                    )
                samples = np.frombuffer(r["content"] or b"", dtype="<i2").astype(np.float64) / 32768.0
                n = len(samples)
                n_chunks = (n + chunk - 1) // chunk
                crms = [
                    float(np.sqrt(np.mean(samples[i * chunk : (i + 1) * chunk] ** 2)))
                    for i in range(n_chunks)
                ]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_samples": n,
                        "rms": float(np.sqrt(np.mean(samples**2))) if n else None,
                        "peak": float(np.abs(samples).max()) if n else None,
                        "chunk_rms": np.asarray(crms, dtype=np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.filter(F.col("kind") == "audio").mapInPandas(feats, AUDIO_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: 1 media row → N frame rows (every_n-th frame).

    'rawvideo' = concatenated raw frames of width*height*channels bytes; the
    fanout happens inside the Arrow batch so only kept frames are emitted.
    """
    cols = [f.name for f in FRAME_SCHEMA.fields]

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["metadata"]
                if meta["codec"] != "rawvideo":
                    raise NotImplementedError(
                        f"video codec {meta['codec']!r} requires a video library not "
                        "present in this runtime; supply 'rawvideo' payloads"
                    )
                frame_bytes = int(meta["width"]) * int(meta["height"]) * int(meta["channels"] or 1)
                content = r["content"] or b""
                n_frames = int(meta["n_frames"] or (len(content) // frame_bytes))
                for fi in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_index": fi,
                            "frame": content[fi * frame_bytes : (fi + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.filter(F.col("kind") == "video").mapInPandas(frames, FRAME_SCHEMA)


DHASH_GRID = 61  # 61 block means → 60 adjacent-difference bits (sign-bit-free)
DHASH_BITS = DHASH_GRID - 1

_WEIGHTS_CACHE: dict[int, np.ndarray] = {}


def _bit_weights(bits: int) -> np.ndarray:
    """MSB-first bit weights as a python-int (object) array — shared by the
    per-blob hash helpers; object dtype keeps the recomposition exact past
    int64 for any future grid width."""
    w = _WEIGHTS_CACHE.get(bits)
    if w is None:
        w = (1 << np.arange(bits - 1, -1, -1, dtype=np.int64)).astype(object)
        _WEIGHTS_CACHE[bits] = w
    return w


def dhash_blob(blob, grid: int = DHASH_GRID) -> tuple[int, int]:
    """The per-blob core of :func:`content_dhash` — (n_bytes, dhash) for one
    binary payload.  Factored out (r14) so fused Arrow stages (planted
    transform + fingerprint in ONE pass, guide §4: hash inside the decode
    stage instead of round-tripping blobs between two Python stages) share
    EXACTLY this arithmetic with the standalone operator."""
    arr = np.frombuffer(bytes(blob or b""), dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return 0, 0
    blk = (np.arange(n, dtype=np.int64) * grid) // n
    s = np.bincount(blk, weights=arr, minlength=grid).astype(np.int64)
    c = np.bincount(blk, minlength=grid).astype(np.int64)
    b = (s[1:] * c[:-1] > s[:-1] * c[1:]).astype(object)
    return n, int((b * _bit_weights(grid - 1)).sum())


def image_dhash_blob(blob, width: int, grid: int = 8) -> tuple[int, int | None]:
    """The per-image core of :func:`image_dhash` — (n_bytes, dhash or None
    when the image lacks a grid×grid region).  Shared arithmetic contract
    as :func:`dhash_blob`."""
    arr = np.frombuffer(bytes(blob or b""), dtype=np.uint8)
    n, w = len(arr), int(width)
    h_rows = n // w if w > 0 else 0
    hu = h_rows - (h_rows % grid)
    wu = w - (w % grid)
    if hu < grid or wu < grid:
        return n, None
    img = arr[: hu * w].reshape(hu, w)[:, :wu].astype(np.int64)
    blocks = img.reshape(grid, hu // grid, grid, wu // grid).sum(axis=(1, 3))
    h = 0
    for y in range(grid):
        for x in range(grid - 1):
            h = (h << 1) | int(blocks[y, x + 1] > blocks[y, x])
    return n, h


def audio_energy_dhash_blob(blob, grid: int) -> tuple[int, int]:
    """The per-clip core of :func:`audio_energy_dhash` — (n_samples, dhash)
    for one little-endian pcm16 payload (odd trailing byte dropped, the
    r13 totality rule).  Shared arithmetic contract as :func:`dhash_blob`."""
    raw = bytes(blob or b"")
    s = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(np.int64)
    n = len(s)
    if n == 0:
        return 0, 0
    blk = (np.arange(n, dtype=np.int64) * grid) // n
    e = np.bincount(blk, weights=s * s, minlength=grid).astype(np.int64)
    c = np.bincount(blk, minlength=grid).astype(np.int64)
    b = (e[1:] * c[:-1] > e[:-1] * c[1:]).astype(object)
    return n, int((b * _bit_weights(grid - 1)).sum())

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("dhash", LongType(), False),
    ]
)


def content_dhash(
    content_df: DataFrame, grid: int = DHASH_GRID, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Perceptual difference-hash (dHash) over opaque binary content via the
    Arrow-batched ``mapInPandas`` decode stage (round 13 — VERDICT r12 task
    1: the multimodal near-dup family beyond exact md5).

    The classic dHash recipe (resize → compare adjacent cells), expressed
    over the byte stream: content is block-mean downsampled onto a fixed
    ``grid`` of equal-frequency byte ranges (block ``b`` covers bytes ``i``
    with ``(i*grid) DIV n == b`` — the standard bucketing, every block
    non-empty once ``n >= grid``), and bit ``j`` is 1 iff block ``j+1``'s
    mean exceeds block ``j``'s.  Means are compared CROSS-MULTIPLIED
    (``s[j+1]*c[j] > s[j]*c[j+1]``) so the whole signature is exact integer
    arithmetic — which is also what makes it a DuckDB-oracle-checkable
    fingerprint (the hex-dump nibble walk, like ``media_frame_stats``).

    Perceptual properties (pinned by the planted-transform pytest):
    * global brightness shift (+k to every byte) preserves every bit
      exactly — adding ``k`` to all means adds ``k·c[j]·c[j+1]`` to both
      sides of the cross-multiplied comparison;
    * small local noise / a small crop perturb block means slightly, so
      only bits whose adjacent means nearly tie can flip — near-dups land
      within a few Hamming bits, verified downstream with
      ``bit_count(xor)`` (the SimHash band machinery, reused verbatim);
    * the fixed grid makes the signature length-invariant: a re-encoded /
      padded twin with the same coarse intensity profile hashes nearby.

    60 bits (not 64) keeps the recomposed signature off the BIGINT sign
    bit, so the SQL oracle's arithmetic recomposition stays portable — the
    same trade ``simhash64`` documents for its 32-bit oracle domain.
    Default bands downstream: 4 × 15 bits (32 768 buckets per band);
    pigeonhole gives total recall for Hamming < 4.

    Content is consumed inside the stage and never emitted — output rows
    are 24 bytes, so the band join downstream shuffles signatures, never
    media bytes (the multimodal scale contract).  For codec media (jpeg /
    rawvideo) decode first (:func:`_decode_image` / :func:`sample_frames`)
    and hash the decoded buffer; raw payloads hash as-is.

    Exactness bound: the binding constraint is the cross-multiplied
    comparison itself — ``s[j+1]·c[j] ≈ 255·n²/grid²`` must stay inside
    int64, which holds for blobs up to ~1.1e10 bytes (~10 GB; the float64
    bincount sums stay integer-exact far past that).  Beyond it numpy
    wraps silently while DuckDB BIGINT raises, so the engines would
    diverge instead of hash-matching — keep single media rows under the
    bound (any realistic frame/image/clip is orders of magnitude below).

    Input: (media_id, content: binary).  Output: (media_id, n_bytes,
    dhash); ``extra_cols`` names input columns passed through unchanged
    (the metadata-passthrough pattern — content itself is still consumed
    in-stage, never emitted).
    """
    schema = StructType(
        DHASH_SCHEMA.fields + [content_df.schema[c] for c in extra_cols]
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_n, out_h = [], []
            for blob in pdf["content"]:
                n, h = dhash_blob(blob, grid)
                out_n.append(n)
                out_h.append(h)
            out = {"media_id": pdf["media_id"], "n_bytes": out_n, "dhash": out_h}
            for c in extra_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return content_df.mapInPandas(hashes, schema)


IMG_DHASH_GRID = 8  # 8×8 block means → 7 horizontal diffs × 8 rows = 56 bits
IMG_DHASH_BITS = (IMG_DHASH_GRID - 1) * IMG_DHASH_GRID

IMG_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("dhash", LongType(), True),  # NULL: image smaller than the grid
    ]
)


def image_dhash(
    media: DataFrame, grid: int = IMG_DHASH_GRID, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """TWO-DIMENSIONAL perceptual dHash for raw grayscale images (round 13
    — the 2-D sibling of :func:`content_dhash`, which treats content as a
    1-D stream).  Input rows carry their own ``width`` column (the typed-
    metadata pattern), so one Arrow stage hashes a mixed-resolution corpus.

    Recipe: crop to the largest grid-aligned region (``H_used = H − H %
    grid`` rows, ``W_used = W − W % grid`` cols), block-mean downsample
    onto the fixed grid×grid grid, and emit one bit per HORIZONTALLY
    adjacent block pair — bit(y, x) = 1 iff block(y, x+1)'s mean exceeds
    block(y, x)'s, packed row-major MSB-first: (grid−1)·grid = 56 bits,
    sign-bit-free in an int64.  Because the crop makes every block exactly
    ``(H_used/grid) × (W_used/grid)`` pixels, the counts CANCEL and the
    comparison is plain integer block sums — exact, overflow-free (sums ≤
    255·pixels), and SQL-mirrorable from the hex dump.

    The property the 1-D hash cannot have: RESOLUTION INVARIANCE.  A k×
    pixel-replication upscale of the grid-aligned region multiplies every
    block sum by exactly k² (block boundaries scale with H_used/W_used),
    so the comparisons — and the hash — are IDENTICAL in integer
    arithmetic, not approximately: a 16×16 thumbnail and its 32×32 copy
    pair at Hamming 0 (pytest + the oracle-checked
    ``media_image_dhash_pairs`` planted corpus).  Brightness shifts cancel
    the same way as in :func:`content_dhash` (equal-size blocks: +k per
    pixel adds the same term to both sums).

    Images with fewer than ``grid`` usable rows or columns hash to NULL
    (no 8×8 structure to compare — the no-evidence policy; pair queries
    filter them).  Input: (media_id, width int, content binary).  Output:
    (media_id, n_bytes, dhash nullable); ``extra_cols`` names input
    columns passed through unchanged (the :func:`content_dhash`
    passthrough pattern — round 14, so the video family's per-FRAME
    signatures keep their ``frame_index``; content itself is still
    consumed in-stage, never emitted)."""
    schema = StructType(IMG_DHASH_SCHEMA.fields + [media.schema[c] for c in extra_cols])

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_n, out_h = [], []
            for blob, w in zip(pdf["content"], pdf["width"]):
                n, h = image_dhash_blob(blob, w, grid)
                out_n.append(n)
                out_h.append(h)
            out = {"media_id": pdf["media_id"], "n_bytes": out_n, "dhash": out_h}
            for c in extra_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return media.mapInPandas(hashes, schema)


AUDIO_DHASH_GRID = 61  # 61 chunk energies → 60 adjacent-difference bits


def audio_energy_dhash(media: DataFrame, grid: int = AUDIO_DHASH_GRID) -> DataFrame:
    """Perceptual AUDIO fingerprint over pcm16 content (round 13 — the
    audio member of the dHash triad: 1-D bytes → :func:`content_dhash`,
    2-D images → :func:`image_dhash`, audio → this): the signal's ENERGY
    ENVELOPE, block-downsampled onto a fixed ``grid`` of equal-frequency
    sample ranges (chunk energy = Σ sample², exact int64), one bit per
    adjacent chunk pair via the cross-multiplied comparison
    ``s[k+1]·c[k] > s[k]·c[k+1]``.

    The invariance theorems (pytest-pinned, and what make it PERCEPTUAL):
    * GAIN: amplifying by any factor g (no clipping) scales every chunk
      energy by exactly g², which cancels in the cross-multiplied
      comparison — a remastered louder/quieter copy hashes identically;
    * POLARITY: energy of −s equals energy of s — a phase-inverted copy
      hashes identically;
    * the fixed grid is duration-normalized, so envelope shape — not
      clip length — is what's compared.

    Exactness bound: chunk energies ≤ 2³⁰·n/grid, so the cross-multiply
    stays inside int64 for clips up to ~5.6 M samples (~6 min at 16 kHz
    mono); longer clips should be windowed upstream (the frame-sampling
    stage).  Empty content hashes to 0 (all-zero chunks compare false),
    matching :func:`content_dhash`'s degenerate rule.

    Input: (media_id, content: binary — little-endian pcm16).  Output:
    (media_id, n_samples, dhash)."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_samples", LongType(), False),
            StructField("dhash", LongType(), False),
        ]
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_n, out_h = [], []
            for blob in pdf["content"]:
                n, h = audio_energy_dhash_blob(blob, grid)
                out_n.append(n)
                out_h.append(h)
            yield pd.DataFrame({"media_id": pdf["media_id"], "n_samples": out_n, "dhash": out_h})

    return media.mapInPandas(hashes, schema)


def synthetic_media(spark, n_images: int = 8, n_audio: int = 4, n_video: int = 2):
    """Deterministic fake media table (seeded bytes) for tests/demos."""
    rng = np.random.default_rng(42)
    rows = []
    mid = 0
    for _ in range(n_images):
        w, h, c = 16, 12, 3
        rows.append(
            (mid, "image", rng.integers(0, 256, w * h * c, dtype=np.uint8).tobytes(),
             (w, h, c, None, None, "raw", None))
        )
        mid += 1
    for _ in range(n_audio):
        n = 4000
        pcm = (np.sin(np.linspace(0, 440, n)) * 20000).astype("<i2")
        rows.append((mid, "audio", pcm.tobytes(), (None, None, None, 16000, 250, "pcm16", None)))
        mid += 1
    for _ in range(n_video):
        w, h, c, nf = 8, 6, 1, 10
        rows.append(
            (mid, "video", rng.integers(0, 256, w * h * c * nf, dtype=np.uint8).tobytes(),
             (w, h, c, None, None, "rawvideo", nf))
        )
        mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
