"""Multimodal columns: image/audio/video as opaque binary with typed
metadata, processed by Arrow-batched Pandas functions.

At 100 TB a training-data pipeline carries media alongside text. The
Spark-side design here is fully real — schemas, partitioning, mapInPandas
batch shape, deterministic outputs — and the codec step is a real,
environment-gated code path: image payloads decode through PIL whenever
it is importable (``_pil_image_features``: decode → grayscale 8×8 →
intensity features). All three kinds also have REAL stdlib-only
decoders that run in any environment: binary PPM for images
(``_ppm_image_features``), PCM WAV for audio (``_wav_audio_features``),
and uncompressed AVI for video (``_avi_video_features`` — RIFF chunk
walk, frame sampling, intensity + motion features). Only when no
decoder applies (exotic format and no codec library) or a payload is
undecodable does a row fall back to a clearly-marked deterministic
fake derived from the payload bytes — or raise ``NotImplementedError``
under ``strict=True``, the production setting. Adding a richer codec
changes ``featurize`` only, none of the distributed plumbing.

Layout rules that matter at scale:
- media rows are WIDE (payload bytes) — keep them in their own table,
  join features back by id; never groupBy/shuffle payload columns;
- decode runs in ``mapInPandas`` so each Arrow batch amortizes the
  Python crossing; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py)
  to keep executor-side Python memory flat;
- feature vectors come out as ``array<float>`` ready for
  operators/similarity.py (ANN top-k) — media dedup = embedding
  near-dup search.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 16


def _wav_header(data_bytes: int) -> bytes:
    """Canonical 44-byte PCM WAV header (mono, 16-bit, 8 kHz)."""
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_bytes)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", data_bytes)
    )


def _avi_container(frames: list[bytes], w: int, h: int) -> bytes:
    """Minimal VALID uncompressed AVI (RIFF): BI_RGB 24-bit bottom-up DIB
    frames in '00db' chunks inside LIST('movi'), with the standard
    avih/strh/strf headers. Every size field is correct — any RIFF-aware
    tool parses this file."""
    import struct

    rowsize = (w * 3 + 3) & ~3
    fsize = rowsize * h
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame must be {fsize} bytes ({rowsize}×{h}), got {len(f)}")

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    strf = chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0),
    )
    strh = chunk(
        b"strh",
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, len(frames), fsize, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h),
    )
    avih = chunk(
        b"avih",
        struct.pack(
            "<14I", 40000, fsize * 25, 0, 0, len(frames), 0, 1, fsize, w, h, 0, 0, 0, 0
        ),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def _avi_parts(w: int = 4, h: int = 4, n_frames: int = 2) -> tuple[list[bytes], int]:
    """Constant byte segments for JVM-side AVI synthesis: a valid AVI is
    ``parts[0] + frame₀ + parts[1] + frame₁ + … + parts[n]`` — so
    synth_media can concat literal header segments with id-derived frame
    rasters entirely in column space."""
    rowsize = (w * 3 + 3) & ~3
    fsize = rowsize * h
    sentinels = [bytes([0xA0 + i]) * fsize for i in range(n_frames)]
    full = _avi_container(sentinels, w, h)
    parts, pos = [], 0
    for s in sentinels:
        i = full.index(s, pos)
        parts.append(full[pos:i])
        pos = i + fsize
    parts.append(full[pos:])
    return parts, fsize


def synth_media(spark: SparkSession, n: int, kinds=("image", "audio", "video")) -> DataFrame:
    """Deterministic synthetic media table: image payloads are VALID
    binary PPM (P6) files (4×4 RGB, pixel bytes from the id's md5
    stream), audio payloads are VALID PCM WAV files (64 16-bit samples
    from the same stream), and video payloads are VALID uncompressed
    AVI containers (two 4×4 BI_RGB frames, rasters from the same
    stream) — so all THREE real stdlib decoders actually execute.
    Metadata typed per kind. JVM-side generation — no Python, any
    scale: the AVI header segments are constant literals and the frame
    rasters are md5 column expressions, concatenated in column space."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in kinds]), (F.col("id") % len(kinds) + 1).cast("int")
    )
    opaque = F.unhex(
        F.concat(*[F.md5(F.concat(F.lit(f"{i}:"), F.col("id").cast("string"))) for i in range(8)])
    )  # 8 × 16 bytes = 128-byte payload
    ppm = F.concat(
        F.encode(F.lit("P6\n4 4\n255\n"), "UTF-8"),
        F.unhex(
            F.concat(
                *[
                    F.md5(F.concat(F.lit(f"px{i}:"), F.col("id").cast("string")))
                    for i in range(3)
                ]
            )
        ),
    )  # header + 4·4·3 = 48 raster bytes
    wav = F.concat(F.lit(_wav_header(128)), opaque)  # 64 16-bit samples
    avi_parts, frame_bytes = _avi_parts(4, 4, 2)
    frames = [
        F.unhex(
            F.concat(
                *[
                    F.md5(F.concat(F.lit(f"f{fi}p{i}:"), F.col("id").cast("string")))
                    for i in range(frame_bytes // 16)
                ]
            )
        )
        for fi in range(2)
    ]
    avi = F.concat(
        F.lit(avi_parts[0]), frames[0], F.lit(avi_parts[1]), frames[1], F.lit(avi_parts[2])
    )
    payload = (
        F.when(kind == "image", ppm).when(kind == "audio", wav).when(kind == "video", avi).otherwise(opaque)
    )
    meta = F.map_from_arrays(
        F.array(F.lit("width"), F.lit("height"), F.lit("duration_ms")),
        F.array(
            ((F.col("id") % 64) * 16 + 64).cast("string"),
            ((F.col("id") % 48) * 16 + 64).cast("string"),
            ((F.col("id") % 1000) * 40).cast("string"),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: dim floats in [-1, 1)
    derived from the payload digest. Fallback path used when no codec
    library is importable (see decode_and_featurize)."""
    out: list[float] = []
    ctr = 0
    while len(out) < dim:
        h = hashlib.md5(payload + ctr.to_bytes(2, "big")).digest()
        out.extend(int.from_bytes(h[i : i + 2], "big") / 32768.0 - 1.0 for i in range(0, 16, 2))
        ctr += 1
    return out[:dim]


def _ppm_image_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float] | None:
    """REAL stdlib-only image decode for binary PPM (P6): parse the
    header (magic, comments, width/height/maxval), read the raw RGB
    raster, grayscale each pixel, sample onto an 8×8 grid, scale to
    [-1, 1), cycle/truncate to ``dim`` — the same feature contract as the
    PIL path, with zero third-party dependencies, so the driver's
    container exercises a real decoder instead of the fallback. Returns
    None for anything that is not a well-formed P6 payload."""
    if not payload.startswith(b"P6"):
        return None
    try:
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte separates maxval from data
        w, h, maxval = fields
        if not (0 < w and 0 < h and 0 < maxval < 256):
            return None
        need = w * h * 3
        data = payload[pos : pos + need]
        if len(data) < need:
            return None
        feats: list[float] = []
        half = (maxval + 1) / 2.0
        for gy in range(8):
            for gx in range(8):
                px = (min(h - 1, gy * h // 8) * w + min(w - 1, gx * w // 8)) * 3
                gray = (data[px] + data[px + 1] + data[px + 2]) / 3.0
                feats.append(gray / half - 1.0)
        return [feats[i % len(feats)] for i in range(dim)]
    except (ValueError, IndexError):
        return None


def _wav_audio_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float] | None:
    """REAL stdlib-only audio decode for PCM WAV: parse via the standard
    ``wave`` module, decode 16-bit samples, and emit 8 per-segment RMS
    energies + 8 per-segment zero-crossing rates scaled to [-1, 1),
    cycled/truncated to ``dim``. Returns None for anything that is not a
    decodable PCM WAV payload."""
    if not payload.startswith(b"RIFF"):
        return None
    try:
        import io
        import struct
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2 or w.getnchannels() < 1:
                return None
            raw = w.readframes(w.getnframes())
        n = len(raw) // 2
        if n == 0:
            return None
        samples = struct.unpack(f"<{n}h", raw[: n * 2])
        seg = max(n // 8, 1)
        feats: list[float] = []
        for s in range(8):
            chunk = samples[s * seg : (s + 1) * seg] or (0,)
            rms = (sum(x * x for x in chunk) / len(chunk)) ** 0.5
            feats.append(min(rms / 16384.0, 1.999) - 1.0)
        for s in range(8):
            chunk = samples[s * seg : (s + 1) * seg] or (0, 0)
            zc = sum(
                1 for a, b in zip(chunk, chunk[1:]) if (a < 0) != (b < 0)
            )
            feats.append(2.0 * zc / max(len(chunk) - 1, 1) - 1.0)
        return [feats[i % len(feats)] for i in range(dim)]
    except Exception:
        return None


def _avi_parse(payload: bytes) -> tuple[int, int, list[bytes]] | None:
    """REAL stdlib-only video container parse for uncompressed AVI: walk
    the RIFF chunk tree, read width/height/bit-depth/compression from the
    'strf' BITMAPINFOHEADER, and collect the '00db'/'00dc' frame chunks
    from LIST('movi'). Returns (width, height, frames) for BI_RGB 24-bit
    payloads; None for anything else (caller decides fallback vs
    strict-raise)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    try:

        def chunks(pos: int, end: int):
            while pos + 8 <= end:
                cid = payload[pos : pos + 4]
                size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                if pos + 8 + size > len(payload):
                    return
                yield cid, pos + 8, size
                pos += 8 + size + (size & 1)

        w = h = bits = comp = None
        frames: list[bytes] = []
        for cid, dpos, size in chunks(12, len(payload)):
            if cid != b"LIST":
                continue
            ltype = payload[dpos : dpos + 4]
            if ltype == b"hdrl":
                for cid2, dpos2, size2 in chunks(dpos + 4, dpos + size):
                    if cid2 == b"LIST" and payload[dpos2 : dpos2 + 4] == b"strl":
                        for cid3, dpos3, size3 in chunks(dpos2 + 4, dpos2 + size2):
                            if cid3 == b"strf" and size3 >= 20:
                                _, bw, bh, _, bits, comp = struct.unpack_from(
                                    "<IiiHHI", payload, dpos3
                                )
                                w, h = bw, abs(bh)
            elif ltype == b"movi":
                for cid2, dpos2, size2 in chunks(dpos + 4, dpos + size):
                    if cid2[2:4] in (b"db", b"dc"):
                        frames.append(payload[dpos2 : dpos2 + size2])
        if not frames or not w or not h or bits != 24 or comp != 0:
            return None
        rowsize = (w * 3 + 3) & ~3
        if any(len(f) < rowsize * h for f in frames):
            return None
        return w, h, frames
    except (ValueError, IndexError, struct.error):
        return None


def _avi_video_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float] | None:
    """REAL stdlib-only video decode for uncompressed AVI: parse the
    container (``_avi_parse``), sample up to 8 frames evenly across the
    stream, and emit 8 per-frame mean intensities + 8 inter-frame motion
    magnitudes (mean |Δgray| between consecutive sampled frames), scaled
    to [-1, 1) and cycled/truncated to ``dim`` — temporal structure, not
    just a thumbnail. Returns None for undecodable payloads."""
    parsed = _avi_parse(payload)
    if parsed is None:
        return None
    w, h, frames = parsed
    rowsize = (w * 3 + 3) & ~3
    n = min(len(frames), 8)
    picks = [frames[i * len(frames) // n] for i in range(n)]

    def mean_gray(f: bytes) -> float:
        tot = 0.0
        for y in range(h):
            base = y * rowsize
            row = f[base : base + w * 3]
            tot += sum(row) / (3.0 * w)
        return tot / h

    grays = [mean_gray(f) for f in picks]
    feats = [g / 128.0 - 1.0 for g in grays]
    while len(feats) < 8:
        feats.append(feats[-1])
    motion = [abs(b - a) / 128.0 - 1.0 for a, b in zip(grays, grays[1:])] or [-1.0]
    while len(motion) < 8:
        motion.append(motion[-1])
    feats += motion[:8]
    return [feats[i % len(feats)] for i in range(dim)]


def _pil_image_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float] | None:
    """REAL image decode path: PIL decode → grayscale → 8×8 thumbnail →
    pixel intensities scaled to [-1, 1), cycled/truncated to ``dim``.
    Returns None when PIL is not importable OR the payload is not a
    decodable image (caller decides fallback vs strict-raise). Runs per
    row inside an Arrow batch — the import resolves once per worker."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        px = list(img.getdata())
        feats = [v / 128.0 - 1.0 for v in px]
        return [feats[i % len(feats)] for i in range(dim)]
    except Exception:
        return None


def decode_and_featurize(
    media: DataFrame, dim: int = FEATURE_DIM, strict: bool = False
) -> DataFrame:
    """media → (media_id, kind, n_bytes, features array<float>).

    Decode is a real code path for every kind: PPM (stdlib) then PIL
    for images, PCM WAV (stdlib ``wave``) for audio, uncompressed AVI
    (stdlib RIFF walk) for video. Only when no decoder matches the
    payload does the row fall back to deterministic digest-derived fake
    features so the distributed path (Arrow batches → features → ANN)
    stays testable end-to-end.
    ``strict=True`` raises NotImplementedError instead of falling back —
    the production setting, guaranteeing no fake feature ever ships."""
    schema = "media_id long, kind string, n_bytes long, features array<float>"

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        def featurize(kind: str, b: bytes) -> list[float]:
            real = None
            if kind == "image":
                # PPM first (stdlib, always available — the in-sandbox
                # real path), PIL for every other raster format
                real = _ppm_image_features(b, dim) or _pil_image_features(b, dim)
            elif kind == "audio":
                # PCM WAV via the stdlib wave module — real everywhere
                real = _wav_audio_features(b, dim)
            elif kind == "video":
                # uncompressed AVI via the stdlib RIFF walk — real everywhere
                real = _avi_video_features(b, dim)
            if real is not None:
                return real
            if strict:
                raise NotImplementedError(
                    f"no decoder available for kind={kind!r} in this "
                    "environment (PIL/soundfile/av not importable or payload "
                    "undecodable); strict mode refuses the fake-feature "
                    "fallback"
                )
            return _fake_features(b, dim)

        for pdf in it:
            rows = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len),
                "features": [
                    featurize(k, bytes(b)) for k, b in zip(pdf["kind"], pdf["payload"])
                ],
            }
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(batches, schema=schema)


def frame_sample(media: DataFrame, every: int = 32, max_frames: int = 8) -> DataFrame:
    """Video frame sampling with REAL container awareness: AVI payloads
    are parsed (``_avi_parse``) and up to ``max_frames`` actual frames
    are sampled evenly across the stream — ``frame_idx`` is the frame's
    true index in the container, ``frame_bytes`` the raw DIB raster.
    Opaque/unparseable payloads fall back to fixed ``every``-byte stride
    slicing so the row-shape contract holds for any binary. Runs in
    ``mapInPandas`` — the only rows crossing to Python are video rows,
    and each Arrow batch amortizes the crossing."""
    schema = "media_id long, frame_idx int, frame_bytes binary"

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            blobs: list[bytes] = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(raw)
                parsed = _avi_parse(b)
                if parsed is not None:
                    _, _, frames = parsed
                    n = min(len(frames), max_frames)
                    for i in range(n):
                        j = i * len(frames) // n
                        ids.append(mid)
                        idxs.append(j)
                        blobs.append(frames[j])
                else:
                    n = min(max(len(b) // every, 1), max_frames)
                    for i in range(n):
                        ids.append(mid)
                        idxs.append(i)
                        blobs.append(b[i * every : (i + 1) * every])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs})

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=schema)
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize planning: compute target dims from metadata JVM-side
    (the byte-level resample lives in the decode UDF). Demonstrates typed
    metadata access over the map column."""
    # try_cast: malformed user metadata must yield null dims, and the
    # guard below also drops non-positive dims — width='0' under ANSI
    # would otherwise abort the job with DIVIDE_BY_ZERO in the scale
    w = F.col("meta")["width"].try_cast("int")
    h = F.col("meta")["height"].try_cast("int")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return (
        media.filter(F.col("kind") == "image")
        .filter(w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0))
        .select(
            "media_id",
            w.alias("width"),
            h.alias("height"),
            F.round(w * scale).cast("int").alias("target_width"),
            F.round(h * scale).cast("int").alias("target_height"),
        )
    )
