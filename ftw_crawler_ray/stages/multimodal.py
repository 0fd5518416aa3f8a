"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed by actor-pool map_batches stages.

The Ray-side plumbing (schemas, actor signatures, batch sizing,
output layout) is real and tested; the codec layer is STUBBED —
this container ships no PIL/libav, so ``RealImageCodec`` raises
NotImplementedError and the default is a deterministic fake codec
over a self-describing FakeImage/FakeVideo byte format. Swapping in
a real codec is a one-class change (same interface), nothing about
the pipelines moves.

Memory note (SURVEY.md "wide binary rows"): payload stages run with
small ``batch_size`` and an explicit actor pool so
batch × concurrency stays inside a worker's heap; payloads are
projected away as soon as features are extracted.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

from .util import sized_read_parquet

_IMG_MAGIC = b"FIMG"
_VID_MAGIC = b"FVID"


# ---------------------------------------------------------------------------
# deterministic fake payload synthesis (the sandbox "media corpus")
# ---------------------------------------------------------------------------


def media_dims(seed: int) -> tuple[int, int]:
    """Closed-form deterministic dimensions for synthetic media —
    SQL-recomputable (the image_features oracle re-derives them from
    doc_id), range [16, 64) so resize tests stay meaningful."""
    w = 16 + (seed * 2654435761) % 4294967296 % 48
    h = 16 + (seed * 40503) % 65536 % 48
    return int(w), int(h)


def fake_image_bytes(seed: int) -> bytes:
    """Self-describing fake image: FIMG | w | h | pixel bytes.
    Dimensions are the closed-form :func:`media_dims` (oracle-
    checkable); pixel contents stay rng-derived."""
    w, h = media_dims(seed)
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
    return _IMG_MAGIC + struct.pack("<HH", w, h) + pixels


def synth_png_bytes(w: int, h: int) -> bytes:
    """Minimal real PNG container: signature + IHDR (with CRC) + IEND.
    Public spec (RFC 2083); header-parseable by any PNG reader."""
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    out = _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr
    out += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return out + struct.pack(">I", 0) + b"IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND")
    )


def synth_jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal real JPEG container: SOI, APP0/JFIF, a comment segment,
    a spec-legal 0xFF fill byte before SOF0 (exercises the fill-byte
    handling in :func:`parse_image_header`), SOF0 with the true
    dimensions, SOS, EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"fix!"
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    return b"\xff\xd8" + app0 + com + b"\xff" + sof0 + sos + b"scan\xff\xd9"


def synth_gif_bytes(w: int, h: int) -> bytes:
    """Minimal real GIF89a container: header + logical screen
    descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def fake_video_bytes(seed: int, n_frames: int = 8) -> bytes:
    """FVID | n_frames | frame_len | frames (fixed-size fake frames)."""
    rng = np.random.default_rng(seed)
    frame_len = 256
    frames = rng.integers(0, 256, size=n_frames * frame_len, dtype=np.uint8)
    return _VID_MAGIC + struct.pack("<HH", n_frames, frame_len) + frames.tobytes()


def synth_image_bytes(seed: int) -> bytes:
    """One deterministic image payload per id: ids 0/1/2 (mod 5) get
    REAL PNG/JPEG/GIF containers (true dims in real headers — the
    fixture rows the image_features oracle value-checks), the rest the
    FIMG fake format (full pixel stats). All dims are
    :func:`media_dims` closed forms."""
    kind = seed % 5
    if kind > 2:
        return fake_image_bytes(seed)
    w, h = media_dims(seed)
    if kind == 0:
        return synth_png_bytes(w, h)
    if kind == 1:
        return synth_jpeg_bytes(w, h)
    return synth_gif_bytes(w, h)


def media_table(sf_dir: str, modality: str = "image") -> ray.data.Dataset:
    """documents → media rows: (media_id, payload: binary, modality,
    metadata columns). Deterministic from doc_id; image payloads mix
    real PNG/JPEG/GIF containers with FIMG fakes (see
    :func:`synth_image_bytes`)."""
    docs = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        if modality == "image":
            payloads = [synth_image_bytes(i) for i in ids]
        else:
            payloads = [fake_video_bytes(i) for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "modality": pa.array([modality] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(synth, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# codecs — the pluggable (stubbed) layer
# ---------------------------------------------------------------------------


class FakeImageCodec:
    """Decodes the FIMG fake format. Interface = the real thing."""

    def decode(self, payload: bytes):
        if payload[:4] != _IMG_MAGIC:
            raise ValueError("not a FIMG payload")
        w, h = struct.unpack("<HH", payload[4:8])
        pixels = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
        return w, h, pixels

    def resize(self, payload: bytes, max_side: int):
        w, h, pixels = self.decode(payload)
        scale = max(1, max(w, h) // max_side)
        new_w, new_h = max(1, w // scale), max(1, h // scale)
        resized = pixels[: new_w * new_h]  # deterministic fake downsample
        return _IMG_MAGIC + struct.pack("<HH", new_w, new_h) + resized.tobytes()


class RealImageCodec:  # pragma: no cover - stub by design
    """Placeholder for a PIL/turbojpeg-backed codec — this container
    has no image libraries (SURVEY-level stub; same interface)."""

    def decode(self, payload: bytes):
        raise NotImplementedError("image libraries not available in sandbox")

    def resize(self, payload: bytes, max_side: int):
        raise NotImplementedError("image libraries not available in sandbox")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOFn minus DHT/JPG/DAC


def parse_image_header(payload: bytes):
    """Container-format sniff + dimension parse, pure Python — no
    image library needed (the container formats are public specs):

    - PNG: 8-byte signature, then the IHDR chunk carries width/height
      as big-endian uint32 at bytes 16..24.
    - JPEG: walk the marker segments from SOI to the first SOFn
      (baseline/progressive frame header): precision(1) height(2)
      width(2) big-endian after the segment length.
    - GIF: 'GIF87a'/'GIF89a' then logical-screen width/height as
      little-endian uint16.

    Returns (format, width, height) or None if the payload is none
    of the three."""
    if payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 1 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            j = i + 1
            while j < n and payload[j] == 0xFF:
                j += 1  # 0xFF fill bytes before a marker are spec-legal
            if j >= n:
                break
            marker = payload[j]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i = j + 1  # standalone markers carry no length
                continue
            if marker in (0xD9, 0xDA):
                break  # EOI / start-of-scan: no SOFn seen → no dims
            if j + 3 > n:
                break  # truncated length field
            seg_len = struct.unpack(">H", payload[j + 1 : j + 3])[0]
            if marker in _JPEG_SOF_MARKERS:
                if j + 8 > n:
                    break  # truncated frame header
                h, w = struct.unpack(">HH", payload[j + 4 : j + 8])
                return ("jpeg", w, h)
            i = j + 1 + seg_len  # length counts from the length field
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    return None


class HeaderImageCodec:
    """Real-container codec for the feature stage: true dimensions
    from PNG/JPEG/GIF headers (pure Python, public specs). Pixels are
    NOT decoded — that needs an image library — so the pixel slot is
    ``None`` (header-only rows get null pixel stats downstream; never
    container-byte stats masquerading as pixels). ``resize`` stays
    NotImplementedError like :class:`RealImageCodec`."""

    def decode(self, payload: bytes):
        parsed = parse_image_header(payload)
        if parsed is None:
            raise ValueError("not a PNG/JPEG/GIF payload")
        fmt, w, h = parsed
        return fmt, w, h, None

    def resize(self, payload: bytes, max_side: int):  # pragma: no cover
        raise NotImplementedError(
            "pixel resampling needs an image library; header codec "
            "reads dimensions only"
        )


class AutoImageCodec:
    """Dispatching codec: FIMG payloads decode through the fake codec
    (full pixel stats), real PNG/JPEG/GIF containers through the
    header codec (true dimensions, null pixel stats).

    Contract for :class:`ImageFeatures` codecs:
    ``decode(payload) -> (format, width, height, pixels | None)``."""

    def __init__(self):
        self.fake = FakeImageCodec()
        self.header = HeaderImageCodec()

    def decode(self, payload: bytes):
        if payload[:4] == _IMG_MAGIC:
            w, h, pixels = self.fake.decode(payload)
            return "fimg", w, h, pixels
        return self.header.decode(payload)

    def resize(self, payload: bytes, max_side: int):
        if payload[:4] == _IMG_MAGIC:
            return self.fake.resize(payload, max_side)
        return self.header.resize(payload, max_side)


class ImageFeatures:
    """Actor-pool stage: decode → (format, width, height, n_pixels,
    16-bin byte histogram, content digest); payload projected away.
    Codec built once per actor (__init__), work per batch.

    Header-only decodes (real containers, no image library) emit NULL
    n_pixels/histogram — the pixel-stat columns mean pixels or
    nothing. A row whose payload fails to decode yields null
    format/dims instead of failing the whole batch (one odd payload
    in a 100 TB corpus must not kill a 256-row task)."""

    def __init__(self, codec=None):
        self.codec = codec if codec is not None else AutoImageCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts, widths, heights, n_pixels, hists, digests = [], [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            digests.append(hashlib.blake2b(payload, digest_size=8).hexdigest())
            try:
                fmt, w, h, pixels = self.codec.decode(payload)
            except (ValueError, struct.error, IndexError):
                fmts.append(None)
                widths.append(None)
                heights.append(None)
                n_pixels.append(None)
                hists.append(None)
                continue
            fmts.append(fmt)
            widths.append(w)
            heights.append(h)
            if pixels is None:
                n_pixels.append(None)
                hists.append(None)
            else:
                n_pixels.append(len(pixels))
                hist, _ = np.histogram(pixels, bins=16, range=(0, 256))
                hists.append(hist.astype(np.int64).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_pixels": pa.array(n_pixels, pa.int64()),
                "histogram": pa.array(hists, pa.list_(pa.int64())),
                "digest": pa.array(digests, pa.string()),
            }
        )


class ImageResizer:
    """Actor-pool stage: payload → resized payload (binary out)."""

    def __init__(self, max_side: int = 16, codec=None):
        self.max_side = max_side
        self.codec = codec if codec is not None else FakeImageCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [
            self.codec.resize(p, self.max_side)
            for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, pa.binary()),
            }
        )


class FrameSampler:
    """Actor-pool stage for FVID payloads: every k-th frame →
    exploded (media_id, frame_idx, frame: binary) rows."""

    def __init__(self, every: int = 2):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idxs, frames = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if payload[:4] != _VID_MAGIC:
                continue
            n_frames, frame_len = struct.unpack("<HH", payload[4:8])
            body = payload[8:]
            for i in range(0, n_frames, self.every):
                media_ids.append(mid)
                frame_idxs.append(i)
                frames.append(body[i * frame_len : (i + 1) * frame_len])
        return pa.table(
            {
                "media_id": pa.array(media_ids, pa.int64()),
                "frame_idx": pa.array(frame_idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def image_features(sf_dir: str, concurrency=(1, 4),
                   batch_size: int = 256) -> ray.data.Dataset:
    """media → ImageFeatures actor pool (small batches: binary rows)."""
    return media_table(sf_dir, "image").map_batches(
        ImageFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def sampled_frames(sf_dir: str, every: int = 2, concurrency=(1, 4),
                   batch_size: int = 128) -> ray.data.Dataset:
    return media_table(sf_dir, "video").map_batches(
        FrameSampler, fn_constructor_kwargs={"every": every},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
