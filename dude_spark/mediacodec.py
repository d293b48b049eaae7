"""Deterministic audio/video containers (pure numpy/zlib) — the
audio/video siblings of ``imagecodec``.

No media libraries (soundfile/ffmpeg/pyav) exist in this container, so
these are deterministic stand-ins with *real* container semantics —
magic + binary header + compressed payload, length-prefixed frame
packets for video — exactly the pattern the image codec established:
the byte-level container handling, error taxonomy, and all DSP math on
the decoded samples are real; only the entropy-coding internals are
simplified.  When soundfile / pyav ARE importable (production
clusters), the decoders transparently handle real WAV/FLAC/OGG and
real video containers too: the deterministic magic is tried first
(test path), anything else falls through to the library behind the
same signature and CodecError taxonomy — every caller in
``operators.multimodal`` is agnostic either way.

Containers:
  audio  b"DWAV" | sample_rate int32 | n_samples int32 |
         zlib(int16 PCM mono, little-endian)
  video  b"DVID" | fps int32 | n_frames int32 |
         n_frames × (len int32 | imagecodec-encoded frame)

Reference analogue: the engine treats all payloads as opaque byte
streams (internal/processing/hashing.go:316); typed decode lives only
in this repo's LLM-pipeline extension surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .imagecodec import CodecError, decode as decode_image, encode as encode_image

AUDIO_MAGIC = b"DWAV"
VIDEO_MAGIC = b"DVID"
# absolute clip-size ceiling: 1h of 192 kHz mono int16 ≈ 1.4 GB decoded
# — anything above is rejected before decompression regardless of ratio
MAX_AUDIO_SAMPLES = 192_000 * 3600

try:  # pragma: no cover - not present in this container
    import soundfile as _soundfile

    HAVE_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAVE_SOUNDFILE = False

try:  # pragma: no cover - not present in this container
    import av as _av

    HAVE_AV = True
except ImportError:
    _av = None
    HAVE_AV = False


# ------------------------------------------------------------------ audio

def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → container bytes (lossless, deterministic)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise CodecError(
            f"expected 1-d int16 PCM, got {samples.dtype} ndim={samples.ndim}"
        )
    if sample_rate <= 0:
        raise CodecError(f"bad sample_rate {sample_rate}")
    payload = zlib.compress(samples.astype("<i2").tobytes())
    return AUDIO_MAGIC + struct.pack("<ii", sample_rate, len(samples)) + payload


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Container bytes → (int16 samples, sample_rate).  Raises
    CodecError on any malformed payload — callers skip-and-count."""
    if blob is None or len(blob) < 12:
        raise CodecError("audio payload too short")
    if blob[:4] != AUDIO_MAGIC:
        if HAVE_SOUNDFILE:
            return _decode_audio_soundfile(blob)
        raise CodecError("not a DWAV audio payload")
    rate, n = struct.unpack("<ii", blob[4:12])
    if rate <= 0 or n < 0:
        raise CodecError(f"corrupt DWAV header rate={rate} n={n}")
    # the declared length itself is attacker-controlled: without this
    # cap a ~50-byte blob claiming n=2^31-1 over a high-ratio zlib
    # stream makes the worker decompress ~4 GB before the length check.
    # zlib tops out near 1032:1, so a genuine stream of 2n bytes needs
    # at least ~2n/1032 input bytes; anything claiming more is a bomb.
    if n > MAX_AUDIO_SAMPLES or 2 * n > len(blob) * 1100:
        raise CodecError(f"DWAV declared length {n} implausible for blob size")
    try:
        # bounded decompression: the (now-capped) header declares the
        # size, so output is cut off at 2n+1 bytes instead of
        # ballooning worker memory — the skip-and-count contract must
        # hold for adversarial payloads
        d = zlib.decompressobj()
        raw = d.decompress(blob[12:], 2 * n + 1)
    except zlib.error as e:
        raise CodecError(f"corrupt DWAV payload: {e}") from e
    # d.eof: the stream must COMPLETE (trailer/checksum seen) — a
    # truncated stream can yield all payload bytes without error
    if len(raw) != 2 * n or d.unconsumed_tail or not d.eof:
        raise CodecError(f"DWAV length mismatch: header {n}, payload {len(raw)//2}")
    return np.frombuffer(raw, dtype="<i2").astype(np.int16), rate


def _decode_audio_soundfile(blob: bytes) -> tuple[np.ndarray, int]:  # pragma: no cover
    """Real-audio fallback when soundfile is importable: WAV/FLAC/OGG
    bytes → (int16 mono samples, rate), same CodecError taxonomy."""
    import io

    try:
        # metadata probe FIRST: rejecting by the header keeps a
        # multi-hour (or crafted) clip from being fully decoded into
        # memory before the cap fires — the DWAV path rejects before
        # decompression for the same reason
        info = _soundfile.info(io.BytesIO(blob))
        if info.frames > MAX_AUDIO_SAMPLES:
            raise CodecError(f"audio clip too long: {info.frames} samples")
        data, rate = _soundfile.read(io.BytesIO(blob), dtype="int16", always_2d=True)
    except CodecError:
        raise
    except Exception as e:
        raise CodecError(f"undecodable audio payload: {e}") from e
    if data.shape[0] > MAX_AUDIO_SAMPLES:  # header lied — enforce anyway
        raise CodecError(f"audio clip too long: {data.shape[0]} samples")
    # downmix to mono to match the container contract
    mono = data.mean(axis=1).astype(np.int16) if data.shape[1] > 1 else data[:, 0]
    return mono, int(rate)


def audio_features(samples: np.ndarray, rate: int) -> tuple[float, float, int]:
    """(duration_s, rms in [0,1], zero_crossings) — vectorized DSP on
    the decoded PCM (this math is production-real, codec-independent)."""
    n = len(samples)
    duration = n / rate
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0
    return duration, rms, zc


# ------------------------------------------------------------------ video

def encode_video(frames: list[np.ndarray], fps: int, frame_fmt: str = "jpeg") -> bytes:
    """List of (h, w, 3) uint8 frames → container bytes; each frame is
    an imagecodec packet, so per-frame PSNR semantics carry over."""
    if fps <= 0:
        raise CodecError(f"bad fps {fps}")
    parts = [VIDEO_MAGIC, struct.pack("<ii", fps, len(frames))]
    for f in frames:
        pkt = encode_image(f, frame_fmt)
        parts.append(struct.pack("<i", len(pkt)))
        parts.append(pkt)
    return b"".join(parts)


def _decode_video_av(blob: bytes):  # pragma: no cover
    """Real-video fallback when pyav is importable: container bytes →
    (lazy (ts_ms, (h, w, 3) uint8) iterator, fps), same CodecError
    taxonomy.  Timestamps fall back to frame_index/fps when the stream
    carries no pts/time_base — 'or 0' arithmetic would collapse every
    ts to 0 and the sampler would keep only the first frame of a valid
    video."""
    import io

    try:
        # probe pass: open/close just for fps — the decode pass reopens
        # inside the generator's own with-block, so a caller that never
        # iterates (or errors before iterating) leaks no AV container
        with _av.open(io.BytesIO(blob)) as probe:
            rate = probe.streams.video[0].average_rate
            fps = max(1, int(round(float(rate)))) if rate else 1
    except Exception as e:
        raise CodecError(f"undecodable video payload: {e}") from e

    def frames():
        try:
            with _av.open(io.BytesIO(blob)) as container:
                stream = container.streams.video[0]
                tb = float(stream.time_base) if stream.time_base else None
                for i, frame in enumerate(container.decode(stream)):
                    if tb is not None and frame.pts is not None:
                        ts = int(frame.pts * tb * 1000)
                    else:
                        ts = i * 1000 // fps
                    yield ts, frame.to_ndarray(format="rgb24")
        except CodecError:
            raise
        except Exception as e:
            raise CodecError(f"undecodable video payload: {e}") from e

    return frames(), fps


def decode_video(blob: bytes):
    """Container bytes → (LAZY (ts_ms, pixels) iterator, fps).

    Frames decode one at a time: a 1-hour clip is ~10^5 frames whose
    pixel arrays must never be held simultaneously (the sampler keeps
    ~1 per second and discards the rest).  Header validation is EAGER
    — malformed magic/header raises here, at call time; per-frame
    corruption raises CodecError from the iterator, mid-iteration."""
    if blob is None or len(blob) < 12:
        raise CodecError("video payload too short")
    if blob[:4] != VIDEO_MAGIC:
        if HAVE_AV:
            return _decode_video_av(blob)
        raise CodecError("not a DVID video payload")
    fps, n_frames = struct.unpack("<ii", blob[4:12])
    if fps <= 0 or n_frames < 0:
        raise CodecError(f"corrupt DVID header fps={fps} n={n_frames}")

    def frames():
        off = 12
        for i in range(n_frames):
            if off + 4 > len(blob):
                raise CodecError(f"DVID truncated at frame {i}")
            (plen,) = struct.unpack("<i", blob[off : off + 4])
            off += 4
            if plen < 0 or off + plen > len(blob):
                raise CodecError(f"DVID bad frame length {plen} at frame {i}")
            pixels, _ = decode_image(blob[off : off + plen])
            off += plen
            yield i * 1000 // fps, pixels

    return frames(), fps
