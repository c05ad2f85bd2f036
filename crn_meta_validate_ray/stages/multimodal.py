"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Ray-side plumbing — schema contract, actor-pool stage shape, small
batch sizes for large payloads, fixed-size feature output — is real and
tested, and so is the decode: ``DecodeImageStage`` decodes images with
PIL when importable and otherwise falls back to a built-in pure-numpy
netpbm (binary PGM ``P5`` / PPM ``P6``) decoder — full header parse
(comments, arbitrary whitespace), raster length check, Rec.601
grayscale, resize — and decodes audio with a built-in pure-numpy WAV
(RIFF) parser — chunk walk, PCM8/PCM16/float32, multi-channel downmix —
emitting a fixed-size mean-|amplitude| envelope.  Both work in
codec-free containers.  Only *other* formats (JPEG/PNG without PIL,
compressed audio, video frames) degrade to the deterministic byte-slice
stub features.

Stage shape rules for binary payloads:
- keep ``batch_size`` small (payload bytes × batch_size × concurrency must
  fit the worker heap);
- the stage is a callable CLASS (actor pool) so any model/codec loads once
  per actor in ``__init__``;
- outputs are fixed-size ``list<float>`` feature vectors + scalar metadata,
  never the raw payload, so downstream shuffles stay narrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int = 64, seed: int = 13) -> pa.Table:
    """Deterministic fake media rows.  Image rows carry a VALID binary-PPM
    (``P6``) payload — header + seeded RGB raster — so the real netpbm
    decode path is exercised end-to-end without any codec library; audio /
    video rows carry opaque seeded bytes."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    width = np.where(kinds == "audio", 0, rng.integers(16, 64, n)).astype(np.int32)
    height = np.where(kinds == "audio", 0, rng.integers(16, 64, n)).astype(np.int32)
    dur = np.where(kinds == "image", 0, rng.integers(100, 5000, n)).astype(np.int32)
    payloads = []
    for k, w, h, d in zip(kinds, width, height, dur):
        if k == "image":
            raster = rng.integers(0, 256, int(w) * int(h) * 3,
                                  dtype=np.uint8).tobytes()
            payloads.append(f"P6\n{int(w)} {int(h)}\n255\n".encode() + raster)
        elif k == "audio":
            # VALID PCM16 WAV: seeded tone + noise, so the real RIFF
            # decode path is exercised end-to-end
            rate = 8000
            n_s = max(int(d) * rate // 1000, 256)
            t = np.arange(n_s, dtype=np.float64) / rate
            f = 220.0 + float(rng.integers(0, 660))
            x = (0.5 * np.sin(2 * np.pi * f * t)
                 + 0.05 * rng.standard_normal(n_s))
            payloads.append(wav_bytes(x, rate))
        else:
            payloads.append(rng.integers(0, 256, max(int(w) * int(h), 128),
                                         dtype=np.uint8).tobytes())
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.astype(object), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(width),
        "height": pa.array(height),
        "duration_ms": pa.array(dur),
    })


def wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode a mono float array in [-1, 1] as a PCM16 WAV payload."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    n = len(pcm)

    def le(v: int, w: int) -> bytes:
        return int(v).to_bytes(w, "little")

    return (b"RIFF" + le(36 + n, 4) + b"WAVE"
            + b"fmt " + le(16, 4) + le(1, 2) + le(1, 2) + le(rate, 4)
            + le(rate * 2, 4) + le(2, 2) + le(16, 2)
            + b"data" + le(n, 4) + pcm)


def parse_wav(p: bytes):
    """Decode a RIFF/WAVE payload with numpy: chunk walk (word-aligned),
    PCM 8/16-bit and IEEE-float32 sample formats, multi-channel downmix to
    mono.  Returns ``(samples_float32_mono, sample_rate)`` or None if the
    payload is not a decodable WAV."""
    if len(p) < 44 or p[0:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = int.from_bytes(p[i + 4:i + 8], "little")
        body = p[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if n_ch < 1 or rate <= 0:
        return None
    if audio_fmt == 1 and bits == 16:
        data = data[: len(data) - len(data) % 2]  # tolerate truncation
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8)
             .astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 3 and bits == 32:
        data = data[: len(data) - len(data) % 4]
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        return None  # compressed / exotic formats → stub fallback
    if n_ch > 1:
        n = (len(x) // n_ch) * n_ch
        x = x[:n].reshape(-1, n_ch).mean(axis=1).astype(np.float32)
    return x, rate


def parse_netpbm(p: bytes) -> np.ndarray | None:
    """Decode a binary PGM (``P5``) / PPM (``P6``) payload with numpy:
    header parse (``#`` comments, arbitrary whitespace between fields),
    raster-length check, Rec.601 grayscale for color.  Returns an (h, w)
    float32 array in [0, 1], or None if the payload is not a decodable
    8-bit netpbm image."""
    if len(p) < 2 or p[0:1] != b"P" or p[1:2] not in (b"5", b"6"):
        return None
    channels = 1 if p[1:2] == b"5" else 3
    i, fields = 2, []
    while len(fields) < 3 and i < len(p):
        c = p[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            j = p.find(b"\n", i)
            if j < 0:
                return None
            i = j + 1
        elif ord("0") <= c <= ord("9"):
            j = i
            while j < len(p) and ord("0") <= p[j] <= ord("9"):
                j += 1
            fields.append(int(p[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3:
        return None
    w, h, maxval = fields
    if not (0 < w and 0 < h and 0 < maxval <= 255):
        return None
    i += 1  # exactly one whitespace byte separates maxval from the raster
    need = w * h * channels
    if len(p) - i < need:
        return None
    raster = np.frombuffer(p, dtype=np.uint8, count=need, offset=i) \
        .astype(np.float32) / maxval
    if channels == 1:
        return raster.reshape(h, w)
    rgb = raster.reshape(h, w, 3)
    return (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]).astype(np.float32)


class DecodeImageStage:
    """Actor-pool stage: payload → fixed-size feature vector.

    Real path (``fake=False``): decode each image payload, convert to
    grayscale, resize to a ``⌈√dim⌉``-square thumbnail and emit the
    normalized pixels truncated/padded to ``dim`` floats; decode each
    audio payload with the built-in WAV parser (:func:`parse_wav`) and
    emit a ``dim``-bucket mean-|amplitude| envelope.  The image decoder
    is probed once per actor in ``__init__``: PIL when importable (any
    format PIL reads), else the built-in pure-numpy netpbm decoder
    (:func:`parse_netpbm` — always available).  Video kinds and
    undecodable payloads fall back to the deterministic byte-slice stub
    features; ``fake=True`` forces the stub for everything (feature =
    first ``dim`` payload bytes / 255)."""

    def __init__(self, dim: int = 32, fake: bool = False):
        self.dim = dim
        self.decoder = None
        self._pil = None
        if not fake:
            try:
                import PIL.Image
                self._pil = PIL.Image
                self.decoder = "pil"
            except ImportError:
                self.decoder = "netpbm"
        side = 1
        while side * side < dim:
            side += 1
        self._side = side

    def _stub_features(self, p: bytes, out: np.ndarray):
        raw = np.frombuffer(p[: self.dim], dtype=np.uint8)
        out[: len(raw)] = raw / 255.0

    def _netpbm_features(self, p: bytes, out: np.ndarray) -> bool:
        gray = parse_netpbm(p)
        if gray is None:
            return False  # not 8-bit netpbm → stub fallback
        h, w = gray.shape
        rr = (np.arange(self._side) * h) // self._side
        cc = (np.arange(self._side) * w) // self._side
        pix = gray[np.ix_(rr, cc)].reshape(-1)
        out[:] = pix[: self.dim] if len(pix) >= self.dim else 0.0
        if len(pix) < self.dim:
            out[: len(pix)] = pix
        return True

    def _wav_features(self, p: bytes, out: np.ndarray) -> bool:
        parsed = parse_wav(p)
        if parsed is None:
            return False  # not decodable WAV → stub fallback
        x, _rate = parsed
        if not len(x):
            return False
        # mean-|amplitude| envelope over dim equal time buckets, O(n)
        # via one cumsum (no Python loop over buckets)
        idx = (np.arange(self.dim + 1, dtype=np.int64) * len(x)) // self.dim
        c = np.concatenate(([0.0], np.cumsum(np.abs(x), dtype=np.float64)))
        widths = np.maximum(idx[1:] - idx[:-1], 1)
        out[:] = ((c[idx[1:]] - c[idx[:-1]]) / widths).astype(np.float32)
        return True

    def _pil_features(self, p: bytes, out: np.ndarray) -> bool:
        import io
        try:
            img = self._pil.open(io.BytesIO(p))
            img = img.convert("L").resize((self._side, self._side))
        except Exception:
            return False  # undecodable payload → stub fallback
        pix = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
        out[:] = pix[: self.dim] if len(pix) >= self.dim else 0.0
        if len(pix) < self.dim:
            out[: len(pix)] = pix
        return True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist() if "kind" in batch.column_names \
            else ["image"] * len(payloads)
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        for i, (p, kind) in enumerate(zip(payloads, kinds)):
            if not p:
                continue
            if kind == "image":
                if self.decoder == "pil" and self._pil_features(p, feats[i]):
                    continue
                if self.decoder == "netpbm" \
                        and self._netpbm_features(p, feats[i]):
                    continue
            if kind == "audio" and self.decoder is not None \
                    and self._wav_features(p, feats[i]):
                continue
            self._stub_features(p, feats[i])
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.dim))


def decode_media(ds: "rd.Dataset", *, dim: int = 32, fake: bool = False,
                 batch_size: int = 32, concurrency=(1, 4)) -> "rd.Dataset":
    """Feature-extract binary media: small batches, actor pool, payload
    dropped from the output.  Real decode by default (PIL or the built-in
    netpbm decoder); ``fake=True`` forces the byte-slice stub."""
    return ds.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"dim": dim, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def frame_sample_plan(ds: "rd.Dataset", every_ms: int = 500) -> "rd.Dataset":
    """Video frame-sampling *plan*: one row per frame to extract
    (media_id, frame_idx, ts_ms).  The decode itself is the stubbed stage;
    the fan-out plumbing (flat_map-style expansion inside map_batches) is
    real."""

    def expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        video = t.filter(pc.equal(t["kind"], "video"))
        mids = np.asarray(video["media_id"], dtype=np.int64)
        durs = np.asarray(pc.fill_null(video["duration_ms"], 0),
                          dtype=np.int64)
        # frames per row = ceil(dur / every_ms); whole batch expanded with
        # repeat/arange — no Python loop over rows or frames
        n_frames = np.maximum(-(-durs // every_ms), 0)
        n_frames[durs <= 0] = 0
        if len(n_frames) == 0 or n_frames.sum() == 0:
            return pa.table({
                "media_id": pa.array([], type=pa.int64()),
                "frame_idx": pa.array([], type=pa.int32()),
                "ts_ms": pa.array([], type=pa.int32())})
        ids = np.repeat(mids, n_frames)
        starts = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
        fidx = np.arange(int(n_frames.sum()), dtype=np.int64) \
            - np.repeat(starts, n_frames)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(fidx.astype(np.int32)),
            "ts_ms": pa.array((fidx * every_ms).astype(np.int32))})

    return ds.select_columns(["media_id", "kind", "duration_ms"]) \
        .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
