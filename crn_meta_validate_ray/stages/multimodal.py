"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Ray-side plumbing is real and tested — schema contract, actor-pool
stage shape, small batch sizes for large payloads, fixed-size feature
output — while the actual media decoding is STUBBED: the image/audio
libraries are not available in this container, so ``DecodeImageStage``
raises ``NotImplementedError`` unless a decoder is importable or
``fake=True`` supplies the deterministic test decoder.

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
    """Deterministic fake media rows (binary payload = seeded bytes whose
    length scales with the declared dimensions)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    width = np.where(kinds == "audio", 0, rng.integers(16, 64, n)).astype(np.int32)
    height = np.where(kinds == "audio", 0, rng.integers(16, 64, n)).astype(np.int32)
    dur = np.where(kinds == "image", 0, rng.integers(100, 5000, n)).astype(np.int32)
    payloads = [rng.integers(0, 256, max(int(w) * int(h), 128),
                             dtype=np.uint8).tobytes()
                for w, h in zip(width, height)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.astype(object), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(width),
        "height": pa.array(height),
        "duration_ms": pa.array(dur),
    })


class DecodeImageStage:
    """Actor-pool stage: payload → fixed-size feature vector.

    Real path (``fake=False``): ``__init__`` imports PIL once per actor;
    ``__call__`` decodes each image payload, converts to grayscale,
    resizes to a ``⌈√dim⌉``-square thumbnail and emits the normalized
    pixels truncated/padded to ``dim`` floats.  Non-image kinds (and
    undecodable payloads) fall back to the deterministic byte-slice
    features.  Without PIL, construction raises ``NotImplementedError`` —
    loudly, not at the 10-millionth batch; ``fake=True`` selects the
    deterministic stub decoder (feature = first ``dim`` payload bytes /
    255) for codec-free containers.
    """

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
                raise NotImplementedError(
                    "no image decoder available in this environment; "
                    "construct with fake=True for the deterministic stub")
        side = 1
        while side * side < dim:
            side += 1
        self._side = side

    def _stub_features(self, p: bytes, out: np.ndarray):
        raw = np.frombuffer(p[: self.dim], dtype=np.uint8)
        out[: len(raw)] = raw / 255.0

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
            if self.decoder == "pil" and kind == "image":
                if self._pil_features(p, feats[i]):
                    continue
            self._stub_features(p, feats[i])
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.dim))


def decode_media(ds: "rd.Dataset", *, dim: int = 32, fake: bool = True,
                 batch_size: int = 32, concurrency=(1, 4)) -> "rd.Dataset":
    """Feature-extract binary media: small batches, actor pool, payload
    dropped from the output."""
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
        ids, fidx, tsms = [], [], []
        mids = t["media_id"].to_pylist()
        durs = t["duration_ms"].to_pylist()
        kinds = t["kind"].to_pylist()
        for mid, dur, kind in zip(mids, durs, kinds):
            if kind != "video" or not dur:
                continue
            for k, ts in enumerate(range(0, int(dur), every_ms)):
                ids.append(mid)
                fidx.append(k)
                tsms.append(ts)
        return pa.table({"media_id": pa.array(ids, type=pa.int64()),
                         "frame_idx": pa.array(fidx, type=pa.int32()),
                         "ts_ms": pa.array(tsms, type=pa.int32())})

    return ds.select_columns(["media_id", "kind", "duration_ms"]) \
        .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
