"""Multimodal plumbing: binary payload columns, actor-pool decode stage
(stubbed decoder), frame-sample fan-out."""

import pytest

import ray.data as rd

from crn_meta_validate_ray.stages.multimodal import (
    DecodeImageStage,
    decode_media,
    frame_sample_plan,
    synth_media_table,
)


def test_synth_media_schema():
    t = synth_media_table(32)
    assert t.num_rows == 32
    assert t.schema.field("payload").type == "binary"
    # deterministic
    assert t.equals(synth_media_table(32))


def test_decode_stage_picks_builtin_decoder_without_pil():
    stage = DecodeImageStage(fake=False)
    assert stage.decoder in ("pil", "netpbm")  # never undecodable


def test_netpbm_parse_and_features(ray_session):
    """Built-in decoder: P6 header (with comment) parses, Rec.601
    grayscale and nearest resize match a hand computation; malformed
    payloads fall back to the stub."""
    import numpy as np
    import pyarrow as pa
    from crn_meta_validate_ray.stages.multimodal import parse_netpbm

    # 2×2 RGB: red, green / blue, white
    raster = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    p6 = b"P6\n# a comment\n2 2\n255\n" + raster
    gray = parse_netpbm(p6)
    assert gray.shape == (2, 2)
    assert np.allclose(gray, [[0.299, 0.587], [0.114, 1.0]], atol=1e-6)
    # P5 grayscale
    p5 = b"P5 3 1 255 " + bytes([0, 128, 255])
    g5 = parse_netpbm(p5)
    assert g5.shape == (1, 3) and abs(g5[0, 1] - 128 / 255) < 1e-6
    # malformed: truncated raster, bad magic, maxval > 255
    assert parse_netpbm(b"P6\n2 2\n255\n" + raster[:6]) is None
    assert parse_netpbm(b"P4\n2 2\n255\n" + raster) is None
    assert parse_netpbm(b"P6\n2 2\n65535\n" + raster) is None

    t = pa.table({
        "media_id": pa.array([0, 1], type=pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([p6, b"not an image"], type=pa.binary()),
    })
    out = {r["media_id"]: np.asarray(r["feature"])
           for r in decode_media(rd.from_arrow(t), dim=4,
                                 batch_size=4).take_all()}
    # dim=4 → 2×2 thumbnail of the 2×2 image = the image itself
    assert np.allclose(out[0], [0.299, 0.587, 0.114, 1.0], atol=1e-6)
    # undecodable payload → stub features (payload bytes / 255)
    want = np.frombuffer(b"not ", dtype=np.uint8) / 255.0
    assert np.allclose(out[1], want)


def test_decode_media_real_path_on_synth_ppm(ray_session):
    """synth_media_table image payloads are valid PPMs: the real decoder
    produces features that differ from the stub byte-slice (which would
    read header bytes), and deterministically so."""
    import numpy as np
    from crn_meta_validate_ray.stages.multimodal import parse_netpbm

    t = synth_media_table(48)
    df = t.to_pandas()
    img = df[df["kind"] == "image"].iloc[0]
    assert parse_netpbm(img["payload"]) is not None
    real = {r["media_id"]: np.asarray(r["feature"]) for r in decode_media(
        rd.from_arrow(t), dim=16, batch_size=8).take_all()}
    stub = {r["media_id"]: np.asarray(r["feature"]) for r in decode_media(
        rd.from_arrow(t), dim=16, fake=True, batch_size=8).take_all()}
    mid = int(img["media_id"])
    assert not np.allclose(real[mid], stub[mid])
    real2 = {r["media_id"]: np.asarray(r["feature"]) for r in decode_media(
        rd.from_arrow(t), dim=16, batch_size=8).take_all()}
    assert np.allclose(real[mid], real2[mid])


def test_decode_media_fake_path(ray_session):
    ds = rd.from_arrow(synth_media_table(48))
    out = decode_media(ds, dim=16, fake=True, batch_size=8)
    rows = out.take_all()
    assert len(rows) == 48
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all("payload" not in r for r in rows)
    # deterministic features from payload bytes
    assert rows[0]["feature"] == decode_media(
        rd.from_arrow(synth_media_table(48)), dim=16, fake=True,
        batch_size=8).take_all()[0]["feature"]


def test_frame_sample_plan(ray_session):
    t = synth_media_table(64)
    ds = rd.from_arrow(t)
    plan = frame_sample_plan(ds, every_ms=500).take_all()
    df = t.to_pandas()
    want = int(sum((-(-int(d) // 500)) for k, d in
                   zip(df["kind"], df["duration_ms"]) if k == "video" and d))
    assert len(plan) == want
    assert all(r["frame_idx"] >= 0 and r["ts_ms"] % 500 == 0 for r in plan)


HAVE_PIL = False
try:
    import PIL.Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    pass


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not available in container")
def test_decode_media_pil_path(ray_session):
    """Real decode path: PNG payloads round-trip through PIL → grayscale
    thumbnail features in [0, 1]."""
    import io

    import PIL.Image as Image

    imgs = []
    for v in (0, 128, 255):
        im = Image.new("L", (8, 8), color=v)
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        imgs.append(buf.getvalue())
    t = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "kind": pa.array(["image"] * 3),
        "payload": pa.array(imgs, type=pa.binary()),
    })
    out = decode_media(rd.from_arrow(t), dim=16, fake=False,
                       batch_size=4).take_all()
    assert len(out) == 3
    for row, v in zip(sorted(out, key=lambda r: r["media_id"]),
                      (0, 128, 255)):
        f = np.asarray(row["feature"])
        assert f.shape == (16,)
        assert np.allclose(f, v / 255.0, atol=1 / 255)


def test_wav_roundtrip_and_envelope():
    import numpy as np
    from crn_meta_validate_ray.stages.multimodal import (DecodeImageStage,
                                                         parse_wav,
                                                         wav_bytes)
    rate = 8000
    t = np.arange(4000) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = wav_bytes(x, rate)
    parsed = parse_wav(p)
    assert parsed is not None
    got, got_rate = parsed
    assert got_rate == rate and len(got) == 4000
    np.testing.assert_allclose(got, x, atol=2 / 32768)

    stage = DecodeImageStage(dim=8)
    out = np.zeros(8, dtype=np.float32)
    assert stage._wav_features(p, out)
    # mean |sin| over full cycles ≈ 2/pi * amplitude
    np.testing.assert_allclose(out, 0.5 * 2 / np.pi, atol=0.02)


def test_wav_rejects_garbage_and_handles_stereo():
    import numpy as np
    from crn_meta_validate_ray.stages.multimodal import parse_wav, wav_bytes
    assert parse_wav(b"not a wav at all, definitely not 44 bytes long!!") \
        is None
    assert parse_wav(b"RIFF\x00\x00\x00\x00WAVEjunkjunkjunkjunkjunkjunk"
                     b"junkjunkjunkjunk") is None
    # hand-build a stereo PCM16 file: L=+0.5, R=-0.5 → mono mean 0
    pcm = np.zeros(200, dtype="<i2")
    pcm[0::2] = 16384
    pcm[1::2] = -16384
    raw = pcm.tobytes()

    def le(v, w):
        return int(v).to_bytes(w, "little")

    p = (b"RIFF" + le(36 + len(raw), 4) + b"WAVE"
         + b"fmt " + le(16, 4) + le(1, 2) + le(2, 2) + le(8000, 4)
         + le(8000 * 4, 4) + le(4, 2) + le(16, 2)
         + b"data" + le(len(raw), 4) + raw)
    got, rate = parse_wav(p)
    assert rate == 8000 and len(got) == 100
    assert abs(got).max() < 1e-4  # channels cancel in the downmix


def test_decode_media_real_audio_path(ray_session):
    import numpy as np
    import ray.data as rd
    from crn_meta_validate_ray.stages.multimodal import (decode_media,
                                                         synth_media_table)
    tbl = synth_media_table(48)
    out = decode_media(rd.from_arrow(tbl), dim=8, batch_size=16).to_pandas()
    audio = out[out["kind"] == "audio"]
    assert len(audio) > 0
    feats = np.vstack(audio["feature"].to_numpy())
    # tone amplitude 0.5 → envelope ≈ 2/pi*0.5 ≈ 0.32 in every bucket;
    # the byte-slice stub would give near-uniform [0,1] noise ≈ 0.5 mean
    # with high variance — check the envelope is tight and plausible
    assert (np.abs(feats - feats.mean(axis=1, keepdims=True)) < 0.1).all()
    assert ((feats.mean(axis=1) > 0.2) & (feats.mean(axis=1) < 0.45)).all()


def test_frame_sample_plan_no_video_rows(ray_session):
    """A batch with zero video rows must yield an empty plan, not a
    np.repeat broadcast error."""
    import pyarrow as pa
    t = pa.table({
        "media_id": pa.array([0, 1], type=pa.int64()),
        "kind": pa.array(["image", "audio"]),
        "duration_ms": pa.array([0, 1200], type=pa.int32()),
    })
    plan = frame_sample_plan(rd.from_arrow(t), every_ms=500).take_all()
    assert plan == []


def test_wav_truncated_data_chunk_returns_none_or_parses():
    """Truncated/odd-length data chunks must not crash the decode actor:
    parse drops the partial trailing sample instead of raising."""
    import numpy as np
    from crn_meta_validate_ray.stages.multimodal import parse_wav, wav_bytes
    x = 0.25 * np.sin(np.arange(400) / 10.0)
    p = wav_bytes(x, 8000)
    got = parse_wav(p[:-1])  # odd-length PCM16 data
    assert got is not None
    samples, rate = got
    assert rate == 8000 and len(samples) == 399
