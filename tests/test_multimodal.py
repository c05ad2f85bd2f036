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


def test_decode_stage_requires_decoder_or_fake():
    with pytest.raises(NotImplementedError):
        DecodeImageStage(fake=False)  # no PIL in this container


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
