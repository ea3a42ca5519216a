"""Real codec decode path (optional Pillow dependency): exercises the
mapInPandas plumbing with genuine PNG payloads where Pillow exists;
skip-marked (not fake-passed) where it does not, and the codec-less
environment still pins the NotImplementedError contract."""

import struct

import pytest

from data_pipeline_spark.operators import multimodal as mm


def _wrap(media_id: int, kind: str, body: bytes) -> tuple:
    header = struct.pack(">BBHHI", mm.MEDIA_MAGIC, 0, 0, 0, len(body))
    return (media_id, kind, bytearray(header + body))


@pytest.mark.skipif(not mm.HAS_PIL, reason="Pillow not installed")
def test_decode_real_decodes_actual_pngs(spark):
    import io

    from PIL import Image

    rows = []
    for i, (w, h) in enumerate([(32, 24), (16, 16), (64, 8)]):
        img = Image.new("RGB", (w, h), color=(i * 40, 100, 200))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append(_wrap(i, "image", buf.getvalue()))
    rows.append(_wrap(99, "audio", b"not an image"))  # filtered out
    media = spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary"
    )
    got = {r.media_id: r for r in mm.decode_real(media).collect()}
    assert set(got) == {0, 1, 2}  # audio row filtered, never decoded
    assert (got[0].orig_width, got[0].orig_height) == (32, 24)
    assert (got[2].orig_width, got[2].orig_height) == (64, 8)
    for r in got.values():
        assert (r.thumb_w, r.thumb_h) == (8, 8)
        assert len(r.thumb_md5) == 32
    # determinism: same inputs -> same pixel hashes
    again = {r.media_id: r.thumb_md5 for r in mm.decode_real(media).collect()}
    assert again == {k: v.thumb_md5 for k, v in got.items()}


@pytest.mark.skipif(mm.HAS_PIL, reason="Pillow installed: real path runs")
def test_decode_real_raises_upfront_without_codecs(spark):
    media = spark.createDataFrame(
        [_wrap(0, "image", b"xx")],
        "media_id bigint, kind string, payload binary",
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_real(media)
