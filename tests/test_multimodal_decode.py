"""decode_media routed through the volume codec registry (r14 verdict
task 4): image/jpeg shares the Pillow-gated JpegCodec with the chunk
store; formats with no in-repo codec stay honest stubs; and the
mm_decode_image mapInPandas pipeline is real Spark plumbing whose
kernel alone is gated on the imaging library."""

import importlib.util
import sys
import types

import pytest

from bigarrays_jl_spark.operators.multimodal import (decode_media,
                                                     mm_decode_image)

HAS_PILLOW = importlib.util.find_spec("PIL") is not None


def test_decode_media_no_codec_format_is_stub():
    # COMPRESSED video has no in-repo codec and stays an honest stub
    with pytest.raises(NotImplementedError, match="no in-repo codec"):
        decode_media("video/mp4", b"\x00\x00\x00 ftypisom")


def test_decode_media_y4m_roundtrip():
    # video/y4m is REAL (r16): synth a container, decode_y4m must
    # recover header fields and every luma plane exactly, and
    # decode_media must return the concatenated planes
    from bigarrays_jl_spark.operators.multimodal import (decode_y4m,
                                                         encode_y4m)
    frames = [bytes(range(f, f + 32)) for f in range(0, 96, 32)]
    blob = encode_y4m(frames, 8, 4, 30, 1)
    assert blob.startswith(b"YUV4MPEG2 W8 H4 F30:1")
    w, h, fn, fd, got = decode_y4m(blob)
    assert (w, h, fn, fd) == (8, 4, 30, 1)
    assert got == frames
    assert decode_media("video/y4m", blob) == b"".join(frames)
    assert decode_media("Y4M", blob) == b"".join(frames)


def test_decode_y4m_c420_luma_plane():
    # the y4m default chroma mode: frame = luma + 2 quarter planes;
    # the parser must step over chroma and return luma only
    from bigarrays_jl_spark.operators.multimodal import decode_y4m
    luma = bytes(range(32))
    chroma = bytes(8) + bytes(8)                  # 2 x (8x4)/4
    blob = (b"YUV4MPEG2 W8 H4 F25:1 Ip A1:1 C420\n"
            + b"FRAME\n" + luma + chroma
            + b"FRAME\n" + luma + chroma)
    w, h, fn, fd, got = decode_y4m(blob)
    assert (w, h) == (8, 4) and got == [luma, luma]


def test_decode_y4m_malformed_raises():
    import pytest as _pt

    from bigarrays_jl_spark.operators.multimodal import decode_y4m
    with _pt.raises(ValueError, match="magic"):
        decode_y4m(b"RIFF....WAVE")
    with _pt.raises(ValueError, match="FRAME"):
        decode_y4m(b"YUV4MPEG2 W8 H4 F25:1 Cmono\nJUNK\n" + bytes(32))
    with _pt.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W8 H4 F25:1 Cmono\nFRAME\n" + bytes(10))


def test_decode_media_wav_roundtrip():
    # audio/wav is REAL (r15 verdict task 3): synth a container with
    # the stdlib writer, decode_media must return the exact PCM bytes,
    # and decode_audio must recover every header field
    import numpy as np

    from bigarrays_jl_spark.operators.multimodal import (_wav_bytes,
                                                         decode_audio)
    pcm = (np.arange(-100, 100, dtype=np.int64) * 163) \
        .astype("<i2").tobytes()
    blob = _wav_bytes(pcm, 12000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    rate, ch, sw, nf, got_pcm = decode_audio(blob)
    assert (rate, ch, sw, nf) == (12000, 1, 2, 200)
    assert got_pcm == pcm
    assert decode_media("audio/wav", blob) == pcm
    assert decode_media("WAV", blob) == pcm


def test_decode_media_wav_malformed_raises():
    import wave
    with pytest.raises(wave.Error):
        decode_media("audio/wav", b"RIFF....WAVE")      # truncated junk


@pytest.mark.skipif(HAS_PILLOW, reason="Pillow present: gate is open")
def test_decode_media_jpeg_gate_without_pillow():
    # same honest gate as the chunk codec: decode is opt-in via Pillow
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_media("image/jpeg", b"\xff\xd8\xff\xe0 not really")


def test_decode_media_jpeg_routes_through_codec(monkeypatch):
    # fake-Pillow plumbing (the codec tests' pattern): the mime router
    # must hit JpegCodec.decode, including the expected_width aspect
    # guard pass-through
    import numpy as np
    img = np.arange(32, dtype=np.uint8).reshape(4, 8)     # width 8
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(open=lambda bio: img)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    for fmt in ("image/jpeg", "jpeg", "JPG"):
        assert decode_media(fmt, b"x") == img.tobytes()
    assert decode_media("image/jpeg", b"x",
                        expected_width=8) == img.tobytes()
    with pytest.raises(ValueError, match="width"):
        decode_media("image/jpeg", b"x", expected_width=16)


@pytest.mark.skipif(HAS_PILLOW, reason="Pillow present: gate is open")
def test_mm_decode_image_pipeline_gate_propagates(spark):
    # the pipeline is REAL Spark plumbing: without Pillow the executor
    # raises the gate's message, never a silent fake decode
    df = spark.createDataFrame(
        [(1, "image/jpeg", b"\xff\xd8\xff\xe0")],
        "doc_id long, mime string, payload binary")
    with pytest.raises(Exception, match="Pillow"):
        mm_decode_image(df).collect()


def test_mm_decode_image_pipeline_real_pillow(spark):
    # with Pillow installed the pipeline decodes genuine JPEG payloads
    # and the integer pixel stats match a local numpy decode exactly
    PIL = pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    rows, want = [], {}
    for doc_id in (1, 2, 3):
        a = ((doc_id * 7 + np.add.outer(np.arange(16) * 3,
                                        np.arange(24) * 5)) % 200
             ).astype(np.uint8)
        bio = io.BytesIO()
        Image.fromarray(a, mode="L").save(bio, format="JPEG", quality=95)
        data = bio.getvalue()
        dec = np.asarray(Image.open(io.BytesIO(data))).astype(np.int64)
        rows.append((doc_id, "image/jpeg", data))
        want[doc_id] = (dec.size, int(dec.sum()) * 10000 // dec.size)
    df = spark.createDataFrame(
        rows, "doc_id long, mime string, payload binary")
    got = {r.doc_id: (r.n_pixels, r.mean_pixel_e4)
           for r in mm_decode_image(df, expected_width=24).collect()}
    assert got == want
