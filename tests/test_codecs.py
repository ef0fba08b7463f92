"""Codec tests — magic-sniffing decode semantics from src/Codings.jl."""

import numpy as np
import pytest

from bigarrays_jl_spark import codecs


@pytest.fixture
def payload():
    rng = np.random.default_rng(42)
    return rng.integers(0, 255, size=10_000, dtype=np.uint8).tobytes()


def test_raw_identity(payload):
    c = codecs.get_codec("raw")
    assert c.decode(c.encode(payload)) == payload
    assert c.encode(payload) == payload


def test_gzip_roundtrip(payload):
    c = codecs.get_codec("gzip")
    enc = c.encode(payload)
    assert enc[:3] == codecs.GZIP_MAGIC
    assert c.decode(enc) == payload


def test_gzip_sniff_passthrough(payload):
    # src/Codings.jl:65-72: non-gzip input passes through unchanged
    c = codecs.get_codec("gzip")
    not_gzip = b"\x00\x01" + payload
    assert c.decode(not_gzip) == not_gzip


def test_zstd_roundtrip_and_sniff():
    # always available: 'zstandard' if installed, else the pyarrow
    # bundled backend (pyarrow is a hard dependency of the engine)
    c = codecs.get_codec("zstd")
    data = b"hello" * 100
    enc = c.encode(data)
    assert enc[:4] == codecs.ZSTD_MAGIC
    assert c.decode(enc) == data
    assert c.decode(b"\x00" + data) == b"\x00" + data
    assert "zstd" in codecs.available_encodings()


def test_jpeg_parity_stub(payload):
    c = codecs.get_codec("jpeg")
    with pytest.raises(NotImplementedError):
        c.encode(payload)
    with pytest.raises(NotImplementedError):
        c.decode(payload)


def test_unknown_encoding():
    with pytest.raises(ValueError):
        codecs.get_codec("lz4-nope")


def test_available_encodings():
    av = codecs.available_encodings()
    assert "raw" in av and "gzip" in av
