"""Vendored pure-Python Blosc1/blosclz codec (blosclz.py) — the
reference's fourth codec (`ref src/Codings.jl:74-80`) un-gated.

Frames are hand-built from the public c-blosc 1.x chunk layout and the
FastLZ-derived token grammar, so every decode path (literal runs,
short/long/far matches, RLE, split streams, raw-stored streams,
blockwise byte-shuffle, leftover blocks, memcpy frames) is exercised
without the C library."""
import struct

import numpy as np
import pytest

from bigarrays_jl_spark import blosclz, codecs


# -- token-stream vectors (lz_decompress) --------------------------------

def test_lz_literals_only():
    # ctrl<32 ⇒ literal run of ctrl+1 bytes
    assert blosclz.lz_decompress(bytes([7]) + b"abcdefgh", 8) == b"abcdefgh"


def test_lz_short_match():
    # "abc" then a 3-byte match at distance 2 (ref index 0) ⇒ "abcabc"
    src = bytes([2]) + b"abc" + bytes([1 << 5, 2])
    assert blosclz.lz_decompress(src, 6) == b"abcabc"


def test_lz_rle_zero_distance():
    # distance 0 repeats the previous byte (the memset path)
    src = bytes([0]) + b"x" + bytes([3 << 5, 0])
    assert blosclz.lz_decompress(src, 6) == b"x" * 6


def test_lz_long_match_with_255_extension():
    # len code 7 extends through 255-terminated continuation bytes:
    # length = 6 + 255 + 45 + 3 = 309, distance 1 ⇒ "ab" period
    src = bytes([1]) + b"ab" + bytes([7 << 5, 255, 45, 1])
    want = ("ab" * 200)[: 2 + 309].encode()
    assert blosclz.lz_decompress(src, len(want)) == want


def test_lz_far_distance_escape():
    # the 31/255 pair escapes to a 2-byte distance beyond MAX_DISTANCE
    rng = np.random.default_rng(1)
    lit = rng.integers(0, 256, 8300, dtype=np.uint8).tobytes()
    toks = bytearray()
    for i in range(0, 8300, 32):
        run = lit[i:i + 32]
        toks += bytes([len(run) - 1]) + run
    toks += bytes([(2 << 5) | 31, 255, 0, 9])  # dist 8191+9, len 4
    out = blosclz.lz_decompress(bytes(toks), 8304)
    ref = 8300 - 8200 - 1
    assert out == lit + lit[ref:ref + 4]


def test_lz_corrupt_raises():
    with pytest.raises(ValueError):
        # match whose distance reaches before the output start
        blosclz.lz_decompress(bytes([0]) + b"a" + bytes([1 << 5, 5]), 64)
    with pytest.raises(ValueError):
        blosclz.lz_decompress(bytes([31]) + b"xy", 64)   # short literal run


# -- frame-level decode --------------------------------------------------

def _frame(flags, typesize, nbytes, blocksize, blocks):
    """Assemble a Blosc1 chunk from per-block stream lists."""
    nblocks = len(blocks)
    body = bytearray()
    starts = []
    pos = 16 + 4 * nblocks
    for streams in blocks:
        starts.append(pos)
        for payload in streams:
            body += struct.pack("<i", len(payload)) + payload
            pos += 4 + len(payload)
    head = struct.pack("<BBBBIII", 2, 1, flags, typesize,
                       nbytes, blocksize, 16 + 4 * nblocks + len(body))
    return head + struct.pack(f"<{nblocks}I", *starts) + bytes(body)


def _shuffle(buf: bytes, typesize: int) -> bytes:
    n = len(buf) - len(buf) % typesize
    items = n // typesize
    return (np.frombuffer(buf[:n], dtype=np.uint8)
            .reshape(items, typesize).T.tobytes() + buf[n:])


def test_frame_single_block_compressed():
    # DONT_SPLIT frame whose one block holds a real token stream
    # (csize < uncompressed size — equal sizes mean stored-raw)
    data = b"abc" * 10
    stream = bytes([2]) + b"abc" + bytes([7 << 5, 18, 2])
    frame = _frame(blosclz.DONT_SPLIT, 1, len(data), len(data), [[stream]])
    assert blosclz.decompress(frame) == data
    assert codecs.get_codec("blosclz").decode(frame) == data


def test_frame_split_streams_with_shuffle():
    # typesize 4, blocksize/typesize ≥ 128 ⇒ 4 split streams; each
    # stored raw (csize == uncompressed size); DOSHUFFLE unshuffles
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    sh = _shuffle(data, 4)
    streams = [sh[i * 256:(i + 1) * 256] for i in range(4)]
    frame = _frame(blosclz.DOSHUFFLE, 4, 1024, 1024, [streams])
    assert blosclz.decompress(frame) == data


def test_frame_multiblock_leftover_unsplit():
    # two blocks: the full one splits, the 512-byte leftover does not;
    # shuffle applies per block
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 1536, dtype=np.uint8).tobytes()
    b1 = _shuffle(data[:1024], 4)
    b2 = _shuffle(data[1024:], 4)
    frame = _frame(blosclz.DOSHUFFLE, 4, 1536, 1024,
                   [[b1[i * 256:(i + 1) * 256] for i in range(4)], [b2]])
    assert blosclz.decompress(frame) == data


def test_frame_memcpy_roundtrip():
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    frame = blosclz.compress(data, typesize=2)
    assert frame[2] & blosclz.MEMCPYED
    assert blosclz.decompress(frame) == data
    assert blosclz.decompress(blosclz.compress(b"")) == b""


def test_frame_guards():
    with pytest.raises(ValueError):
        blosclz.decompress(b"short")
    lz4 = bytearray(blosclz.compress(b"x" * 100))
    lz4[2] = (1 << 5) | blosclz.DONT_SPLIT     # compressor code 1 = lz4
    with pytest.raises(NotImplementedError):
        blosclz.decompress(bytes(lz4))
    bit = bytearray(blosclz.compress(b"x" * 100))
    bit[2] = blosclz.DOBITSHUFFLE
    with pytest.raises(NotImplementedError):
        blosclz.decompress(bytes(bit))


def test_codec_always_available():
    assert "blosclz" in codecs.available_encodings()
    c = codecs.get_codec("blosclz")
    payload = bytes(range(256)) * 8
    assert c.decode(c.encode(payload)) == payload


@pytest.mark.skipif(codecs._blosc is None,
                    reason="C blosc not installed (fallback covered above)")
def test_cross_backend_parity():  # pragma: no cover - env-dependent
    rng = np.random.default_rng(5)
    data = rng.integers(0, 64, 100_000, dtype=np.uint8).tobytes()
    assert blosclz.decompress(
        codecs._blosc.compress(data, typesize=4, cname="blosclz",
                               shuffle=codecs._blosc.SHUFFLE)) == data
    assert codecs._blosc.decompress(blosclz.compress(data)) == data


# -- end-to-end: an existing blosclz precomputed layer imports and
#    cutouts byte-identically (r9 verdict task 3's done-criterion) ------

def test_import_precomputed_blosclz_layer(spark, tmp_path):
    import json

    from bigarrays_jl_spark.volume import Volume

    root = tmp_path / "blosclz_layer"
    mip = root / "1_1_1"
    mip.mkdir(parents=True)
    info = {"num_channels": 1, "type": "image", "data_type": "uint32",
            "scales": [{"encoding": "blosclz",
                        "chunk_sizes": [[32, 32, 32]], "key": "1_1_1",
                        "resolution": [1, 1, 1], "voxel_offset": [0, 0, 0],
                        "size": [64, 32, 32]}]}
    (root / "info").write_text(json.dumps(info))
    rng = np.random.default_rng(6)
    a = rng.integers(0, 2**32, (64, 32, 32), dtype=np.uint32)
    # chunk 1: realistic shuffled split-stream frame (typesize 4)
    raw0 = a[0:32].tobytes(order="F")          # 131072 bytes
    sh = _shuffle(raw0, 4)
    n = len(raw0) // 4
    frame0 = _frame(blosclz.DOSHUFFLE, 4, len(raw0), len(raw0),
                    [[sh[i * n:(i + 1) * n] for i in range(4)]])
    (mip / "0-32_0-32_0-32").write_bytes(frame0)
    # chunk 2: pure-memcpy frame (c-blosc clevel-0 output)
    (mip / "32-64_0-32_0-32").write_bytes(
        blosclz.compress(a[32:64].tobytes(order="F"), typesize=4))
    vol = Volume.import_precomputed(spark, str(root),
                                    str(tmp_path / "imported"))
    out, origin = vol.cutout(((0, 64), (0, 32), (0, 32)))
    assert origin == (0, 0, 0)
    np.testing.assert_array_equal(out, a)
