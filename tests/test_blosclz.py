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


# -- compressing encoder (r10 verdict task 6) ----------------------------

def test_encoder_compresses_and_roundtrips():
    """Structured data must come back byte-identical AND smaller —
    through real compressed frames, not the memcpy fallback."""
    cases = {
        "ramp_u16/2": (np.arange(100_000, dtype=np.uint16).tobytes(), 2),
        "ramp_u16/4": (np.arange(100_000, dtype=np.uint16).tobytes(), 4),
        "const/1": (b"\x07" * 200_000, 1),
        "text/1": (b"the quick brown fox jumps over the lazy dog. " * 4000, 1),
        "labels/4": (np.repeat(np.arange(2000, dtype=np.uint32), 50)
                     .tobytes(), 4),
    }
    for name, (data, ts) in cases.items():
        frame = blosclz.compress(data, typesize=ts)
        assert blosclz.decompress(frame) == data, name
        assert not frame[2] & blosclz.MEMCPYED, name
        assert len(frame) < len(data) // 3, \
            f"{name}: ratio {len(frame) / len(data):.3f} too weak"


def test_encoder_incompressible_falls_back_to_memcpy():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes()
    frame = blosclz.compress(data, typesize=1)
    assert frame[2] & blosclz.MEMCPYED           # c-blosc clevel-0 form
    assert len(frame) == len(data) + 16
    assert blosclz.decompress(frame) == data


def test_encoder_multiblock_leftover():
    """> one 64 KiB block with a partial (unsplit) trailing block."""
    data = np.arange(90_000, dtype=np.uint16).tobytes()   # 180 000 B
    frame = blosclz.compress(data, typesize=2)
    blocksize = struct.unpack_from("<I", frame, 8)[0]
    assert len(data) % blocksize != 0                      # real leftover
    assert blosclz.decompress(frame) == data


def test_encoder_first_token_is_literal():
    """The decoder masks the first byte with &31 — a leading match
    token would be misread, so the stream must open with literals."""
    data = b"ABCDABCDABCD" * 100
    comp = blosclz.lz_compress(data)
    assert comp is not None and comp[0] < 32
    assert blosclz.lz_decompress(comp, len(data)) == data


def test_encoder_long_match_extension_bytes():
    """Runs long enough to need 255-continuation length bytes."""
    for run in (9, 263, 264, 265, 300, 10_000):           # straddle 255 sums
        data = b"Z" + b"Q" * run + b"tail-1234567890abcdef"
        comp = blosclz.lz_compress(data)
        assert comp is not None
        assert blosclz.lz_decompress(comp, len(data)) == data


def test_encoder_fuzz_roundtrip():
    rng = np.random.default_rng(23)
    for trial in range(30):
        n = int(rng.integers(0, 50_000))
        ts = int(rng.choice([1, 2, 3, 4, 8, 16, 17]))
        kind = trial % 3
        if kind == 0:     # low-entropy bytes
            data = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        elif kind == 1:   # repeated random motif
            motif = rng.integers(0, 256, max(1, n // 50 + 1),
                                 dtype=np.uint8).tobytes()
            data = (motif * (n // max(1, len(motif)) + 1))[:n]
        else:             # high entropy
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        frame = blosclz.compress(data, typesize=ts)
        assert blosclz.decompress(frame) == data, (trial, n, ts)


def test_blosclz_layer_writes_compressed_and_roundtrips(spark, tmp_path):
    """A layer WRITTEN as blosclz must cost compressed-size storage
    (the r10 'storage cost only' residual, closed): segmentation-like
    chunks come out several times smaller than raw, export produces
    reference-readable loose files of the same compressed size, and
    the re-import cutouts byte-identically."""
    import os

    from bigarrays_jl_spark.infos import Info
    from bigarrays_jl_spark.volume import Volume

    info = Info.from_dict({
        "num_channels": 1, "type": "segmentation", "data_type": "uint32",
        "scales": [{"encoding": "blosclz", "chunk_sizes": [[32, 32, 32]],
                    "key": "1_1_1", "resolution": [1, 1, 1],
                    "voxel_offset": [0, 0, 0], "size": [64, 32, 32]}]})
    vol = Volume.create(spark, str(tmp_path / "v"), info)
    # blocky labels — the compressible shape segmentation data has
    a = np.repeat(np.arange(512, dtype=np.uint32), 128).reshape(
        (64, 32, 32))
    vol.write(a, (0, 0, 0))
    raw_chunk = 32 * 32 * 32 * 4
    sizes = [len(r["payload"]) for r in
             vol.chunks_df().select("payload").collect()]
    assert len(sizes) == 2
    assert all(s < raw_chunk // 3 for s in sizes), sizes
    out, _ = vol.cutout(((0, 64), (0, 32), (0, 32)))
    np.testing.assert_array_equal(out, a)
    # export → loose files keep the compressed payloads as stored
    dest = tmp_path / "exported"
    assert vol.export_precomputed(str(dest)) == 2
    files = [f for f in os.listdir(dest / "1_1_1")]
    assert sorted(os.path.getsize(dest / "1_1_1" / f)
                  for f in files) == sorted(sizes)
    # …and the reference-format layer re-imports byte-identically
    vol2 = Volume.import_precomputed(spark, str(dest),
                                     str(tmp_path / "reimported"))
    out2, _ = vol2.cutout(((0, 64), (0, 32), (0, 32)))
    np.testing.assert_array_equal(out2, a)


def test_encoder_emits_far_form_and_roundtrips():
    # a 4 KiB page repeated beyond the 8190 near-distance ceiling: the
    # encoder must reach back with the (31<<8, 255) far escape instead
    # of re-literalizing the second copy
    rng = np.random.default_rng(42)
    page = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    buf = page + bytes(12000) + page
    enc = blosclz.lz_compress(buf)
    assert enc is not None
    assert blosclz.lz_decompress(enc, len(buf)) == buf
    # near-only emission would spend ~4 KiB of literals on the far copy
    saved = blosclz.MAX_FARDISTANCE
    try:
        blosclz.MAX_FARDISTANCE = 8190          # disable the far path
        near_only = blosclz.lz_compress(buf)
    finally:
        blosclz.MAX_FARDISTANCE = saved
    assert near_only is not None
    assert len(enc) <= len(near_only) - 3000, (len(enc), len(near_only))


def test_encoder_far_form_needs_length_five():
    # a 3-byte far echo is cheaper as literals (the escape costs 2
    # extra bytes) — the matcher must skip it, and the stream must
    # still round-trip
    rng = np.random.default_rng(43)
    filler = rng.integers(0, 256, 9000, dtype=np.uint8).tobytes()
    buf = filler[:3] + filler + filler[:3] + b"\x01\x02"
    enc = blosclz.lz_compress(buf)
    if enc is not None:                         # may not shrink at all
        assert blosclz.lz_decompress(enc, len(buf)) == buf


def test_encoder_far_distance_boundaries_roundtrip():
    # exact boundary distances: 8190 (last near), 8191 (first far,
    # escape payload 0) and MAX_FARDISTANCE (payload 0xFFFF)
    for gap in (8190 - 8, 8191 - 8, blosclz.MAX_FARDISTANCE - 8):
        page = bytes(range(8)) * 2              # 16-byte marker
        buf = page + b"\x00" * gap + page
        enc = blosclz.lz_compress(buf)
        assert enc is not None
        assert blosclz.lz_decompress(enc, len(buf)) == buf
