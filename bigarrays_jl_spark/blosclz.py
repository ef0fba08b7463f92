"""Vendored pure-Python Blosc1 (blosclz) frame codec — decode-complete.

Un-gates the reference's fourth codec (`ref src/Codings.jl:74-80`,
swept by `ref test/BinDicts.jl:111-120`) in environments without the
C ``blosc`` package: existing blosclz-encoded precomputed layers
import and cutout without recompression tooling.

Format knowledge is public — the c-blosc 1.x chunk layout
(README_CHUNK_FORMAT.rst) and the FastLZ-derived blosclz token
stream (blosclz.c):

16-byte header: ``version, versionlz, flags, typesize`` (bytes) then
``nbytes, blocksize, cbytes`` (little-endian uint32).  Flags: bit 0
byte-shuffle, bit 1 pure-memcpy, bit 2 bit-shuffle, bit 4 dont-split,
bits 5-7 compressor code (0 = blosclz).  Non-memcpy chunks follow with
one little-endian uint32 start offset per block (absolute within the
chunk), each block holding ``nsplits`` streams of ``int32 csize`` +
payload — a stream whose csize equals its uncompressed size is stored
raw.  Blocks byte-unshuffle independently after decompression.

Speed posture: this is the *import* path's compatibility fallback —
per-chunk Python-loop decode runs Arrow-batched in executors, and a
re-encoded dataset uses the parquet-native codecs thereafter.  Writes
emit valid pure-memcpy frames (what c-blosc itself emits at clevel 0),
so round-trips stay blosc-compatible without a C encoder.
"""
from __future__ import annotations

import struct

MAX_DISTANCE = 8191           # blosclz.c
MEMCPYED = 0x2
DOSHUFFLE = 0x1
DOBITSHUFFLE = 0x4
DONT_SPLIT = 0x10
MAX_SPLITS = 16               # blosc.c split_block
MIN_BUFFERSIZE = 128

__all__ = ["compress", "decompress"]


def lz_decompress(src: bytes, maxout: int) -> bytes:
    """The blosclz token stream (FastLZ level-1 derivative).

    Control byte: high 3 bits = match length code (0 ⇒ literal run of
    (low 5 bits)+1 bytes; else copy (code)+2 bytes, code 7 extended by
    255-terminated continuation bytes), low 5 bits = distance high
    byte, next byte = distance low byte; the 31/255 pair escapes to a
    2-byte far distance beyond MAX_DISTANCE.  Distances are relative
    to the NEXT output byte minus one (a zero distance repeats the
    previous byte — the RLE path)."""
    ip, ip_end = 0, len(src)
    out = bytearray()
    if ip_end == 0:
        return bytes(out)
    ctrl = src[ip] & 31
    ip += 1
    loop = True
    while loop:
        if ctrl >= 32:
            length = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if length == 6:                      # 7 - 1: long match
                while True:
                    code = src[ip]
                    ip += 1
                    length += code
                    if code != 255:
                        break
            code = src[ip]
            ip += 1
            dist = ofs + code
            if code == 255 and ofs == (31 << 8):
                dist = (src[ip] << 8) + src[ip + 1] + MAX_DISTANCE
                ip += 2
            ref = len(out) - dist - 1            # ref-1 in the C code
            length += 3
            if ref < 0 or len(out) + length > maxout:
                raise ValueError("corrupt blosclz stream (bad match)")
            if dist == 0:                        # RLE memset path
                out.extend(out[ref:ref + 1] * length)
            else:
                for _ in range(length):          # overlap-safe copy
                    out.append(out[ref])
                    ref += 1
            if ip < ip_end:
                ctrl = src[ip]
                ip += 1
            else:
                loop = False
        else:
            n = ctrl + 1
            if len(out) + n > maxout or ip + n > ip_end:
                raise ValueError("corrupt blosclz stream (bad literal)")
            out += src[ip:ip + n]
            ip += n
            loop = ip < ip_end
            if loop:
                ctrl = src[ip]
                ip += 1
    return bytes(out)


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    """Undo the blockwise byte-shuffle filter: stream j held byte j of
    every element; trailing ``len % typesize`` bytes pass through
    (shuffle.c's generic path)."""
    import numpy as np
    n = len(buf) - len(buf) % typesize
    items = n // typesize
    if items == 0:
        return buf
    head = (np.frombuffer(buf[:n], dtype=np.uint8)
            .reshape(typesize, items).T.tobytes())
    return head + buf[n:]


def _nsplits(typesize: int, blocksize: int, flags: int,
             leftover: bool) -> int:
    if (typesize <= MAX_SPLITS and typesize > 0
            and blocksize // typesize >= MIN_BUFFERSIZE
            and not leftover and not (flags & DONT_SPLIT)):
        return typesize
    return 1


def _decode_block(src: bytes, start: int, bsize: int, nsplits: int) -> bytes:
    """One block: ``nsplits`` sequential (int32 csize, payload) streams,
    raw-stored when csize equals the stream's uncompressed size."""
    out = bytearray()
    pos = start
    neblock = bsize // nsplits
    sizes = [neblock] * nsplits
    sizes[-1] = bsize - neblock * (nsplits - 1)
    for want in sizes:
        (csize,) = struct.unpack_from("<i", src, pos)
        pos += 4
        payload = src[pos:pos + csize]
        pos += csize
        if csize == want:                        # stored raw
            out += payload
        else:
            piece = lz_decompress(payload, want)
            if len(piece) != want:
                raise ValueError("corrupt blosclz stream (short block)")
            out += piece
    return bytes(out)


def decompress(data: bytes) -> bytes:
    if len(data) < 16:
        raise ValueError("blosc frame shorter than its 16-byte header")
    version, _versionlz, flags, typesize = data[0], data[1], data[2], data[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", data, 4)
    if cbytes > len(data):
        raise ValueError("blosc frame truncated")
    if flags & MEMCPYED:
        return bytes(data[16:16 + nbytes])
    if (flags >> 5) & 0x7 != 0:
        raise NotImplementedError(
            "only the blosclz compressor (code 0) is supported; "
            f"frame uses compressor code {(flags >> 5) & 0x7}")
    if flags & DOBITSHUFFLE:
        raise NotImplementedError(
            "bit-shuffled blosc frames are not supported by the "
            "pure-Python fallback (install the 'blosc' package)")
    if nbytes == 0:
        return b""
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}I", data, 16)
    out = bytearray()
    for j, start in enumerate(bstarts):
        bsize = min(blocksize, nbytes - j * blocksize)
        leftover = bsize < blocksize
        nsplits = _nsplits(typesize, blocksize, flags, leftover)
        try:
            block = _decode_block(data, start, bsize, nsplits)
        except (ValueError, struct.error):
            # the split rule changed across c-blosc minors (the
            # dont-split bit appeared in 1.11); fall back to the other
            # interpretation before declaring the frame corrupt
            block = _decode_block(data, start, bsize,
                                  1 if nsplits > 1 else typesize or 1)
        if flags & DOSHUFFLE and typesize > 1:
            block = _unshuffle(block, typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError("corrupt blosc frame (size mismatch)")
    return bytes(out)


def compress(data: bytes, typesize: int = 1) -> bytes:
    """A valid pure-memcpy Blosc1 frame (flags bit 1) — exactly what
    c-blosc emits at clevel 0, decodable by any blosc implementation."""
    header = struct.pack("<BBBBIII", 2, 1, MEMCPYED, max(typesize, 1),
                         len(data), max(len(data), 1), len(data) + 16)
    return header + data
