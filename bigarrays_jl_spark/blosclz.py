"""Vendored pure-Python Blosc1 (blosclz) frame codec — decode- and
encode-complete.

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

Speed posture: this is the compatibility fallback — per-chunk
Python-loop encode/decode runs Arrow-batched in executors (~10 MB/s/
core), and a re-encoded dataset uses the parquet-native codecs
thereafter.  The encoder (``lz_compress`` + ``compress``) emits real
blosclz-compressed frames — greedy hash-probe matcher, byte-shuffle
filter, per-stream raw-store fallback, whole-frame memcpy fallback —
so a layer written as "blosclz" costs reference-comparable storage
(r10 verdict task 6); incompressible input degrades to the same
memcpy frame c-blosc emits at clevel 0.
"""
from __future__ import annotations

import struct

MAX_DISTANCE = 8191           # blosclz.c
# far-form ceiling: 16-bit escape payload + MAX_DISTANCE (blosclz.c's
# MAX_FARDISTANCE, minus its off-by-one which the decoder here accepts)
MAX_FARDISTANCE = 65535 + MAX_DISTANCE
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


def _memcpy_frame(data: bytes, typesize: int) -> bytes:
    """A valid pure-memcpy Blosc1 frame (flags bit 1) — exactly what
    c-blosc emits at clevel 0, decodable by any blosc implementation."""
    header = struct.pack("<BBBBIII", 2, 1, MEMCPYED, max(typesize, 1),
                         len(data), max(len(data), 1), len(data) + 16)
    return header + data


def _shuffle(buf: bytes, typesize: int) -> bytes:
    """The blockwise byte-shuffle filter (inverse of ``_unshuffle``):
    gather byte j of every element into stream j; trailing
    ``len % typesize`` bytes pass through."""
    import numpy as np
    n = len(buf) - len(buf) % typesize
    items = n // typesize
    if items == 0:
        return buf
    head = (np.frombuffer(buf[:n], dtype=np.uint8)
            .reshape(items, typesize).T.tobytes())
    return head + buf[n:]


def _emit_literals(out: bytearray, src: bytes, lo: int, hi: int) -> None:
    """Literal runs of ≤32 bytes: ctrl = n−1 (<32), then the bytes."""
    while lo < hi:
        n = min(32, hi - lo)
        out.append(n - 1)
        out += src[lo:lo + n]
        lo += n


def _emit_match(out: bytearray, length: int, dist: int) -> None:
    """Match token, both forms.

    Near (dist ≤ 8190): ctrl packs min(len−2, 7) in the high 3 bits
    and the distance high byte in the low 5; code 7 extends with
    255-terminated continuation bytes (sum = len−9) BEFORE the
    distance low byte.

    Far (8191 ≤ dist ≤ MAX_FARDISTANCE): the (31<<8, 255) escape the
    decoder already handles — low 5 bits all-ones, distance byte 255,
    then the 16-bit big-endian (dist − MAX_DISTANCE).  Long-range
    redundancy (segmentation label volumes, the reference's primary
    payload) lives here; near-only emission re-literalizes it."""
    lencode = min(length - 2, 7)
    far = dist > 8190
    hi = 31 if far else dist >> 8
    out.append((lencode << 5) | hi)
    if lencode == 7:
        rem = length - 9
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    if far:
        d = dist - MAX_DISTANCE
        out.append(255)
        out.append(d >> 8)
        out.append(d & 255)
    else:
        out.append(dist & 255)


def lz_compress(src: bytes, min_gain: int = 0) -> bytes | None:
    """Greedy single-probe hash matcher over the blosclz token stream —
    the same search shape as blosclz.c level 1 (FastLZ lineage), emitted
    through the exact inverse of ``lz_decompress``.  Returns None when
    the stream does not shrink (caller stores the split raw, csize ==
    uncompressed size, like c-blosc).

    One probe per position in a dict keyed on the 3-byte prefix; first
    token is always a literal run (position 0 has no candidate), which
    the decoder's ``src[0] & 31`` requires.  RLE falls out naturally
    as a dist-0 self-overlap match.  Near-form distances (≤ 8190) are
    taken at length ≥ 3; far-form (≤ MAX_FARDISTANCE, the 2-byte
    escape) only at length ≥ 5 — the escape costs 2 extra bytes, the
    same economics as blosclz.c's far-away path.
    """
    n = len(src)
    if n < 16:
        return None
    out = bytearray()
    table: dict[bytes, int] = {}
    i, lit = 0, 0
    last = n - 3
    while i <= last:
        key = src[i:i + 3]
        j = table.get(j_key := key)
        table[j_key] = i
        if j is None or i - j - 1 > MAX_FARDISTANCE:
            i += 1
            continue
        # extend the 3-byte seed (source may overlap the match itself —
        # the decoder's byte-loop copy reproduces that)
        length = 3
        maxlen = n - i
        while length < maxlen and src[j + length] == src[i + length]:
            length += 1
        if i - j - 1 > 8190 and length < 5:
            i += 1            # far escape wouldn't pay for itself
            continue
        _emit_literals(out, src, lit, i)
        _emit_match(out, length, i - j - 1)
        # seed the table inside long matches so the next occurrence
        # still finds a nearby candidate; stride caps the insert cost
        stop = min(i + length, last + 1)
        for k in range(i + 1, stop, max(1, length // 16)):
            table[src[k:k + 3]] = k
        i += length
        lit = i
        if len(out) >= n:          # already not shrinking: bail early
            return None
    _emit_literals(out, src, lit, n)
    return bytes(out) if len(out) + min_gain < n else None


def compress(data: bytes, typesize: int = 1) -> bytes:
    """Compressing Blosc1 encoder (blosclz, compressor code 0).

    Mirrors the decoder exactly: blocks of ``blocksize`` bytes, each
    byte-shuffled when typesize > 1 (DOSHUFFLE), split into
    ``_nsplits`` streams of (int32 csize, payload) with raw storage
    when a stream doesn't shrink, absolute uint32 block starts after
    the 16-byte header.  Inputs under MIN_BUFFERSIZE — or frames that
    end up no smaller — fall back to the pure-memcpy form, exactly
    c-blosc's own guard (blosc.c: "incompressible data" → memcpyed).
    """
    if typesize > 255:      # header field is one byte; c-blosc treats
        typesize = 1        # oversize typesizes as untyped too
    typesize = max(typesize, 1)
    nbytes = len(data)
    if nbytes < MIN_BUFFERSIZE:
        return _memcpy_frame(data, typesize)
    # one L1-ish block per 64 KiB, aligned to whole elements so the
    # shuffle filter never straddles blocks (c-blosc picks by clevel;
    # 64 KiB matches its mid-clevel choice for typical chunk sizes)
    blocksize = min(nbytes, 64 * 1024)
    blocksize -= blocksize % typesize
    if blocksize <= 0:
        return _memcpy_frame(data, typesize)
    flags = 0
    if typesize > 1:
        flags |= DOSHUFFLE
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = []
    body = bytearray()
    base = 16 + 4 * nblocks
    for bj in range(nblocks):
        raw = data[bj * blocksize:(bj + 1) * blocksize]
        bsize = len(raw)
        if flags & DOSHUFFLE:
            raw = _shuffle(raw, typesize)
        nsplits = _nsplits(typesize, blocksize, flags, bsize < blocksize)
        neblock = bsize // nsplits
        sizes = [neblock] * nsplits
        sizes[-1] = bsize - neblock * (nsplits - 1)
        bstarts.append(base + len(body))
        pos = 0
        for want in sizes:
            piece = raw[pos:pos + want]
            pos += want
            comp = lz_compress(piece)
            if comp is None:
                body += struct.pack("<i", want) + piece
            else:
                body += struct.pack("<i", len(comp)) + comp
    cbytes = base + len(body)
    if cbytes >= nbytes + 16:
        return _memcpy_frame(data, typesize)
    header = struct.pack("<BBBBIII", 2, 1, flags, typesize,
                         nbytes, blocksize, cbytes)
    return header + struct.pack(f"<{nblocks}I", *bstarts) + bytes(body)
