"""From-scratch tar (ustar) and zip container kernel — readers +
writer twins.

Bulk document corpora ship as archives (code datasets as tarballs,
document dumps as zips); this kernel gives the ingestion operators
(operators/webcorpus.extract_archive_documents) both formats without
external dependencies:

* tar: POSIX ustar layout — 512-byte headers (name, octal size/mtime,
  checksum over a space-filled checksum field, typeflag, ustar magic,
  prefix field for long paths), content rounded to 512-byte blocks,
  two zero blocks at the end. Reader accepts plain and gzip-wrapped
  (.tar.gz) streams, verifies header checksums, skips non-file
  entries (directories, links) by their declared size.
* zip: local file headers + central directory + end-of-central-
  directory, STORED and DEFLATE members (raw zlib streams), CRC-32
  verified on read. The READER walks the central directory (the
  authoritative index — appended/garbage prefixes don't confuse it),
  which is also what makes member-level random access possible.

Writers are deterministic (mtime 0, fixed attributes) and are the
roundtrip-test twins (tests/test_archives.py). Malformed input raises
``ValueError``; a hostile decompressed-size cap bounds zip bombs.
Out of scope (documented seams): zip64 (>4 GiB members/offsets —
archive-level parallelism makes multi-GiB single archives an
anti-pattern for this pipeline anyway), encrypted zips, pax/GNU tar
extensions beyond the ustar prefix field.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

__all__ = ["build_tar", "parse_tar", "build_zip", "parse_zip"]

_MAX_MEMBER = 1 << 30  # 1 GiB decompressed cap per member
_MAX_MEMBERS = 100_000


# ── tar (ustar) ─────────────────────────────────────────────────────


def _octal(n: int, width: int) -> bytes:
    return (f"%0{width - 1}o" % n).encode("ascii") + b"\x00"


def _tar_header(name: str, size: int) -> bytes:
    if size >= 8 ** 11:
        # 11 octal digits is the ustar limit; a longer string would
        # silently GROW the 512-byte header via slice assignment and
        # corrupt every following offset
        raise ValueError("tar member exceeds the 8 GiB ustar size field")
    nb = name.encode("utf-8")
    if len(nb) > 100:
        # ustar prefix field: the first '/' that leaves <= 100 bytes of
        # name (and <= 155 of prefix) is the split point
        cut = nb.find(b"/", max(0, len(nb) - 101))
        if cut <= 0 or len(nb) - cut - 1 > 100 or cut > 155:
            raise ValueError("tar member name too long for ustar")
        prefix, nb = nb[:cut], nb[cut + 1 :]
    else:
        prefix = b""
    hdr = bytearray(512)
    hdr[0:100] = nb.ljust(100, b"\x00")
    hdr[100:108] = _octal(0o644, 8)
    hdr[108:116] = _octal(0, 8)
    hdr[116:124] = _octal(0, 8)
    hdr[124:136] = _octal(size, 12)
    hdr[136:148] = _octal(0, 12)  # mtime 0: deterministic
    hdr[148:156] = b" " * 8  # checksum placeholder
    hdr[156] = ord("0")  # regular file
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[345 : 345 + len(prefix)] = prefix
    chk = sum(hdr)
    hdr[148:156] = (b"%06o" % chk) + b"\x00 "
    return bytes(hdr)


def build_tar(files: List[Tuple[str, bytes]], gz: bool = False) -> bytes:
    """(name, bytes) members → ustar archive (optionally gzip-wrapped)."""
    out = bytearray()
    for name, data in files:
        out += _tar_header(name, len(data))
        out += data
        pad = (-len(data)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    raw = bytes(out)
    if gz:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(raw) + c.flush()
    return raw


def parse_tar(data: bytes) -> List[Tuple[str, bytes]]:
    """tar (or .tar.gz) bytes → [(name, bytes)] regular-file members.
    Verifies every header checksum; ValueError on corruption."""
    if data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(data, _MAX_MEMBER)
        except zlib.error as e:
            raise ValueError(f"bad tar gzip wrapper: {e}") from None
        if d.unconsumed_tail:
            raise ValueError("tar decompresses past the member cap")
    out: List[Tuple[str, bytes]] = []
    i = 0
    n = len(data)
    while i + 512 <= n:
        hdr = data[i : i + 512]
        if hdr == b"\x00" * 512:
            break
        declared = hdr[148:156]
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        try:
            chk = int(declared.rstrip(b"\x00 ").lstrip(b" ") or b"0", 8)
            size = int(hdr[124:136].rstrip(b"\x00 ") or b"0", 8)
        except ValueError:
            raise ValueError("bad tar header field") from None
        if chk != sum(blanked):
            raise ValueError("tar header checksum mismatch")
        name = hdr[:100].rstrip(b"\x00").decode("utf-8", "replace")
        prefix = hdr[345:500].rstrip(b"\x00").decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        typeflag = hdr[156:157]
        i += 512
        if i + size > n:
            raise ValueError("tar member outruns archive")
        if typeflag in (b"0", b"\x00"):
            out.append((name, data[i : i + size]))
            if len(out) > _MAX_MEMBERS:
                raise ValueError("hostile tar member count")
        i += size + ((-size) % 512)
    return out


# ── zip ─────────────────────────────────────────────────────────────


def build_zip(
    files: List[Tuple[str, bytes]], compress: bool = True
) -> bytes:
    """(name, bytes) members → zip archive (DEFLATE when it pays and
    ``compress`` is set, STORED otherwise). Deterministic: zeroed
    times, fixed version fields."""
    if len(files) > 0xFFFF:
        raise ValueError(
            "more than 65535 members needs zip64 (documented out-of-"
            "scope seam)"
        )
    out = bytearray()
    central = bytearray()
    for name, data in files:
        nb = name.encode("utf-8")
        if len(data) >= 1 << 32:
            raise ValueError(
                "member exceeds 4 GiB: needs zip64 (documented "
                "out-of-scope seam)"
            )
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if compress:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = c.compress(data) + c.flush()
        else:
            comp = data
        method = 8 if compress and len(comp) < len(data) else 0
        if method == 0:
            comp = data
        off = len(out)
        local = struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 20, 0, method, 0, 0,
            crc, len(comp), len(data), len(nb), 0,
        )
        out += local + nb + comp
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 20, 20, 0, method, 0, 0,
            crc, len(comp), len(data), len(nb), 0, 0, 0, 0, 0, off,
        )
        central += nb
    cd_off = len(out)
    out += central
    out += struct.pack(
        "<IHHHHIIH",
        0x06054B50, 0, 0, len(files), len(files),
        len(central), cd_off, 0,
    )
    return bytes(out)


def _find_eocd(data: bytes) -> int:
    """Backward scan for a SELF-CONSISTENT EOCD: offset + 22 +
    comment_len == file length. A STORED payload can never hold the
    magic past the real EOCD, but an archive COMMENT can — a bare
    rfind would pick bytes inside the comment and reject a valid
    archive (review fix). The scan window is bounded by the max
    comment length (0xFFFF)."""
    lo = max(0, len(data) - 22 - 0xFFFF)
    pos = data.rfind(b"PK\x05\x06", lo)
    while pos >= 0:
        if pos + 22 <= len(data):
            (cmt,) = struct.unpack_from("<H", data, pos + 20)
            if pos + 22 + cmt == len(data):
                return pos
        pos = data.rfind(b"PK\x05\x06", lo, pos)
    return -1


def parse_zip(data: bytes) -> List[Tuple[str, bytes]]:
    """zip bytes → [(name, bytes)], central-directory driven, CRC-32
    verified. ValueError on corruption or unsupported compression."""
    eocd = _find_eocd(data)
    if eocd < 0:
        raise ValueError("zip end-of-central-directory not found")
    (_sig, _dn, _cdn, _n_here, n_total, cd_size, cd_off, _cmt) = (
        struct.unpack_from("<IHHHHIIH", data, eocd)
    )
    if n_total > _MAX_MEMBERS:
        raise ValueError("hostile zip member count")
    out: List[Tuple[str, bytes]] = []
    i = cd_off
    for _ in range(n_total):
        if i + 46 > len(data) or data[i : i + 4] != b"PK\x01\x02":
            raise ValueError("bad zip central-directory entry")
        (
            _sig, _vmade, _vneed, _flags, method, _t, _d,
            crc, csize, usize, nlen, elen, clen,
            _disk, _iattr, _eattr, lho,
        ) = struct.unpack_from("<IHHHHHHIIIHHHHHII", data, i)
        name = data[i + 46 : i + 46 + nlen].decode("utf-8", "replace")
        i += 46 + nlen + elen + clen
        if usize > _MAX_MEMBER:
            raise ValueError("zip member exceeds decompressed cap")
        # local header: re-read name/extra lengths (they can differ)
        if lho + 30 > len(data) or data[lho : lho + 4] != b"PK\x03\x04":
            raise ValueError("bad zip local header offset")
        (lnlen, lelen) = struct.unpack_from("<HH", data, lho + 26)
        start = lho + 30 + lnlen + lelen
        comp = data[start : start + csize]
        if len(comp) != csize:
            raise ValueError("zip member data outruns file")
        if method == 0:
            raw = comp
        elif method == 8:
            try:
                d = zlib.decompressobj(-15)
                # usize is untrusted: cap the inflate at the claim + 1
                # so a lying header can't balloon memory
                raw = d.decompress(comp, usize + 1)
            except zlib.error as e:
                raise ValueError(f"bad zip deflate stream: {e}") from None
        else:
            raise ValueError(f"unsupported zip compression method {method}")
        if len(raw) != usize:
            raise ValueError("zip member size mismatch")
        if (zlib.crc32(raw) & 0xFFFFFFFF) != crc:
            raise ValueError("zip member CRC-32 mismatch")
        out.append((name, raw))
    return out
