"""From-scratch tar/zip container kernel (kernel/archives.py):
writer-twin roundtrips (plain/gz tar; stored/deflate zip; long ustar
names), central-directory-driven zip reads, and the untrusted-input
containment contract."""

import struct
import zlib

import pytest

from gmft_spark.kernel.archives import (
    build_tar,
    build_zip,
    parse_tar,
    parse_zip,
)


def _files(n=6):
    return [
        (f"dir{i % 2}/file{i}.txt", (f"body {i} " * (i + 1)).encode())
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_tar_roundtrip(gz):
    files = _files()
    out = parse_tar(build_tar(files, gz=gz))
    assert out == files


def test_tar_long_name_prefix_split():
    name = "deeply/" * 20 + "leaf.txt"  # > 100 bytes, splittable
    files = [(name, b"x" * 700)]
    assert parse_tar(build_tar(files)) == files
    with pytest.raises(ValueError):
        build_tar([("x" * 200, b"")])  # no slash to split at


@pytest.mark.parametrize("compress", [False, True])
def test_zip_roundtrip(compress):
    files = _files() + [("empty.bin", b""), ("binary", bytes(range(256)))]
    out = parse_zip(build_zip(files, compress=compress))
    assert out == files


def test_zip_incompressible_falls_back_to_stored():
    noise = bytes((i * 131 + 17) % 256 for i in range(4096))
    data = build_zip([("n.bin", zlib.compress(noise))])
    # roundtrip regardless of method choice
    assert parse_zip(data)[0][1] == zlib.compress(noise)


def test_zip_reader_is_central_directory_driven():
    # garbage prefix before the first local header: the CD offsets
    # still resolve because EOCD/CD carry absolute offsets... a SFX
    # stub shifts offsets, so instead verify trailing-comment-free
    # random junk INSIDE a stored member doesn't confuse the reader
    tricky = b"PK\x05\x06" + b"fake eocd bytes"
    files = [("a.txt", tricky), ("b.txt", b"ok")]
    assert parse_zip(build_zip(files, compress=False)) == files


def test_containment():
    good_tar = build_tar(_files())
    bad = bytearray(good_tar)
    bad[10] ^= 0x01  # corrupt a header field → checksum mismatch
    with pytest.raises(ValueError):
        parse_tar(bytes(bad))
    with pytest.raises(ValueError):
        parse_tar(b"\x1f\x8b\x08not-gzip")
    truncated = good_tar[: 512 + 3]  # cut inside member 0's 7 bytes
    with pytest.raises(ValueError):
        parse_tar(truncated)

    good_zip = build_zip(_files())
    with pytest.raises(ValueError):
        parse_zip(b"no eocd here")
    flip = bytearray(good_zip)
    # flip a byte inside the first member's compressed data (30-byte
    # local header + 14-byte name + 2) → deflate/CRC failure
    flip[46] ^= 0x10
    with pytest.raises(ValueError):
        parse_zip(bytes(flip))
    # lying usize: claim a tiny size for a big member
    lie = bytearray(good_zip)
    eocd = bytes(lie).rfind(b"PK\x05\x06")
    (cd_off,) = struct.unpack_from("<I", lie, eocd + 16)
    struct.pack_into("<I", lie, cd_off + 24, 1)  # usize := 1
    with pytest.raises(ValueError):
        parse_zip(bytes(lie))


def test_tar_oversize_member_raises_not_corrupts():
    from gmft_spark.kernel.archives import _tar_header

    # 8 GiB would overflow the 11-digit octal field and silently GROW
    # the 512-byte header (review fix)
    assert len(_tar_header("x", 8 ** 11 - 1)) == 512
    with pytest.raises(ValueError):
        _tar_header("x", 8 ** 11)


def test_zip_comment_containing_eocd_magic_parses():
    # an archive COMMENT containing the EOCD magic sits AFTER the real
    # EOCD; a bare rfind would lock onto it and reject a valid archive.
    # The reader must scan backwards for the self-consistent record
    # (offset + 22 + comment_len == file length) — review fix.
    files = _files(3)
    good = bytearray(build_zip(files))
    comment = b"see PK\x05\x06 spec \x00\x00\x00\x00 for details"
    eocd = bytes(good).rfind(b"PK\x05\x06")
    struct.pack_into("<H", good, eocd + 20, len(comment))
    assert parse_zip(bytes(good) + comment) == files
    # trailing junk NOT declared by the comment length: no record in
    # the file is self-consistent → fails closed, never silently picks
    # a magic that disagrees with the file length
    struct.pack_into("<H", good, eocd + 20, 0)
    with pytest.raises(ValueError):
        parse_zip(bytes(good) + b"junk!")
    assert parse_zip(bytes(good)) == files


def test_zip_limits_raise_named_errors():
    with pytest.raises(ValueError, match="zip64"):
        build_zip([(f"f{i}", b"") for i in range(65536)], compress=False)


def test_zip_truncated_structures_raise_valueerror():
    # truncated central-directory entry (review fix: leaked struct.error)
    fake = (
        b"PK\x01\x02" + b"\x00" * 8
        + struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, 12, 0, 0)
    )
    with pytest.raises(ValueError):
        parse_zip(fake)
    # local-header offset pointing at EOF
    good = build_zip(_files(1))
    eocd = good.rfind(b"PK\x05\x06")
    (cd_off,) = struct.unpack_from("<I", good, eocd + 16)
    bad = bytearray(good)
    struct.pack_into("<I", bad, cd_off + 42, len(good) - 2)  # lho → EOF
    with pytest.raises(ValueError):
        parse_zip(bytes(bad))
