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


def test_tar_pax_long_name_roundtrip():
    # a slash-free 200-char name has no ustar prefix split: round 5
    # routes it through a pax 'x' header with a path= record (the GNU
    # tar --format=posix layout)
    files = [("x" * 200, b"body"), ("short.txt", b"s")]
    data = build_tar(files)
    assert parse_tar(data) == files
    # independent oracle: stdlib tarfile reads the same members
    import io
    import tarfile

    with tarfile.open(fileobj=io.BytesIO(data)) as t:
        got = [
            (m.name, t.extractfile(m).read())
            for m in t.getmembers()
            if m.isfile()
        ]
    assert got == files


def test_tar_gnu_longname_header_parses():
    # hand-built GNU 'L' member (our writer emits pax; real tarballs
    # from gnu tar default format carry 'L')
    from gmft_spark.kernel.archives import _tar_header

    long_name = "gnu/" + "n" * 150
    nb = long_name.encode() + b"\x00"
    out = bytearray()
    out += _tar_header("././@LongLink", len(nb), b"L")
    out += nb + b"\x00" * ((-len(nb)) % 512)
    out += _tar_header("truncated_name", 5)
    out += b"hello" + b"\x00" * 507
    out += b"\x00" * 1024
    assert parse_tar(bytes(out)) == [(long_name, b"hello")]


def test_tar_pax_size_overrides_octal_field():
    # pax size= is authoritative when the octal field can't hold the
    # value (the >= 8 GiB member path) — hand-built with a small body
    # so the suite doesn't allocate gigabytes
    from gmft_spark.kernel.archives import _pax_record, _tar_header

    body = b"the real body bytes"
    pax = _pax_record("size", str(len(body)))
    out = bytearray()
    out += _tar_header("PaxHeaders.0/big.bin", len(pax), b"x")
    out += pax + b"\x00" * ((-len(pax)) % 512)
    out += _tar_header("big.bin", 0)  # octal field zeroed
    out += body + b"\x00" * ((-len(body)) % 512)
    out += b"\x00" * 1024
    assert parse_tar(bytes(out)) == [("big.bin", body)]
    # stdlib tarfile agrees on the same bytes
    import io
    import tarfile

    with tarfile.open(fileobj=io.BytesIO(bytes(out))) as t:
        m = t.getmembers()[0]
        assert (m.name, t.extractfile(m).read()) == ("big.bin", body)


def test_tar_over_8gib_member_roundtrip():
    # the real thing once: a member past the 11-digit octal limit
    # travels via the writer's pax size record and comes back intact
    big = bytes(8 * (1 << 30) + 512)  # 8 GiB + one block
    files = [("huge.bin", big), ("tail.txt", b"after")]
    data = build_tar(files)
    out = parse_tar(data)
    assert [n for n, _ in out] == ["huge.bin", "tail.txt"]
    assert len(out[0][1]) == len(big) and out[0][1] == big
    assert out[1][1] == b"after"


def test_tar_reads_stdlib_pax_and_gnu_formats():
    # real-world evidence: tarballs WRITTEN by stdlib tarfile in both
    # PAX_FORMAT (pax 'x' path records) and GNU_FORMAT ('L' longname
    # members) parse member-identical through our reader
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT) as t:
        name = "no-slash-" + "q" * 160
        data = b"payload from stdlib pax writer"
        info = tarfile.TarInfo(name)
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    assert parse_tar(buf.getvalue()) == [(name, data)]

    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w", format=tarfile.GNU_FORMAT) as t:
        info = tarfile.TarInfo("gnu-" + "z" * 180)
        info.size = 4
        t.addfile(info, io.BytesIO(b"abcd"))
    assert parse_tar(buf2.getvalue()) == [("gnu-" + "z" * 180, b"abcd")]


def test_tar_bad_pax_framing_raises():
    from gmft_spark.kernel.archives import _tar_header

    bad = b"999 path=x\n"  # length claims far past the body
    out = bytearray()
    out += _tar_header("PaxHeaders.0/x", len(bad), b"x")
    out += bad + b"\x00" * ((-len(bad)) % 512)
    out += _tar_header("x", 0)
    out += b"\x00" * 1024
    with pytest.raises(ValueError):
        parse_tar(bytes(out))


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


def test_zip64_forced_structures_roundtrip():
    # force_zip64 emits the full 64-bit layout (0x0001 extras, zip64
    # EOCD record + locator, saturated 32-bit fields) without needing
    # 4 GiB of payload — exercises the reader's zip64 resolution path
    files = _files(4)
    data = build_zip(files, force_zip64=True)
    assert b"PK\x06\x06" in data and b"PK\x06\x07" in data
    assert struct.pack("<I", 0xFFFFFFFF) in data  # saturated fields
    assert parse_zip(data) == files
    # independent oracle: the stdlib reader agrees member-for-member
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        assert [(n, z.read(n)) for n in z.namelist()] == files


def test_zip64_member_count_roundtrip():
    # > 65535 members forces zip64 counts (the 16-bit EOCD count
    # saturates); every member must still resolve
    files = [(f"d/{i}.txt", str(i).encode()) for i in range(70_000)]
    out = parse_zip(build_zip(files, compress=False))
    assert out == files


def test_zip64_large_offset_central_directory():
    # the real-user wall: a bulk crawl archive past 4 GiB, so local
    # header offsets and the central-directory offset exceed 32 bits.
    # 9 stored members x 512 MiB of zeros put the last member and the
    # CD beyond 4 GiB; zip64 extras must carry the 64-bit offsets.
    big = bytes(512 << 20)
    files = [(f"part{i}.bin", big) for i in range(9)] + [
        ("tail.txt", b"after the 4 GiB line")
    ]
    data = build_zip(files, compress=False)
    assert len(data) > (1 << 32)
    out = parse_zip(data)
    assert [n for n, _ in out] == [n for n, _ in files]
    assert out[-1][1] == b"after the 4 GiB line"
    assert all(body == big for _n, body in out[:-1])


def test_zipcrypto_roundtrip_and_failure_modes():
    files = _files(4) + [("bin", bytes(range(256)))]
    for compress in (False, True):
        data = build_zip(files, compress=compress, password="s3cret")
        assert parse_zip(data, password="s3cret") == files
        with pytest.raises(ValueError, match="password-protected"):
            parse_zip(data)
        with pytest.raises(ValueError, match="wrong zip password"):
            parse_zip(data, password="wrong")
    # truncated encryption header (< 12 bytes of member data)
    data = bytearray(build_zip([("x", b"hello")], password="p"))
    eocd = bytes(data).rfind(b"PK\x05\x06")
    (cd_off,) = struct.unpack_from("<I", data, eocd + 16)
    struct.pack_into("<I", data, cd_off + 20, 5)  # csize := 5 < 12
    with pytest.raises(ValueError):
        parse_zip(bytes(data), password="p")


def test_zipcrypto_stdlib_decrypts_our_writer():
    # independent oracle: Python's zipfile implements the same PKWARE
    # stream cipher for reads — our encrypted writer output must
    # decrypt there byte-for-byte (catches key-schedule drift the
    # roundtrip alone cannot: a mirrored bug cancels out)
    import io
    import zipfile

    files = _files(3)
    data = build_zip(files, password="tr4d1t10nal")
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        z.setpassword(b"tr4d1t10nal")
        assert [(n, z.read(n)) for n in z.namelist()] == files


def test_encrypted_zip_ingest_password_plumbing(spark):
    # operator surface: an encrypted crawl archive decodes when the
    # password is plumbed through, and fails CLOSED as one contained
    # error row (not a crash, not silent emptiness) without it
    from gmft_spark.operators.webcorpus import extract_archive_documents

    z = build_zip(
        [
            ("site/page.html", b"<html><title>t</title><body><p>"
             b"alpha beta gamma delta content here</p></body></html>"),
            ("notes/readme.txt", b"plain text body"),
        ],
        password="crawl-pw",
    )
    frame = spark.createDataFrame([("a1", bytearray(z))], "aid string, payload binary")
    ok = extract_archive_documents(
        frame, src_col="aid", zip_password="crawl-pw"
    ).toPandas()
    assert sorted(ok["name"]) == ["notes/readme.txt", "site/page.html"]
    assert set(ok["status"]) == {"ok"}
    assert "plain text body" in set(ok["main_text"])
    locked = extract_archive_documents(frame, src_col="aid").toPandas()
    assert len(locked) == 1
    assert locked["status"][0] == "error: password-protected zip member"


def test_zip64_hostile_truncations_raise():
    good = build_zip(_files(2), force_zip64=True)
    # locator pointing outside the file
    bad = bytearray(good)
    loc = bytes(bad).rfind(b"PK\x06\x07")
    struct.pack_into("<Q", bad, loc + 8, len(good))  # z64 off → EOF
    with pytest.raises(ValueError):
        parse_zip(bytes(bad))
    # zip64 extra shorter than its saturated fields claim
    bad2 = bytearray(good)
    cd = bytes(bad2).rfind(b"PK\x01\x02")
    (nlen, elen) = struct.unpack_from("<HH", bad2, cd + 28)
    assert elen >= 4
    # rewrite the extra's own header to claim 0 payload bytes: the
    # saturated usize then has nothing to resolve from
    struct.pack_into("<HH", bad2, cd + 46 + nlen, 1, 0)
    with pytest.raises(ValueError, match="short zip64 extra"):
        parse_zip(bytes(bad2))


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


def test_zip_aes_ae2_roundtrip_and_containment():
    # WinZip AE-2 (method 99 + 0x9901 extra): PBKDF2 -> AES-CTR with
    # password verifier and HMAC-SHA1 authenticator, both enforced
    files = _files(4) + [("bin", bytes(range(256)))]
    for compress in (False, True):
        data = build_zip(files, compress=compress, password="s3", aes=True)
        assert parse_zip(data, password="s3") == files
        with pytest.raises(ValueError, match="password-protected"):
            parse_zip(data)
        with pytest.raises(ValueError, match="wrong zip password"):
            parse_zip(data, password="nope")
    # authenticate-then-decrypt: a flipped ciphertext byte fails the
    # HMAC (never reaches inflate/CRC)
    data = bytearray(build_zip([("x.txt", b"secret body")],
                               password="s3", aes=True))
    # 30-byte local header + 5 name + 11 extra + 16 salt + 2 verifier
    data[30 + 5 + 11 + 16 + 2] ^= 0x40
    with pytest.raises(ValueError, match="authentication"):
        parse_zip(bytes(data), password="s3")
    # truncated member (shorter than salt+verifier+mac) fails closed
    short = bytearray(build_zip([("y", b"z")], password="s3", aes=True))
    eocd = bytes(short).rfind(b"PK\x05\x06")
    (cd_off,) = struct.unpack_from("<I", short, eocd + 16)
    struct.pack_into("<I", short, cd_off + 20, 20)  # csize := 20 < 28
    with pytest.raises(ValueError):
        parse_zip(bytes(short), password="s3")


def test_zip_aes_operator_password_plumbing(spark):
    # the SAME zip_password parameter drives AE-2 members through the
    # archive-ingest operator (parse_zip routes by method)
    from gmft_spark.operators.webcorpus import extract_archive_documents

    z = build_zip(
        [("doc/readme.txt", b"aes protected corpus text")],
        password="corp", aes=True,
    )
    frame = spark.createDataFrame(
        [("a1", bytearray(z))], "aid string, payload binary"
    )
    ok = extract_archive_documents(
        frame, src_col="aid", zip_password="corp"
    ).toPandas()
    assert list(ok["status"]) == ["ok"]
    assert ok["main_text"][0] == "aes protected corpus text"
    locked = extract_archive_documents(frame, src_col="aid").toPandas()
    assert locked["status"][0] == "error: password-protected zip member"
