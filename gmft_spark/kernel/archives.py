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

Round 5 closed the two archive seams:

* zip64 (PKWARE APPNOTE 4.5): the reader follows the zip64
  end-of-central-directory locator/record and the 0x0001 extra field
  (saturated 0xFFFF/0xFFFFFFFF fields resolve to their 64-bit
  values), so >4 GiB offsets and >65535 members parse; the writer
  emits zip64 structures exactly when a field saturates (or when
  ``force_zip64`` is set, for parser tests that should not allocate
  4 GiB). Real crawl bulk archives exceed 4 GiB routinely — this was
  the first real-user wall in the archive front door.
* ZipCrypto (traditional PKWARE stream cipher, APPNOTE 6.1): members
  with general-purpose flag bit 0 decrypt when a password is given
  (12-byte encryption header, check byte vs CRC high byte — or the
  DOS-time high byte under flag bit 3), fail closed as ValueError
  ("password-protected zip member") without one, and fail closed on
  a wrong password. The writer twin encrypts with a deterministic
  encryption header (derived from name+CRC — determinism over
  entropy is fine here: ZipCrypto is historically weak regardless
  and the writer exists as the roundtrip twin, not as protection).

Round 5 also added the pax / GNU tar extensions real corpora hit:
the reader honors POSIX.1-2001 pax extended headers ('x' per-file and
'g' global records — ``path`` long names and ``size`` for >= 8 GiB
members whose octal field cannot hold the value) and GNU 'L'
longname / 'K' longlink members; the writer emits pax records (the
GNU tar --format=posix layout) whenever a plain ustar header cannot
express a member, and stdlib tarfile cross-reads its output.

* WinZip AES (AE-2, extra field 0x9901, late round 5): method-99
  members decrypt via PBKDF2-HMAC-SHA1 → AES-CTR (the from-scratch
  FIPS-197 cipher in sources/pdfparse/crypt.py, vectorized counter
  keystream) with the 2-byte password verifier and the 10-byte
  HMAC-SHA1 authenticator both enforced (authenticate-then-decrypt;
  tampered ciphertext fails closed). The writer twin emits AE-2 at
  strength 3 (AES-256) under ``build_zip(..., aes=True)``.

Still out of scope: multi-disk zip archives (disk numbers other than
0 raise) and GNU sparse files.
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


def _tar_header(
    name: str, size: int, typeflag: bytes = b"0"
) -> bytes:
    if size >= 8 ** 11:
        # 11 octal digits is the ustar limit; a longer string would
        # silently GROW the 512-byte header via slice assignment and
        # corrupt every following offset. build_tar routes oversized
        # members through a pax 'size=' record instead of here.
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
    hdr[156] = typeflag[0]
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[345 : 345 + len(prefix)] = prefix
    chk = sum(hdr)
    hdr[148:156] = (b"%06o" % chk) + b"\x00 "
    return bytes(hdr)


def _pax_record(key: str, value: str) -> bytes:
    """One pax extended-header record: '<len> <key>=<value>\\n' where
    len counts the WHOLE record including its own decimal digits
    (fixed-point iteration handles the 9→10, 99→100 … boundaries)."""
    body = f" {key}={value}\n".encode("utf-8")
    total = len(body)
    while len(str(total)) + len(body) != total:
        total = len(str(total)) + len(body)
    return str(total).encode("ascii") + body


def _ustar_name_fits(name: str) -> bool:
    nb = name.encode("utf-8")
    if len(nb) <= 100:
        return True
    cut = nb.find(b"/", max(0, len(nb) - 101))
    return not (cut <= 0 or len(nb) - cut - 1 > 100 or cut > 155)


def build_tar(files: List[Tuple[str, bytes]], gz: bool = False) -> bytes:
    """(name, bytes) members → ustar archive (optionally gzip-wrapped).

    Round 5: members a plain ustar header cannot express get a POSIX
    pax extended header ('x' typeflag) carrying ``path=`` (names with
    no usable prefix split) and/or ``size=`` (>= 8 GiB members; the
    12-digit octal size field then holds 0 and the pax record is
    authoritative) — the layout GNU tar --format=posix emits."""
    out = bytearray()
    for name, data in files:
        pax = b""
        hdr_name, hdr_size = name, len(data)
        if not _ustar_name_fits(name):
            pax += _pax_record("path", name)
            hdr_name = "pax_member"  # placeholder, the pax path wins
        if len(data) >= 8 ** 11:
            pax += _pax_record("size", str(len(data)))
            hdr_size = 0
        if pax:
            out += _tar_header(
                "PaxHeaders.0/" + hdr_name[:80], len(pax), b"x"
            )
            out += pax + b"\x00" * ((-len(pax)) % 512)
        out += _tar_header(hdr_name, hdr_size)
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
    # pax/GNU long-name state (round 5): overrides apply to the NEXT
    # regular member, per POSIX.1-2001 / GNU tar semantics
    pend_name: "str | None" = None  # GNU 'L' longname
    pend_pax: dict = {}  # pax 'x' per-file records
    global_pax: dict = {}  # pax 'g' defaults
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
        if typeflag in (b"0", b"\x00"):
            # pax size= overrides the (possibly zeroed) octal field —
            # the >= 8 GiB member path
            sz_over = pend_pax.get("size", global_pax.get("size"))
            if sz_over is not None:
                try:
                    size = int(sz_over)
                except ValueError:
                    raise ValueError("bad pax size record") from None
                if size < 0:
                    raise ValueError("bad pax size record")
        if i + size > n:
            raise ValueError("tar member outruns archive")
        body = data[i : i + size]
        if typeflag == b"L":  # GNU longname: body names the next member
            pend_name = body.rstrip(b"\x00").decode("utf-8", "replace")
        elif typeflag == b"K":  # GNU longlink: next member's link target
            pass  # links are skipped anyway
        elif typeflag == b"x":
            pend_pax = _parse_pax(body)
        elif typeflag == b"g":
            global_pax.update(_parse_pax(body))
        elif typeflag in (b"0", b"\x00"):
            # name precedence: per-file pax path > GNU longname >
            # global pax path > the (possibly prefix-split) header name
            if "path" in pend_pax:
                eff_name = pend_pax["path"]
            elif pend_name is not None:
                eff_name = pend_name
            else:
                eff_name = global_pax.get("path", name)
            out.append((eff_name, body))
            if len(out) > _MAX_MEMBERS:
                raise ValueError("hostile tar member count")
            pend_name = None
            pend_pax = {}
        else:
            # directories/links: size skipped by their declared size
            pend_name = None
            pend_pax = {}
        i += size + ((-size) % 512)
    return out


def _parse_pax(body: bytes) -> dict:
    """pax extended-header records: '<len> <key>=<value>\\n', len
    counting the whole record. ValueError on malformed framing."""
    recs: dict = {}
    i = 0
    n = len(body)
    while i < n:
        sp = body.find(b" ", i)
        if sp < 0:
            if body[i:].strip(b"\x00") == b"":
                break  # block padding
            raise ValueError("bad pax record framing")
        try:
            rlen = int(body[i:sp])
        except ValueError:
            raise ValueError("bad pax record length") from None
        if rlen <= sp - i or i + rlen > n or body[i + rlen - 1 : i + rlen] != b"\n":
            raise ValueError("bad pax record length")
        kv = body[sp + 1 : i + rlen - 1]
        k, eq, v = kv.partition(b"=")
        if not eq:
            raise ValueError("bad pax record (no '=')")
        recs[k.decode("utf-8", "replace")] = v.decode("utf-8", "replace")
        i += rlen
    return recs


# ── zip ─────────────────────────────────────────────────────────────

# Standard CRC-32 table (reflected polynomial 0xEDB88320) — the
# ZipCrypto key schedule needs single-byte CRC steps that zlib's
# buffer-level API doesn't expose.
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)
del _i, _c


class _ZipCrypto:
    """Traditional PKWARE stream cipher (APPNOTE 6.1) — byte-serial by
    construction (the key schedule consumes each plaintext byte), so
    it cannot be vectorized; members are small next to archives and
    the whole parse already runs inside an executor-side narrow map."""

    __slots__ = ("k0", "k1", "k2")

    def __init__(self, password: bytes):
        self.k0, self.k1, self.k2 = 0x12345678, 0x23456789, 0x34567890
        for c in password:
            self._update(c)

    def _update(self, c: int) -> None:
        t = _CRC_TABLE
        self.k0 = (self.k0 >> 8) ^ t[(self.k0 ^ c) & 0xFF]
        self.k1 = (self.k1 + (self.k0 & 0xFF)) & 0xFFFFFFFF
        self.k1 = (self.k1 * 134775813 + 1) & 0xFFFFFFFF
        self.k2 = (self.k2 >> 8) ^ t[(self.k2 ^ (self.k1 >> 24)) & 0xFF]

    def _stream_byte(self) -> int:
        t = (self.k2 | 2) & 0xFFFF
        return ((t * (t ^ 1)) >> 8) & 0xFF

    def decrypt(self, data: bytes) -> bytes:
        out = bytearray(len(data))
        for i, b in enumerate(data):
            c = b ^ self._stream_byte()
            self._update(c)
            out[i] = c
        return bytes(out)

    def encrypt(self, data: bytes) -> bytes:
        out = bytearray(len(data))
        for i, c in enumerate(data):
            out[i] = c ^ self._stream_byte()
            self._update(c)
        return bytes(out)


def _norm_password(password) -> bytes:
    return password.encode("utf-8") if isinstance(password, str) else password


# ── WinZip AES (AE-2, extra field 0x9901) ────────────────────────────
# Public spec: PBKDF2-HMAC-SHA1 (1000 iterations) over a per-member
# salt derives enc key + auth key + a 2-byte password verifier;
# payload = salt | verifier | AES-CTR ciphertext (little-endian block
# counter from 1, no nonce — sources/pdfparse/crypt.aes_ctr, the
# from-scratch FIPS-197 cipher) | first 10 bytes of HMAC-SHA1 over the
# CIPHERTEXT. AE-2 zeroes the CRC field (the HMAC is the integrity
# check). Strengths: 1=128-bit (8-byte salt), 3=256-bit (16-byte salt).

_AES_SALT_LEN = {1: 8, 2: 12, 3: 16}
_AES_KEY_LEN = {1: 16, 2: 24, 3: 32}


def _aes_keys(pw: bytes, salt: bytes, strength: int):
    import hashlib as _hl

    klen = _AES_KEY_LEN[strength]
    dk = _hl.pbkdf2_hmac("sha1", pw, salt, 1000, dklen=2 * klen + 2)
    return dk[:klen], dk[klen : 2 * klen], dk[2 * klen :]


def _parse_ae_extra(extra: bytes):
    """(vendor_version, strength, actual_method) from extra 0x9901."""
    i = 0
    while i + 4 <= len(extra):
        (hid, hsz) = struct.unpack_from("<HH", extra, i)
        i += 4
        if hid == 0x9901 and hsz >= 7:
            (ver, vend, strength, method) = struct.unpack_from(
                "<HHBH", extra, i
            )
            if vend != 0x4541:  # 'AE' little-endian
                raise ValueError("bad AE-x vendor id")
            if strength not in _AES_SALT_LEN:
                raise ValueError("bad AE-x strength")
            return ver, strength, method
        i += hsz
    raise ValueError("AES zip member without 0x9901 extra")


_FFFF = 0xFFFF
_FFFFFFFF = 0xFFFFFFFF


def build_zip(
    files: List[Tuple[str, bytes]],
    compress: bool = True,
    password: "str | bytes | None" = None,
    force_zip64: bool = False,
    aes: bool = False,
) -> bytes:
    """(name, bytes) members → zip archive (DEFLATE when it pays and
    ``compress`` is set, STORED otherwise). Deterministic: zeroed
    times, fixed version fields, and — when ``password`` is given —
    a deterministic ZipCrypto encryption header derived from the
    member name + CRC. zip64 structures (0x0001 extras, zip64 EOCD
    record + locator) are emitted exactly when a count/size/offset
    field saturates, or unconditionally under ``force_zip64`` (lets
    tests exercise the 64-bit parse path without 4 GiB of bytes)."""
    pw = _norm_password(password) if password is not None else None
    out = bytearray()
    central = bytearray()
    any_zip64 = force_zip64 or len(files) > _FFFF
    for name, data in files:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & _FFFFFFFF
        if compress:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = c.compress(data) + c.flush()
        else:
            comp = data
        method = 8 if compress and len(comp) < len(data) else 0
        if method == 0:
            comp = data
        flags = 0
        crc_out = crc
        ae_extra = b""
        if pw is not None and aes:
            import hashlib as _hl
            import hmac as _hmac

            from gmft_spark.sources.pdfparse.crypt import aes_ctr

            salt = _hl.md5(nb + struct.pack("<I", crc)).digest()  # 16B
            ek, ak, pv = _aes_keys(pw, salt, 3)
            payload = aes_ctr(ek, comp)
            mac = _hmac.new(ak, payload, _hl.sha1).digest()[:10]
            comp = salt + pv + payload + mac
            ae_extra = struct.pack(
                "<HHHHBH", 0x9901, 7, 2, 0x4541, 3, method
            )
            method = 99
            crc_out = 0  # AE-2: HMAC is the integrity check
            flags |= 1
        elif pw is not None:
            # deterministic 11-byte encryption header (see module
            # docstring); byte 12 must be the CRC high byte (the
            # password check byte the reader verifies)
            seed = zlib.crc32(nb, crc) & _FFFFFFFF
            hdr = bytearray(12)
            for i in range(11):
                seed = (seed * 1103515245 + 12345) & _FFFFFFFF
                hdr[i] = (seed >> 16) & 0xFF
            hdr[11] = crc >> 24
            comp = _ZipCrypto(pw).encrypt(bytes(hdr) + comp)
            flags |= 1
        off = len(out)
        need64 = (
            force_zip64
            or len(comp) >= _FFFFFFFF
            or len(data) >= _FFFFFFFF
            or off >= _FFFFFFFF
        )
        if need64:
            any_zip64 = True
            # local zip64 extra carries usize+csize; central extra
            # additionally carries the offset — every saturated field
            # appears in the extra in spec order (usize, csize, off)
            lextra = struct.pack("<HHQQ", 1, 16, len(data), len(comp))
            cextra = struct.pack(
                "<HHQQQ", 1, 24, len(data), len(comp), off
            )
            lcsize = lusize = _FFFFFFFF
            coff = _FFFFFFFF
            vneed = 45
        else:
            lextra = cextra = b""
            lcsize, lusize, coff = len(comp), len(data), off
            vneed = 20
        lextra += ae_extra
        cextra += ae_extra
        local = struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, vneed, flags, method, 0, 0,
            crc_out, lcsize, lusize, len(nb), len(lextra),
        )
        out += local + nb + lextra + comp
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, vneed, vneed, flags, method, 0, 0,
            crc_out, lcsize, lusize, len(nb), len(cextra), 0, 0, 0, 0,
            coff,
        )
        central += nb + cextra
    cd_off = len(out)
    out += central
    n = len(files)
    if any_zip64 or cd_off >= _FFFFFFFF:
        z64_off = len(out)
        out += struct.pack(
            "<IQHHIIQQQQ",
            0x06064B50, 44, 45, 45, 0, 0, n, n, len(central), cd_off,
        )
        out += struct.pack("<IIQI", 0x07064B50, 0, z64_off, 1)
        n_f = min(n, _FFFF)
        cd_off_f = min(cd_off, _FFFFFFFF)
    else:
        n_f, cd_off_f = n, cd_off
    out += struct.pack(
        "<IHHHHIIH",
        0x06054B50, 0, 0, n_f, n_f,
        min(len(central), _FFFFFFFF), cd_off_f, 0,
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


def _zip64_extra(
    extra: bytes, usize: int, csize: int, lho: int, disk: int
) -> Tuple[int, int, int, int]:
    """Resolve saturated central-directory fields from the 0x0001
    extra: 8-byte values appear for each field equal to its sentinel,
    in spec order (usize, csize, offset, disk — disk is 4 bytes)."""
    i = 0
    while i + 4 <= len(extra):
        (hid, hsz) = struct.unpack_from("<HH", extra, i)
        i += 4
        if i + hsz > len(extra):
            raise ValueError("bad zip extra field")
        if hid != 1:
            i += hsz
            continue
        j = i
        if usize == _FFFFFFFF:
            if j + 8 > i + hsz:
                raise ValueError("short zip64 extra")
            (usize,) = struct.unpack_from("<Q", extra, j)
            j += 8
        if csize == _FFFFFFFF:
            if j + 8 > i + hsz:
                raise ValueError("short zip64 extra")
            (csize,) = struct.unpack_from("<Q", extra, j)
            j += 8
        if lho == _FFFFFFFF:
            if j + 8 > i + hsz:
                raise ValueError("short zip64 extra")
            (lho,) = struct.unpack_from("<Q", extra, j)
            j += 8
        if disk == _FFFF:
            if j + 4 > i + hsz:
                raise ValueError("short zip64 extra")
            (disk,) = struct.unpack_from("<I", extra, j)
        return usize, csize, lho, disk
    return usize, csize, lho, disk


def parse_zip(
    data: bytes, password: "str | bytes | None" = None
) -> List[Tuple[str, bytes]]:
    """zip bytes → [(name, bytes)], central-directory driven, CRC-32
    verified. Follows zip64 EOCD locator/record + 0x0001 extras;
    decrypts ZipCrypto members when ``password`` is given (fails
    closed without one, and on a wrong one). ValueError on corruption
    or unsupported compression/encryption."""
    pw = _norm_password(password) if password is not None else None
    eocd = _find_eocd(data)
    if eocd < 0:
        raise ValueError("zip end-of-central-directory not found")
    (_sig, dn, cdn, _n_here, n_total, cd_size, cd_off, _cmt) = (
        struct.unpack_from("<IHHHHIIH", data, eocd)
    )
    # zip64: a locator record directly precedes the EOCD
    if eocd >= 20 and data[eocd - 20 : eocd - 16] == b"PK\x06\x07":
        (_lsig, ldisk, z64_off, ndisks) = struct.unpack_from(
            "<IIQI", data, eocd - 20
        )
        if ldisk != 0 or ndisks != 1:
            raise ValueError("multi-disk zip unsupported")
        if (
            z64_off + 56 > len(data)
            or data[z64_off : z64_off + 4] != b"PK\x06\x06"
        ):
            raise ValueError("bad zip64 EOCD record offset")
        (
            _zsig, _zsize, _vmade, _vneed, zdn, zcdn,
            _zn_here, n_total, cd_size, cd_off,
        ) = struct.unpack_from("<IQHHIIQQQQ", data, z64_off)
        if zdn != 0 or zcdn != 0:
            raise ValueError("multi-disk zip unsupported")
    elif dn != 0 or cdn != 0:
        raise ValueError("multi-disk zip unsupported")
    if n_total > _MAX_MEMBERS:
        raise ValueError("hostile zip member count")
    out: List[Tuple[str, bytes]] = []
    i = cd_off
    for _ in range(n_total):
        if i + 46 > len(data) or data[i : i + 4] != b"PK\x01\x02":
            raise ValueError("bad zip central-directory entry")
        (
            _sig, _vmade, _vneed, flags, method, mtime, _d,
            crc, csize, usize, nlen, elen, clen,
            disk, _iattr, _eattr, lho,
        ) = struct.unpack_from("<IHHHHHHIIIHHHHHII", data, i)
        name = data[i + 46 : i + 46 + nlen].decode("utf-8", "replace")
        extra = data[i + 46 + nlen : i + 46 + nlen + elen]
        i += 46 + nlen + elen + clen
        if _FFFFFFFF in (usize, csize, lho) or disk == _FFFF:
            usize, csize, lho, disk = _zip64_extra(
                extra, usize, csize, lho, disk
            )
        if disk != 0:
            raise ValueError("multi-disk zip unsupported")
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
        skip_crc = False
        if method == 99:  # WinZip AE-x (flag bit 0 belongs to it)
            if pw is None:
                raise ValueError("password-protected zip member")
            import hashlib as _hl
            import hmac as _hmac

            from gmft_spark.sources.pdfparse.crypt import aes_ctr

            ver, strength, method = _parse_ae_extra(extra)
            slen = _AES_SALT_LEN[strength]
            if len(comp) < slen + 2 + 10:
                raise ValueError("truncated AES zip member")
            salt = comp[:slen]
            verifier = comp[slen : slen + 2]
            mac = comp[-10:]
            payload = comp[slen + 2 : -10]
            ek, ak, pv = _aes_keys(pw, salt, strength)
            if verifier != pv:
                raise ValueError("wrong zip password")
            # authenticate the CIPHERTEXT before touching it
            if not _hmac.compare_digest(
                _hmac.new(ak, payload, _hl.sha1).digest()[:10], mac
            ):
                raise ValueError("zip AES authentication failed")
            comp = aes_ctr(ek, payload)
            skip_crc = ver == 2  # AE-2 zeroes the CRC field
        elif flags & 1:
            if pw is None:
                raise ValueError("password-protected zip member")
            if len(comp) < 12:
                raise ValueError("truncated zip encryption header")
            z = _ZipCrypto(pw)
            hdr = z.decrypt(comp[:12])
            # password check byte: CRC high byte, or the DOS-time high
            # byte when a data descriptor is in use (flag bit 3)
            want = (mtime >> 8) & 0xFF if flags & 8 else crc >> 24
            if hdr[11] != want:
                raise ValueError("wrong zip password")
            comp = z.decrypt(comp[12:])
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
        if not skip_crc and (zlib.crc32(raw) & 0xFFFFFFFF) != crc:
            raise ValueError("zip member CRC-32 mismatch")
        out.append((name, raw))
    return out
