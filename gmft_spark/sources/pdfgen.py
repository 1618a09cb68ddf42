"""Deterministic PDF *writer*: renders a synthetic page scene into real
PDF bytes.

This closes the loop on the north-rule payload shape: each transcript
turn carries an actual PDF byte-stream (generated here, deterministic per
``(conv_id, turn_idx)``), and the Spark pipeline *decodes it back* with
the from-scratch parser (``gmft_spark.sources.pdfparse``) before running
extraction — a real decode of a real document format, not a stubbed
expansion.

The writer emits minimal, uncompressed PDF 1.4: one page per scene, one
``BT … Tj … ET`` text object per word, a simple Type1 font with explicit
``/Widths`` (all 500/1000 em) plus a ``/FontDescriptor`` so the parser's
width-clamped fallback glyph boxes reproduce each word's envelope
exactly; per-word horizontal scaling (``Tz``) stretches the text run to
the scene's word-box width.

Round-trip contract (tested in tests/test_pdf_roundtrip.py):
``parse(scene_to_pdf(scene)).page_words(0)`` equals the scene's
``(word_boxes, word_texts)`` in order, to float precision.
"""

from __future__ import annotations

from typing import List

from gmft_spark.kernel.synth import SynthScene, synth_scene

_ASCENT = 1000.0  # font units; descent 0 → glyph box spans the baseline up
_HALF_EM = 0.5  # every code has /Widths 500 (em-1000)


def _esc(text: str) -> bytes:
    out = bytearray()
    for ch in text:
        b = ch.encode("latin-1", "replace")[0]
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out.append(0x5C)
        out.append(b)
    return bytes(out)


def _word_ops(
    x0: float, y0: float, x1: float, y1: float, text: str, page_h: float
) -> bytes:
    """One text object placing ``text`` so its glyph-box envelope equals
    the given top-left-origin word box."""
    h = max(y1 - y0, 0.1)
    w = max(x1 - x0, 0.1)
    fs = h  # ascent 1000/em → glyph box height == font size
    baseline = page_h - y1  # descent 0 → box bottom sits on the baseline
    natural = _HALF_EM * fs * max(len(text), 1)
    tz = 100.0 * w / natural
    return b"BT /F1 %.6f Tf %.6f Tz %.6f %.6f Td (%b) Tj ET\n" % (
        fs,
        tz,
        x0,
        baseline,
        _esc(text),
    )


def scene_to_pdf(scene: SynthScene) -> bytes:
    """Render the scene's words into a single-page uncompressed PDF."""
    return scenes_to_pdf([scene])


def scenes_to_pdf(scenes: List[SynthScene]) -> bytes:
    """Render N scenes as one N-page PDF (one Page + Contents pair per
    scene, shared font objects). Object numbering keeps the historical
    single-page layout for N=1 (Catalog 1, Pages 2, Page 3, Contents 4,
    Font, Descriptor), so ``scenes_to_pdf([s]) == scene_to_pdf(s)``
    byte-for-byte — pinned in tests/test_conversation_pdf.py."""
    n = len(scenes)
    font_id = 3 + 2 * n
    desc_id = font_id + 1
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n))

    objects: List[bytes] = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n))
    for i, scene in enumerate(scenes):
        content = bytearray()
        for (x0, y0, x1, y1), text in zip(
            scene.word_boxes.tolist(), scene.word_texts
        ):
            content += _word_ops(x0, y0, x1, y1, text, scene.page_height)
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.2f %.2f] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (scene.page_width, scene.page_height, font_id, 4 + 2 * i)
        )
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
    widths = b" ".join(b"500" for _ in range(32, 127))
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /SynthMono "
        b"/FirstChar 32 /LastChar 126 /Widths [%s] "
        b"/FontDescriptor %d 0 R >>" % (widths, desc_id)
    )
    objects.append(
        b"<< /Type /FontDescriptor /FontName /SynthMono /Flags 32 "
        b"/FontBBox [0 0 500 1000] /Ascent 1000 /Descent 0 "
        b"/ItalicAngle 0 /CapHeight 700 /StemV 80 >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)


def turn_pdf(conv_id: str, turn_idx: int) -> bytes:
    """The deterministic per-turn PDF payload."""
    return scene_to_pdf(synth_scene(conv_id, turn_idx))


def conversation_pdf(conv_id: str, turn_idxs: List[int]) -> bytes:
    """One multi-page PDF per conversation — page ``i`` is turn
    ``turn_idxs[i]``'s scene (the reference's actual document shape:
    BasePDFDocument = ordered page collection, S1/S2)."""
    return scenes_to_pdf([synth_scene(conv_id, t) for t in turn_idxs])
