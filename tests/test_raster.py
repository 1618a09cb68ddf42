"""Raster kernel tests: PNG codec round-trips (all five filters), the
render ink differential (numpy canvas vs the SQL per-word sum rule), D3
image ops, and the real PNG decode path through the multimodal operator."""

import numpy as np
import pytest

from gmft_spark.kernel.raster import (
    crop,
    decode_png,
    encode_png,
    ink_pixels,
    pad,
    render_words,
    resize_nearest,
    rotate90,
)
from gmft_spark.kernel.synth import synth_scene


def _rng(seed):
    return np.random.RandomState(seed)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [None, 3, 4])
def test_png_roundtrip(filter_type, channels):
    r = _rng(7 * (filter_type + 1) + (channels or 0))
    shape = (23, 17) if channels is None else (23, 17, channels)
    arr = r.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_png_roundtrip_degenerate_sizes():
    for shape in [(1, 1), (1, 40), (40, 1), (2, 2, 3)]:
        arr = (_rng(3).randint(0, 256, size=shape)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_bytes_are_deterministic():
    arr = (_rng(11).randint(0, 256, size=(16, 16))).astype(np.uint8)
    assert encode_png(arr) == encode_png(arr)


def test_render_ink_matches_clamped_area_sum():
    """The SQL oracle (scene_sql.PAGE_RENDER_SQL) sums per-word clamped
    pixel areas, which equals the canvas union only if scene word boxes
    never overlap at pixel resolution. Assert that equality over many
    scenes — the tripwire for both the rasterizer's coverage rule and
    the scene-geometry non-overlap assumption."""
    for i in range(60):
        scene = synth_scene(f"conv{i}", i % 7)
        arr = render_words(
            scene.word_boxes, scene.page_width, scene.page_height
        )
        w, h = arr.shape[1], arr.shape[0]
        total = 0
        for x0, y0, x1, y1 in scene.word_boxes:
            cw = min(int(np.ceil(x1)), w) - max(int(np.floor(x0)), 0)
            ch = min(int(np.ceil(y1)), h) - max(int(np.floor(y0)), 0)
            total += max(0, cw) * max(0, ch)
        assert ink_pixels(arr) == total, f"scene conv{i}"
        # and the PNG round-trip preserves the ink count exactly
        assert ink_pixels(decode_png(encode_png(arr))) == total


def test_render_scale():
    scene = synth_scene("sc", 0)
    half = render_words(
        scene.word_boxes, scene.page_width, scene.page_height, scale=0.5
    )
    assert half.shape == (396, 306)
    assert 0 < ink_pixels(half) < half.size


def test_crop_pad_resize_rotate():
    arr = np.full((20, 30), 255, dtype=np.uint8)
    arr[5:10, 8:14] = 0
    c = crop(arr, 8, 5, 14, 10)
    assert c.shape == (5, 6) and (c == 0).all()
    p = pad(c, 2)
    assert p.shape == (9, 10)
    assert (p[:2] == 255).all() and (p[2:-2, 2:-2] == 0).all()
    r = resize_nearest(arr, 10, 15)
    assert r.shape == (10, 15)
    assert ink_pixels(r) > 0
    rot = rotate90(arr, 1)
    assert rot.shape == (30, 20)
    assert ink_pixels(rot) == ink_pixels(arr)
    assert np.array_equal(rotate90(rot, -1), arr)


def test_real_png_decode_through_operator(spark):
    from gmft_spark.operators.multimodal import (
        extract_features,
        synthesize_png_media,
    )

    m = synthesize_png_media(spark, 8)
    feats = {r["media_id"]: r for r in extract_features(m, decode_mode="real").collect()}
    assert len(feats) == 8
    for r in feats.values():
        v = np.array(r["feature"])
        assert v.shape == (16,)
        # normalized intensity histogram
        assert abs(float(v.sum()) - 1.0) < 1e-5
    # deterministic
    feats2 = {r["media_id"]: r for r in extract_features(m, decode_mode="real").collect()}
    assert feats[3]["feature"] == feats2[3]["feature"]
    # the gradient differs per id, so features differ somewhere
    assert feats[0]["feature"] != feats[5]["feature"]


def test_render_pipeline_png_payloads(spark):
    from gmft_spark.operators.render import render_pages
    from gmft_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, "/root/testdata/sf0.001").limit(12)
    rows = render_pages(t).collect()
    assert len(rows) == 12
    for r in rows:
        arr = decode_png(bytes(r["png"]))
        assert arr.shape == (r["height"], r["width"]) == (792, 612)
        assert ink_pixels(arr) == r["n_ink_px"]


def test_crop_table_images(spark):
    """Reference CroppedTable.image parity shape: each detection yields a
    padded tile whose dims match the (clamped) bbox + 2*pad and whose ink
    is a subset of the page's."""
    from gmft_spark.operators.detect import detect_tables_in_rasters
    from gmft_spark.operators.render import crop_table_images, render_pages
    from gmft_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, "/root/testdata/sf0.001").limit(10)
    rendered = render_pages(t)
    dets = detect_tables_in_rasters(rendered)
    tiles = crop_table_images(rendered, dets, pad_px=10).collect()
    det_rows = {
        (r["conv_id"], r["turn_idx"], r["det_id"]): r for r in dets.collect()
    }
    assert len(tiles) == len(det_rows) > 0
    for r in tiles:
        d = det_rows[(r["conv_id"], r["turn_idx"], r["det_id"])]
        arr = decode_png(bytes(r["png"]))
        assert arr.shape == (r["height"], r["width"])
        # raster-detector boxes are integral pixel bounds inside the page
        assert r["width"] == int(d["x1"]) - int(d["x0"]) + 20
        assert r["height"] == int(d["y1"]) - int(d["y0"]) + 20
        assert ink_pixels(arr) == r["n_ink_px"] > 0
        # the pad border is blank
        assert (arr[:10] == 255).all() and (arr[:, :10] == 255).all()


def test_decode_rejects_hostile_payloads():
    """Untrusted-input containment: oversized dims and zlib bombs raise
    ValueError instead of allocating."""
    import struct
    import zlib

    from gmft_spark.kernel.raster import _chunk

    sig = b"\x89PNG\r\n\x1a\n"
    # 1M x 1M IHDR → pixel-cap rejection before any allocation
    ihdr = struct.pack(">IIBBBBB", 1_000_000, 1_000_000, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="too large"):
        decode_png(sig + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b""))
    # a 4x4 IHDR whose IDAT inflates to megabytes → bounded-inflate error
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)
    with pytest.raises(ValueError, match="inflates past|length mismatch"):
        decode_png(
            sig + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
        )


def test_decode_translates_all_corrupt_failures_to_valueerror():
    """PNG-signed payloads with garbage internals raise ValueError (not
    zlib.error/struct.error) so caller containment catches one type."""
    import struct

    from gmft_spark.kernel.raster import _chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    # garbage IDAT (not zlib)
    with pytest.raises(ValueError):
        decode_png(
            sig + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"\xff" * 32) + _chunk(b"IEND", b"")
        )
    # truncated IHDR payload
    with pytest.raises(ValueError):
        decode_png(sig + _chunk(b"IHDR", ihdr[:5]) + _chunk(b"IEND", b""))


def test_real_decode_contains_corrupt_png(spark):
    """A PNG-signed-but-corrupt image payload becomes an error feature row
    (null feature, 0 frames); valid payloads in the same batch decode."""
    from pyspark.sql import functions as F

    from gmft_spark.operators.multimodal import (
        extract_features,
        synthesize_png_media,
    )

    m = synthesize_png_media(spark, 4).withColumn(
        "payload",
        F.when(
            F.col("media_id") == 1,
            F.concat(F.substring("payload", 1, 16), F.encode(F.lit("junk"), "utf-8")),
        ).otherwise(F.col("payload")),
    )
    rows = {r["media_id"]: r for r in extract_features(m, decode_mode="real").collect()}
    assert rows[1]["feature"] is None and rows[1]["n_frames_sampled"] == 0
    assert rows[0]["feature"] is not None and rows[2]["feature"] is not None


def test_tile_structure_recognition(spark):
    """img2table-niche coverage: whitespace-projection structure from
    table IMAGES recovers the scene grid — exact row count (rows are
    separated by real blank bands) and every true column boundary lies
    near a recognized column divider (projection can oversplit inside a
    cell whose words happen to align, never undersplit)."""
    import json

    from gmft_spark.operators.detect import detect_tables_in_rasters
    from gmft_spark.operators.render import (
        crop_table_images,
        recognize_tile_structure,
        render_pages,
    )
    from gmft_spark.sources.transcripts import synthesize_transcripts

    PAD = 10
    t = synthesize_transcripts(spark, n_convs=10, turns_per_conv=2)
    rendered = render_pages(t)
    dets = detect_tables_in_rasters(rendered)
    tiles = crop_table_images(rendered, dets, pad_px=PAD)
    structs = {
        (r["conv_id"], r["turn_idx"], r["det_id"]): r
        for r in recognize_tile_structure(tiles).collect()
    }
    tile_pngs = {
        (r["conv_id"], r["turn_idx"], r["det_id"]): r["png"]
        for r in tiles.collect()
    }
    det_rows = {
        (r["conv_id"], r["turn_idx"], r["det_id"]): r for r in dets.collect()
    }
    checked_rows = checked_cols = 0
    for key, s in structs.items():
        conv_id, turn_idx, det_id = key
        d = det_rows[key]
        scene = synth_scene(conv_id, turn_idx)
        # match the detection to its scene table by bbox overlap
        tbl = max(
            scene.tables,
            key=lambda tb: -abs(tb.bbox[1] - d["y0"]) - abs(tb.bbox[3] - d["y1"]),
        )
        if tbl.angle == 90:
            continue  # rotated tables blur into one ink mass (documented)
        ox, oy = tbl.bbox[0], tbl.bbox[1]
        inside = [
            (x0, y0, x1, y1)
            for (x0, y0, x1, y1) in scene.word_boxes
            if ox <= (x0 + x1) / 2 <= tbl.bbox[2]
            and oy <= (y0 + y1) / 2 <= tbl.bbox[3]
        ]
        # expected rows: distinct word baselines inside the table
        expected_rows = {round((y0 - oy - 2.5) / 14.0) for (_, y0, _, _) in inside}
        assert s["n_rows"] == len(expected_rows), key
        checked_rows += 1
        # every true interior column edge lies INSIDE a blank projection
        # run (dividers are run midpoints; a run can be wide when a cell's
        # words end early, so edge-near-midpoint would be too strict)
        from gmft_spark.kernel.raster import decode_png, projection_gaps
        from gmft_spark.kernel.synth import _huni, _hint

        tile_png = tile_pngs[key]
        cgaps = projection_gaps(decode_png(bytes(tile_png)), axis=0)
        tile_x0 = int(d["x0"])  # crop origin used by crop_table_images
        tkey = f"{conv_id}|{turn_idx}|{tbl.table_id}"
        n_cols = _hint(f"{tkey}|nc", 2, 6)
        widths = [_huni(f"{tkey}|cw{c}", 55.0, 90.0) for c in range(n_cols)]
        edge = ox
        for w in widths[:-1]:
            edge += w
            tile_edge = edge - tile_x0 + PAD
            assert any(a - 1 <= tile_edge <= b + 1 for a, b in cgaps), (
                key,
                tile_edge,
                cgaps,
            )
            checked_cols += 1
        assert s["n_cols"] >= n_cols
        assert len(json.loads(s["col_dividers"])) == len(cgaps)
    assert checked_rows >= 10 and checked_cols >= 20


def test_decode_png_bitflip_fuzz():
    """Bit-flip fuzz (pdfparse hostile-input pattern): every mutation of a
    valid PNG either decodes or raises ValueError — no other exception
    type, no hang, no unbounded allocation."""
    import zlib

    r = _rng(99)
    arr = (r.randint(0, 256, size=(24, 18))).astype(np.uint8)
    base = bytearray(encode_png(arr))
    for trial in range(300):
        data = bytearray(base)
        for _ in range(r.randint(1, 4)):
            pos = r.randint(0, len(data))
            data[pos] ^= 1 << r.randint(0, 8)
        try:
            out = decode_png(bytes(data))
            assert out.dtype == np.uint8
        except ValueError:
            pass  # the only allowed failure mode


def test_decode_rejects_zero_dimension_bomb():
    """width=0 bypassed the pixel cap (0*huge=0) while the scanline count
    still drove the inflate — must be rejected outright."""
    import struct

    from gmft_spark.kernel.raster import _chunk

    sig = b"\x89PNG\r\n\x1a\n"
    for w, h in [(0, 0xFFFFFFFF), (0xFFFFFFFF, 0), (0, 0)]:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        with pytest.raises(ValueError):
            decode_png(sig + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b""))


def test_projection_gaps_rejects_multichannel():
    with pytest.raises(ValueError):
        from gmft_spark.kernel.raster import projection_gaps

        projection_gaps(np.zeros((4, 4, 3), dtype=np.uint8), axis=0)


def test_block_ahash_boundaries_and_bits():
    """Integer tile boundaries cover the whole canvas exactly (612 and
    792 are not multiples of 8), tile counts sum to the page ink, and a
    bit is set only strictly above the mean tile ink."""
    import numpy as np

    from gmft_spark.kernel.raster import block_ahash, ink_pixels

    arr = np.full((792, 612), 255, dtype=np.uint8)
    arr[0:100, 0:80] = 0  # one dark patch in the top-left tile region
    sums, bits = block_ahash(arr)
    assert sums.shape == (8, 8) and bits.shape == (8, 8)
    assert int(sums.sum()) == ink_pixels(arr) == 100 * 80
    assert bits.sum() >= 1 and bits[0, 0] == 1
    # uniform page -> zero ink -> no bit can be strictly above the mean
    z_sums, z_bits = block_ahash(np.full((792, 612), 255, dtype=np.uint8))
    assert int(z_sums.sum()) == 0 and int(z_bits.sum()) == 0
    # all-dark page: every tile equals the mean -> strictly-above = none
    d_sums, d_bits = block_ahash(np.zeros((792, 612), dtype=np.uint8))
    assert int(d_sums.sum()) == 792 * 612
    assert int(d_bits.sum()) == 0 or int(d_bits.sum()) < 64  # unequal tiles


def test_resize_bilinear_invariants():
    """Half-pixel-center bilinear: identity at same size, constants stay
    constant, monotone gradients stay monotone, channels independent."""
    import numpy as np

    from gmft_spark.kernel.raster import resize_bilinear

    g = ((np.arange(9)[:, None] * 20 + np.arange(13)[None, :] * 5) % 256).astype(
        np.uint8
    )
    assert (resize_bilinear(g, 9, 13) == g).all()
    const = np.full((7, 5), 77, np.uint8)
    assert (resize_bilinear(const, 19, 3) == 77).all()
    up = resize_bilinear(np.arange(0, 250, 50, dtype=np.uint8)[None, :], 1, 10)
    assert (np.diff(up[0].astype(int)) >= 0).all()  # monotone preserved
    rgb = np.stack([g, 255 - g, const[0, 0] * np.ones_like(g)], axis=-1).astype(
        np.uint8
    )
    out = resize_bilinear(rgb, 5, 7)
    assert out.shape == (5, 7, 3)
    assert (out[:, :, 2] == 77).all()  # constant channel untouched
    assert (
        out[:, :, 0].astype(int) + out[:, :, 1].astype(int) == 255
    ).all()  # complementary channels stay complementary (linear op)


# ── APNG (acTL/fcTL/fdAT) ────────────────────────────────────────────


def _apng_frame(k, shape=(18, 26)):
    from numpy import arange, stack

    h, w = shape
    g = ((arange(h)[:, None] * 5 + arange(w)[None, :] * 3 + 31 * k) % 256).astype(
        np.uint8
    )
    return stack(
        [g, (g.astype(int) + 60) % 256, (g.astype(int) * 3) % 256], axis=2
    ).astype(np.uint8)


def test_apng_roundtrip_and_default_image():
    from gmft_spark.kernel.raster import (
        decode_apng_frames,
        decode_png,
        encode_apng,
    )

    frames = [_apng_frame(k) for k in range(4)]
    b = encode_apng(frames, delay_ms=50)
    out = decode_apng_frames(b)
    assert len(out) == 4
    assert all(np.array_equal(a, e) for a, e in zip(out, frames))
    # a plain-PNG decoder sees the default image (frame 0)
    assert np.array_equal(decode_png(b), frames[0])
    assert len(decode_apng_frames(b, frame_stride=3)) == 2
    # a plain PNG through the frames API is one frame
    from gmft_spark.kernel.raster import encode_png

    assert len(decode_apng_frames(encode_png(frames[0]))) == 1


def test_apng_subrect_dispose_blend():
    from gmft_spark.kernel.raster import decode_apng_frames, encode_apng

    base = _apng_frame(0)
    patch = _apng_frame(7, (6, 10))
    b = encode_apng([base, patch], offsets=[(0, 0), (5, 8)])
    out = decode_apng_frames(b)
    exp = base.copy()
    exp[8:14, 5:15] = patch
    assert np.array_equal(out[1], exp)
    # dispose 2: the patched rect restores before the next frame
    b2 = encode_apng(
        [base, patch, _apng_frame(2, (6, 10))],
        offsets=[(0, 0), (5, 8), (5, 8)],
        dispose=[0, 2, 0],
    )
    o2 = decode_apng_frames(b2)
    exp2 = base.copy()
    exp2[8:14, 5:15] = _apng_frame(2, (6, 10))
    assert np.array_equal(o2[2], exp2)
    # blend 1: integer alpha-over compositing
    rgba = np.concatenate(
        [patch, np.full((6, 10, 1), 100, np.uint8)], axis=2
    )
    b3 = encode_apng(
        [base, rgba], offsets=[(0, 0), (5, 8)], blend=[0, 1]
    )
    o3 = decode_apng_frames(b3)
    fa, cs = 100, 255 * (255 - 100) // 255
    expb = (
        patch.astype(np.int64) * fa
        + base[8:14, 5:15].astype(np.int64) * cs
    ) // (fa + cs)
    assert np.abs(o3[1][8:14, 5:15, :3].astype(np.int64) - expb).max() == 0


def test_apng_gray_and_containment():
    import pytest

    from gmft_spark.kernel.raster import decode_apng_frames, encode_apng

    gf = [_apng_frame(k)[:, :, 0] for k in range(3)]
    o = decode_apng_frames(encode_apng(gf))
    assert len(o) == 3 and o[1].shape == (18, 26, 3)
    assert np.array_equal(o[1][:, :, 0], gf[1])
    with pytest.raises(ValueError):
        encode_apng([])
    with pytest.raises(ValueError):
        encode_apng(gf, offsets=[(2, 0), (0, 0), (0, 0)])  # frame 0 off
    with pytest.raises(ValueError):
        encode_apng(gf, dispose=7)
    b = bytearray(encode_apng(gf))
    # break a sequence number → gap detected
    i = bytes(b).find(b"fcTL", 60)
    b[i + 4 : i + 8] = (9).to_bytes(4, "big")
    with pytest.raises(ValueError):
        decode_apng_frames(bytes(b))


def test_apng_real_decode_video_modality():
    from gmft_spark.kernel.raster import encode_apng
    from gmft_spark.operators.multimodal import _real_decode

    frames = [_apng_frame(k) for k in range(6)]
    feat, n = _real_decode(encode_apng(frames), "video")
    assert n == 2  # stride 4 over 6 composed frames
    assert abs(float(np.sum(feat)) - 1.0) < 1e-3


# ── full-format PNG (palette / sub-byte / 16-bit / Adam7 / tRNS) ─────


def _png_gray():
    return ((np.arange(21)[:, None] * 7 + np.arange(33)[None, :] * 3) % 256).astype(
        np.uint8
    )


def test_png_subbyte_and_16bit_depths():
    from gmft_spark.kernel.raster import decode_png, encode_png

    g = _png_gray()
    for d in (1, 2, 4):
        src = (g % (1 << d)).astype(np.uint8)
        out = decode_png(encode_png(src, depth=d))
        exp = (src.astype(int) * (255 // ((1 << d) - 1))).astype(np.uint8)
        assert np.array_equal(out, exp), d
    g16 = (
        (np.arange(21)[:, None] * 1021 + np.arange(33)[None, :] * 257) % 65536
    ).astype(np.uint16)
    assert np.array_equal(
        decode_png(encode_png(g16, depth=16)), (g16 >> 8).astype(np.uint8)
    )
    rgb16 = np.stack([g16, g16 * 3, g16 * 7], axis=2).astype(np.uint16)
    assert np.array_equal(
        decode_png(encode_png(rgb16, depth=16)), (rgb16 >> 8).astype(np.uint8)
    )


def test_png_palette_all_depths_and_trns():
    from gmft_spark.kernel.raster import decode_png, encode_png

    g = _png_gray()
    pal = np.stack(
        [
            (np.arange(7) * 37) % 256,
            (np.arange(7) * 11) % 256,
            (np.arange(7) * 91) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    for d in (1, 2, 4, 8):
        n = min(1 << d, 7)
        idx = (g % n).astype(np.uint8)
        out = decode_png(encode_png(idx, depth=d, palette=pal[:n]))
        assert np.array_equal(out, pal[:n][idx]), d
    idx = (g % 7).astype(np.uint8)
    trns = bytes([255, 0, 255, 128, 255, 255, 255])
    out = decode_png(encode_png(idx, palette=pal, trns=trns))
    assert out.shape[2] == 4
    assert np.array_equal(out[:, :, :3], pal[idx])
    assert np.array_equal(out[:, :, 3], np.frombuffer(trns, np.uint8)[idx])


def test_png_gray_alpha_and_color_keys():
    from gmft_spark.kernel.raster import decode_png, encode_png

    g = _png_gray()
    ga = np.stack([g, 255 - g], axis=2).astype(np.uint8)
    out = decode_png(encode_png(ga))
    assert out.shape == (21, 33, 4)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 3], 255 - g)
    # tRNS color keys (16-bit fields holding 8-bit samples)
    key = bytes([0, int(g[3, 4])])
    o = decode_png(encode_png(g, trns=key))
    assert (o[:, :, 3] == np.where(g == g[3, 4], 0, 255)).all()
    rgb = np.stack(
        [g, (g.astype(int) + 80) % 256, (g.astype(int) * 3) % 256], axis=2
    ).astype(np.uint8)
    keyrgb = b"".join(bytes([0, int(rgb[3, 4, c])]) for c in range(3))
    o2 = decode_png(encode_png(rgb, trns=keyrgb))
    match = (rgb == rgb[3, 4]).all(axis=2)
    assert (o2[:, :, 3] == np.where(match, 0, 255)).all()


def test_png_adam7_matches_progressive_free_decode():
    from gmft_spark.kernel.raster import decode_png, encode_png

    g = _png_gray()
    rgb = np.stack(
        [g, (g.astype(int) + 80) % 256, (g.astype(int) * 3) % 256], axis=2
    ).astype(np.uint8)
    pal = np.stack(
        [
            (np.arange(7) * 37) % 256,
            (np.arange(7) * 11) % 256,
            (np.arange(7) * 91) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    g16 = (
        (np.arange(21)[:, None] * 1021 + np.arange(33)[None, :] * 257) % 65536
    ).astype(np.uint16)
    cases = [
        ({}, g),
        ({}, rgb),
        ({"depth": 4}, (g % 16).astype(np.uint8)),
        ({"depth": 16}, g16),
        ({"palette": pal}, (g % 7).astype(np.uint8)),
    ]
    for kwargs, img in cases:
        b = encode_png(img, interlace=True, **kwargs)
        assert np.array_equal(
            decode_png(b), decode_png(encode_png(img, **kwargs))
        ), kwargs
    # tiny images where some Adam7 passes are empty
    for shape in ((1, 1), (3, 2), (5, 9)):
        tiny = (np.arange(np.prod(shape)) % 256).astype(np.uint8).reshape(shape)
        assert np.array_equal(
            decode_png(encode_png(tiny, interlace=True)), tiny
        )


def test_png_general_containment():
    import pytest

    from gmft_spark.kernel.raster import decode_png, encode_png

    g = _png_gray()
    with pytest.raises(ValueError):
        encode_png((g % 4 + 4).astype(np.uint8), depth=2)  # overflow
    with pytest.raises(ValueError):
        encode_png(g, depth=3)  # invalid depth
    pal = np.zeros((4, 3), np.uint8)
    with pytest.raises(ValueError):
        encode_png((g % 7).astype(np.uint8), palette=pal)  # idx overflow
    # palette file with its PLTE stripped is malformed
    b = encode_png((g % 4).astype(np.uint8), palette=pal)
    import struct as _s

    i = b.find(b"PLTE")
    stripped = b[: i - 4] + b[i + 8 + 12 + 4 :]
    # (rebuild by re-walking: easier — flip the PLTE tag so it's skipped)
    bad = bytearray(b)
    bad[i : i + 4] = b"plTE"
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
