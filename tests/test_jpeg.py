"""JPEG codec tests: the encoder's entropy-coded scan is byte-compared
against an independent per-coefficient spec reference (naive loops
straight from ITU-T T.81 Annex A/C/F — deliberately NOT the library's
vectorized path, same pattern as test_codecs.py's PNG oracle), plus
decoder roundtrips with PSNR floors across 4:4:4 / 4:2:0 / grayscale /
restart-interval layouts, exact recovery of DC-only images, and the
disclosed out-of-scope rejections (progressive SOF2, 12-bit)."""

import math
import struct

import numpy as np
import pytest

from georip_spark import jpeg


# ---------------------------------------------------------------------------
# independent spec reference (per-coefficient python loops from T.81)
# ---------------------------------------------------------------------------

# T.81 Figure A.6 zigzag, written out literally (independent of the
# library's generated table)
REF_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def ref_fdct(block):
    """A.3.3 forward DCT, direct double sum (O(N^4) loops)."""
    out = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for u in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y][x]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[v][u] = 0.25 * cu * cv * s
    return out


def ref_huffman_codes(bits, huffval):
    """Annex C (Figures C.1-C.2) code assignment, naive loops."""
    sizes = []
    for length in range(1, 17):
        sizes += [length] * bits[length - 1]
    codes = {}
    code = 0
    si = sizes[0] if sizes else 0
    for sym, size in zip(huffval, sizes):
        while si < size:
            code <<= 1
            si += 1
        codes[sym] = (code, size)
        code += 1
    return codes


class RefBitWriter:
    """Bit-string accumulator; F.1.2.3 0xFF stuffing applied at the end."""

    def __init__(self):
        self.bits = ""

    def put(self, code, length):
        self.bits += format(code & ((1 << length) - 1), f"0{length}b") if length else ""

    def tobytes(self):
        bits = self.bits
        pad = (8 - len(bits) % 8) % 8
        bits += "1" * pad  # F.1.2.3: pad final byte with 1-bits
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = int(bits[i : i + 8], 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def ref_magnitude(v):
    """F.1.2.1.1: (SSSS category, additional bits) for a DIFF/coef."""
    if v == 0:
        return 0, 0
    s = 0
    a = abs(v)
    while a:
        a >>= 1
        s += 1
    return s, v if v > 0 else v + (1 << s) - 1


def ref_encode_scan(img, quality):
    """Grayscale baseline scan bytes, per-coefficient loops throughout.

    Matches the library's contract: quality-scaled Annex-K luma table
    (IJG formula), level shift −128, FDCT per A.3.3, uniform quantize
    with round-half-even (both sides use banker's rounding so the
    comparison is meaningful bit-for-bit), zigzag, Annex-F DC/AC
    Huffman coding with the Annex-K typical luma tables.
    """
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt = [
        max(1, min(255, (int(b) * scale + 50) // 100))
        for b in jpeg.QT_LUMA.reshape(64)
    ]
    dc = ref_huffman_codes(*jpeg.HUFF_DC_LUMA)
    ac = ref_huffman_codes(*jpeg.HUFF_AC_LUMA)
    bw = RefBitWriter()
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = [
                [float(img[by * 8 + y, bx * 8 + x]) - 128.0 for x in range(8)]
                for y in range(8)
            ]
            coefs = ref_fdct(block)
            zz = []
            for k in range(64):
                idx = REF_ZIGZAG[k]
                # numpy's round (half-even) == python 3 round (half-even)
                zz.append(int(round(coefs[idx // 8][idx % 8] / qt[idx])))
            # DC: F.1.2.1
            s, extra = ref_magnitude(zz[0] - pred)
            pred = zz[0]
            c, ln = dc[s]
            bw.put(c, ln)
            bw.put(extra, s)
            # AC: F.1.2.2 (run/size, ZRL, EOB)
            run = 0
            last = 0
            for k in range(63, 0, -1):
                if zz[k]:
                    last = k
                    break
            for k in range(1, last + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac[0xF0]
                    bw.put(c, ln)
                    run -= 16
                s, extra = ref_magnitude(zz[k])
                c, ln = ac[(run << 4) | s]
                bw.put(c, ln)
                bw.put(extra, s)
                run = 0
            if last < 63:
                c, ln = ac[0x00]
                bw.put(c, ln)
    return bw.tobytes()


def extract_scan(data):
    """Entropy-coded bytes between SOS header and EOI."""
    i = 2
    while i < len(data):
        assert data[i] == 0xFF
        marker = data[i + 1]
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if marker == 0xDA:
            return data[i + 2 + ln : -2]
        i += 2 + ln
    raise AssertionError("no SOS")


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * math.log10(255.0**2 / mse)


def grad_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = 96 + 40 * np.sin(x / 9.0) + 30 * np.cos(y / 7.0)
    return np.clip(base + rng.normal(0, 12, (h, w)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder vs spec reference
# ---------------------------------------------------------------------------


def has_quantizer_near_tie(img, quality, tol=1e-9):
    """True if any coefficient/quantizer ratio sits within ``tol`` of a
    half-integer. There the two mathematically-correct DCTs (direct
    double sum vs factored matrix product) can legitimately land on
    opposite sides of the tie — e.g. seed 95 @ q95 produces a
    coefficient at −16.5 ± 1e-14 — so byte-exact comparison is only
    meaningful on tie-free fixtures."""
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt = np.array(
        [max(1, min(255, (int(b) * scale + 50) // 100)) for b in jpeg.QT_LUMA.reshape(64)],
        dtype=np.float64,
    ).reshape(8, 8)
    h, w = img.shape
    for by in range(h // 8):
        for bx in range(w // 8):
            block = [
                [float(img[by * 8 + y, bx * 8 + x]) - 128.0 for x in range(8)]
                for y in range(8)
            ]
            r = np.array(ref_fdct(block)) / qt
            if np.any(np.abs(np.abs(r % 1.0) - 0.5) < tol):
                return True
    return False


class TestEncoderSpecParity:
    @pytest.mark.parametrize("quality", [25, 50, 85, 95])
    def test_scan_bytes_match_reference(self, quality):
        img = None
        for seed in range(quality, quality + 20):
            cand = grad_image(24, 32, seed=seed)
            if not has_quantizer_near_tie(cand, quality):
                img = cand
                break
        assert img is not None, "no tie-free fixture in 20 seeds"
        got = extract_scan(jpeg.jpeg_encode(img, quality=quality))
        want = ref_encode_scan(img, quality)
        assert got == want

    def test_scan_bytes_match_reference_with_ff_stuffing(self):
        # search for a fixture whose bit stream actually contains a
        # 0xFF byte (≈1/256 per scan byte, so a few seeds suffice) →
        # exercises the F.1.2.3 stuffing branch in both coders
        img = got = None
        for seed in range(50):
            rng = np.random.default_rng(seed)
            cand = rng.integers(0, 256, (16, 16), dtype=np.uint8)
            scan = extract_scan(jpeg.jpeg_encode(cand, quality=95))
            if b"\xff\x00" in scan and not has_quantizer_near_tie(cand, 95):
                img, got = cand, scan
                break
        assert img is not None, "no stuffing fixture in 50 seeds"
        assert got == ref_encode_scan(img, 95)

    def test_quality_tables_match_ijg_formula(self):
        for q in (1, 10, 50, 75, 100):
            lt, ct = jpeg.quality_tables(q)
            scale = 5000 // q if q < 50 else 200 - 2 * q
            ref = [
                max(1, min(255, (int(b) * scale + 50) // 100))
                for b in jpeg.QT_LUMA.reshape(64)
            ]
            assert lt.reshape(64).tolist() == ref

    def test_huffman_assignment_matches_annex_c(self):
        for spec in (jpeg.HUFF_DC_LUMA, jpeg.HUFF_AC_LUMA,
                     jpeg.HUFF_DC_CHROMA, jpeg.HUFF_AC_CHROMA):
            assert jpeg.build_huffman(*spec) == ref_huffman_codes(*spec)

    def test_zigzag_matches_spec_table(self):
        assert jpeg.ZIGZAG.tolist() == REF_ZIGZAG


# ---------------------------------------------------------------------------
# roundtrips
# ---------------------------------------------------------------------------


class TestRoundtrip:
    def test_flat_image_exact(self):
        # DC-only blocks whose DC/quantizer ratio is integral survive
        # exactly: (v-128)·8 / 16 ∈ ℤ for these values at q50
        for v in (0, 64, 128):
            img = np.full((24, 16), v, np.uint8)
            out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=50))
            assert np.array_equal(out, img)
        # v=255 puts DC/qt exactly on a .5 tie (1016/16) — recovery is
        # within one quantizer tie step, not bit-exact
        img = np.full((24, 16), 255, np.uint8)
        out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=50))
        assert np.abs(out.astype(int) - 255).max() <= 2

    def test_flat_rgb_exact_chroma(self):
        img = np.zeros((16, 16, 3), np.uint8)
        img[:] = (200, 100, 50)
        out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=90))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("quality", [50, 85, 95])
    def test_rgb_psnr_floor(self, sub, quality):
        y, x = np.mgrid[0:40, 0:56]
        img = np.stack(
            [
                np.clip(120 + 60 * np.sin(x / 11.0), 0, 255),
                np.clip(120 + 60 * np.cos(y / 13.0), 0, 255),
                np.clip(120 + 40 * np.sin((x + y) / 17.0), 0, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=quality, subsampling=sub))
        assert out.shape == img.shape
        # measured post-dequant-fix: 444 = 42.3/47.7/52.1,
        # 420 = 38.6/42.7/44.9 (chroma downsample caps 420's gain).
        # Floors sit ~4 dB under measurement; the size ladder is
        # asserted separately below.
        floor = (
            {50: 34.0, 85: 38.0, 95: 40.0}[quality]
            if sub == "420"
            else {50: 38.0, 85: 43.0, 95: 47.0}[quality]
        )
        assert psnr(out, img) >= floor

    def test_size_grows_with_quality(self):
        y, x = np.mgrid[0:40, 0:56]
        img = np.stack([
            np.clip(120 + 60 * np.sin(x / 11.0), 0, 255),
            np.clip(120 + 60 * np.cos(y / 13.0), 0, 255),
            np.clip(120 + 40 * np.sin((x + y) / 17.0), 0, 255),
        ], axis=-1).astype(np.uint8)
        sizes = [len(jpeg.jpeg_encode(img, quality=q)) for q in (30, 50, 70, 85, 95)]
        assert sizes == sorted(sizes)

    def test_gray_psnr_improves_with_quality(self):
        img = grad_image(48, 48, seed=3)
        vals = [
            psnr(jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=q)), img)
            for q in (25, 60, 95)
        ]
        # noise-bearing fixture → clean monotonicity (≈27.1/28.4/42.2
        # measured post-dequant-fix)
        assert vals[0] < vals[1] < vals[2]
        assert vals[2] >= 38.0

    def test_odd_dimensions(self):
        # non-multiple-of-8 (and, for 420, non-multiple-of-16) dims:
        # encoder pads edge-replicated, decoder crops back
        for shape, sub in (((13, 21), None), ((37, 53, 3), "444"),
                           ((37, 53, 3), "420"), ((1, 1), None)):
            img = grad_image(shape[0], shape[1], seed=7)
            if len(shape) == 3:
                img = np.stack([img, 255 - img, img // 2], axis=-1)
            kw = {"subsampling": sub} if sub else {}
            out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=90, **kw))
            assert out.shape == img.shape
            # measured post-dequant-fix: 36.3 / 32.1 / 27.7 / exact
            assert psnr(out, img) >= 26.0

    def test_restart_interval_roundtrip(self):
        img = grad_image(32, 48, seed=11)
        plain = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=85))
        for ri in (1, 2, 5):
            data = jpeg.jpeg_encode(img, quality=85, restart_interval=ri)
            # RST markers actually present
            assert any(
                data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
                for i in range(2, len(data) - 2)
            )
            out = jpeg.jpeg_decode(data)
            # restart markers change framing, not reconstruction
            assert np.array_equal(out, plain)

    def test_restart_interval_rgb_420(self):
        img = np.stack([grad_image(32, 32, seed=s) for s in (1, 2, 3)], axis=-1)
        data = jpeg.jpeg_encode(img, quality=85, subsampling="420", restart_interval=2)
        plain = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality=85, subsampling="420"))
        assert np.array_equal(jpeg.jpeg_decode(data), plain)


# ---------------------------------------------------------------------------
# metadata + rejections
# ---------------------------------------------------------------------------


class TestMetaAndErrors:
    def test_meta(self):
        img = grad_image(30, 44, seed=5)
        m = jpeg.jpeg_meta(jpeg.jpeg_encode(img, quality=80))
        assert m == {
            "format": "jpeg", "width": 44, "height": 30,
            "channels": 1, "bit_depth": 8, "process": 0xC0,
        }
        rgb = np.stack([img] * 3, axis=-1)
        m = jpeg.jpeg_meta(jpeg.jpeg_encode(rgb, quality=80, subsampling="420"))
        assert (m["width"], m["height"], m["channels"]) == (44, 30, 3)

    def test_progressive_rejected(self):
        data = bytearray(jpeg.jpeg_encode(grad_image(16, 16), quality=80))
        # flip SOF0 (0xC0) to SOF2 (progressive)
        idx = bytes(data).find(b"\xff\xc0")
        data[idx + 1] = 0xC2
        with pytest.raises(ValueError, match="SOF"):
            jpeg.jpeg_decode(bytes(data))

    def test_bad_inputs_rejected(self):
        with pytest.raises(ValueError):
            jpeg.jpeg_encode(np.zeros((8, 8), np.float32))
        with pytest.raises(ValueError):
            jpeg.jpeg_encode(np.zeros((8, 8, 4), np.uint8))
        with pytest.raises(ValueError):
            jpeg.jpeg_encode(np.zeros((8, 8), np.uint8), subsampling="422")
        with pytest.raises(ValueError):
            jpeg.jpeg_decode(b"\x89PNG not a jpeg")
