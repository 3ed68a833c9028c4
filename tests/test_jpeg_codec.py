"""Baseline-sequential JPEG codec (VERDICT r13 item 4): the stdlib
encoder/decoder pair in operators/multimodal.py -- Huffman entropy
coding, dequant, IDCT, YCbCr->RGB, restart intervals, sampling-factor
upsampling -- pinned by a committed golden file, marker-structure
checks against the T.81 layout, exact-decode proofs for the
per-block-constant fixture form, and lossy round-trip property bounds
for arbitrary content."""

from __future__ import annotations

import random

import pytest

from dbt_metrics_ingestion_script_spark.operators import multimodal as M

# committed golden: encode_jpeg_gray_blocks(11, 5, [64, 200],
# restart_interval=1) as of r14 -- byte-format stability pin (any
# change to marker layout, table serialization, bit packing, or
# stuffing shows up here before it hits the registered corpus)
_GOLDEN_HEX = (
    "ffd8ffdb00430001010101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "01010101010101ffc0000b080005000b01011100ffc4001f0000010501010101"
    "010100000000000000000102030405060708090a0bffc400b510000201030302"
    "0403050504040000017d01020300041105122131410613516107227114328191"
    "a1082342b1c11552d1f02433627282090a161718191a25262728292a34353637"
    "38393a434445464748494a535455565758595a636465666768696a7374757677"
    "78797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4"
    "b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8"
    "e9eaf1f2f3f4f5f6f7f8f9faffdd00040001ffda0008010100003f00fe7febff"
    "d0fe902bffd9"
)


def test_golden_file_bytes_and_decode():
    """The committed golden blob must re-encode byte-identically AND
    decode to the exact per-block pixels."""
    golden = bytes.fromhex(_GOLDEN_HEX)
    assert (
        M.encode_jpeg_gray_blocks(11, 5, [64, 200], restart_interval=1)
        == golden
    )
    w, h, rgb = M.decode_jpeg_rgb(golden)
    assert (w, h) == (11, 5)
    for y in range(h):
        for x in range(w):
            want = 64 if x < 8 else 200
            assert rgb[3 * (y * w + x) : 3 * (y * w + x) + 3] == bytes(
                [want] * 3
            )


def test_golden_marker_structure_matches_t81_layout():
    """Spec-level pins independent of the round trip: SOI first, EOI
    last, SOF0 declares 8-bit precision / 5x11 / 1 component, the DQT
    is 64 ones, the DHT BITS arrays are the Annex K standard tables,
    and the DRI interval is 1."""
    b = bytes.fromhex(_GOLDEN_HEX)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    sof = b.find(b"\xff\xc0")
    assert sof > 0
    # SOF0 payload: len(2) precision(1) height(2) width(2) ncomp(1)
    assert b[sof + 4] == 8
    assert int.from_bytes(b[sof + 5 : sof + 7], "big") == 5
    assert int.from_bytes(b[sof + 7 : sof + 9], "big") == 11
    assert b[sof + 9] == 1
    dqt = b.find(b"\xff\xdb")
    assert set(b[dqt + 5 : dqt + 69]) == {1}
    dht1 = b.find(b"\xff\xc4")
    assert list(b[dht1 + 5 : dht1 + 21]) == M._JPEG_DC_LUM[0]
    dht2 = b.find(b"\xff\xc4", dht1 + 2)
    assert list(b[dht2 + 5 : dht2 + 21]) == M._JPEG_AC_LUM[0]
    dri = b.find(b"\xff\xdd")
    assert int.from_bytes(b[dri + 4 : dri + 6], "big") == 1
    assert b.count(b"\xff\xd0") == 1  # one RST0 between the two MCUs


def test_annex_k_tables_are_valid_canonical_codes():
    """Each shipped table: value count matches the BITS sum, and the
    canonical code assignment satisfies Kraft (prefix-free)."""
    for bits, vals in (
        M._JPEG_DC_LUM, M._JPEG_DC_CHR, M._JPEG_AC_LUM, M._JPEG_AC_CHR,
    ):
        assert sum(bits) == len(vals) == len(set(vals))
        kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
        assert kraft <= 1.0
        enc = M._jpeg_huff_encode_map(bits, vals)
        codes = {(length, code) for code, length in enc.values()}
        assert len(codes) == len(vals)  # no collisions


def test_constant_block_fixture_is_exactly_lossless():
    """The analytic-oracle precondition: per-block-constant JPEGs
    decode bit-exactly (one DC coefficient survives quant=1 + IDCT
    rounding), including DC-diff sign changes and edge cropping."""
    W, H = 17, 12  # 3x2 blocks, right+bottom crop
    bw = (W + 7) // 8
    vals = [(240 + 17 * b) % 256 for b in range(bw * ((H + 7) // 8))]
    w, h, rgb = M.decode_jpeg_rgb(M.encode_jpeg_gray_blocks(W, H, vals))
    assert (w, h) == (W, H)
    for y in range(H):
        for x in range(W):
            want = vals[(y // 8) * bw + (x // 8)]
            assert rgb[3 * (y * W + x)] == want


@pytest.mark.parametrize("ri", [0, 1, 2, 4, 7])
def test_restart_intervals_reset_dc_prediction(ri):
    W, H = 33, 17  # 5x3 = 15 MCUs
    bw = (W + 7) // 8
    vals = [(30 + 41 * b) % 256 for b in range(bw * ((H + 7) // 8))]
    blob = M.encode_jpeg_gray_blocks(W, H, vals, restart_interval=ri)
    w, h, rgb = M.decode_jpeg_rgb(blob)
    assert (w, h) == (W, H)
    assert all(
        rgb[3 * (y * W + x)] == vals[(y // 8) * bw + (x // 8)]
        for y in range(H)
        for x in range(W)
    )


@pytest.mark.parametrize("seed,dims", [(7, (19, 11)), (23, (8, 8)), (99, (21, 16))])
def test_rgb_444_round_trip_error_bound(seed, dims):
    """quant=1 keeps every coefficient: decode error is bounded by the
    FDCT/color rounding -- <= 2 per channel for arbitrary content."""
    W, H = dims
    random.seed(seed)
    rgb0 = bytes(random.randrange(256) for _ in range(W * H * 3))
    w, h, rgb1 = M.decode_jpeg_rgb(M.encode_jpeg_rgb(W, H, rgb0))
    assert (w, h) == (W, H)
    assert max(abs(a - b) for a, b in zip(rgb0, rgb1)) <= 2


def test_rgb_420_subsampled_decode():
    """4:2:0: luma carries per-pixel detail at full resolution through
    the 2x2-blocks-per-MCU layout; constant chroma survives the
    box-average + replication upsample within rounding."""
    W, H = 19, 11
    random.seed(5)
    gray = [random.randrange(256) for _ in range(W * H)]
    rgb0 = bytes(v for g in gray for v in (g, g, g))  # chroma-constant
    w, h, rgb1 = M.decode_jpeg_rgb(
        M.encode_jpeg_rgb(W, H, rgb0, subsample=True)
    )
    assert (w, h) == (W, H)
    assert max(abs(a - b) for a, b in zip(rgb0, rgb1)) <= 2


def test_progressive_and_truncated_rejected():
    blob = bytearray(M.encode_jpeg_gray_blocks(9, 3, [10, 250]))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="0xFFC2"):
        M.decode_jpeg_rgb(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        M.decode_jpeg_rgb(b"\x89PNG not a jpeg")


def test_dispatcher_routes_jpeg():
    blob = M.encode_jpeg_gray_blocks(5, 3, [200])
    assert M.decode_image_rgb(blob)[:2] == (5, 3)
    assert M.decode_image(blob) == (5, 3)


def test_truncated_jpeg_raises_value_error_via_dispatcher():
    """The dispatcher contract: undecodable payloads raise ValueError
    (so decode_stats callers can route), never a bare IndexError from
    the bit reader hitting end-of-buffer."""
    blob = M.encode_jpeg_gray_blocks(17, 12, [(i * 31) % 256 for i in range(6)])
    with pytest.raises(ValueError):
        M.decode_image_rgb(blob[: len(blob) // 2])


def test_sos_with_undeclared_component_raises_value_error():
    """ADVICE r15: a SOS referencing a component id absent from SOF
    raised StopIteration from a bare next(), leaking past the
    dispatcher's ValueError contract.  Now it names the defect."""
    blob = bytearray(M.encode_jpeg_gray_blocks(9, 3, [10, 250]))
    sos = blob.find(b"\xff\xda")
    # SOS layout: FFDA len ns cs1 tables1 ... -> corrupt cs1
    blob[sos + 5] = 0x77
    with pytest.raises(ValueError, match="undeclared component"):
        M.decode_jpeg_rgb(bytes(blob))
    with pytest.raises(ValueError):
        M.decode_image_rgb(bytes(blob))


def test_sos_with_undeclared_huffman_table_raises_value_error():
    """ADVICE r15: a scan selecting a Huffman table id that no DHT
    declared raised KeyError from huff[(cls, id)] mid-entropy-loop;
    now validated up front with the table named."""
    blob = bytearray(M.encode_jpeg_gray_blocks(9, 3, [10, 250]))
    sos = blob.find(b"\xff\xda")
    # tables byte: high nibble DC id, low nibble AC id -> point both
    # at table 3, never declared by the fixture encoder
    blob[sos + 6] = 0x33
    with pytest.raises(ValueError, match="Huffman table"):
        M.decode_jpeg_rgb(bytes(blob))
    with pytest.raises(ValueError):
        M.decode_image_rgb(bytes(blob))
