"""Baseline JPEG codec: exactness on flat blocks (the oracle
contract), bounded loss on real content, scope gates, and decoding
independence from the encoder's Huffman tables."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_generator_spark.operators.jpeg_codec import (
    QUANT_FLAT,
    QUANT_LUMA_K1,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def test_flat_blocks_roundtrip_exactly_gray():
    """Block-constant image + all-ones quant = EXACT roundtrip (the
    contract jpeg_decode_stats' closed-form oracle relies on)."""
    rng = np.random.default_rng(7)
    vals = rng.integers(5, 250, size=(4, 6))
    img = np.kron(vals, np.ones((8, 8))).astype(np.uint8)
    got = decode_jpeg_baseline(encode_jpeg_baseline(img, QUANT_FLAT))
    assert got.shape == img.shape
    assert np.array_equal(got, img)


def test_gray_gradient_roundtrip_close():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    got = decode_jpeg_baseline(encode_jpeg_baseline(img, QUANT_LUMA_K1))
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() < 25


def test_rgb_roundtrip_close():
    rng = np.random.default_rng(3)
    # smooth random field (random noise is adversarial for any JPEG)
    base = rng.integers(0, 255, size=(3, 4, 3)).astype(np.float64)
    img = np.clip(np.kron(base, np.ones((8, 8, 1))), 0, 255)
    img = img.astype(np.uint8)
    got = decode_jpeg_baseline(encode_jpeg_baseline(img, QUANT_LUMA_K1))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    # block-flat in RGB is flat in YCbCr too; K1 quant rounds the DC
    assert err.mean() < 4 and err.max() < 16


def test_rgb_flat_blocks_exact_with_flat_quant():
    rng = np.random.default_rng(11)
    base = rng.integers(10, 245, size=(2, 2, 3)).astype(np.float64)
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    got = decode_jpeg_baseline(encode_jpeg_baseline(img, QUANT_FLAT))
    # YCbCr<->RGB is float and rounds once each way: off-by-one max
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 1


def test_entropy_data_ff_stuffing_survives():
    """Values that force 0xFF bytes into the entropy stream must be
    stuffed/unstuffed transparently."""
    rng = np.random.default_rng(0)
    for seed in range(5):
        vals = np.random.default_rng(seed).integers(
            0, 256, size=(2, 2))
        img = np.kron(vals, np.ones((8, 8))).astype(np.uint8)
        got = decode_jpeg_baseline(
            encode_jpeg_baseline(img, QUANT_FLAT))
        assert np.array_equal(got, img), seed
    del rng


def test_scope_gates_are_loud():
    img = np.full((8, 8), 128, dtype=np.uint8)
    b = bytearray(encode_jpeg_baseline(img))
    with pytest.raises(ValueError, match="no SOI"):
        decode_jpeg_baseline(b"\x00\x01")
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_baseline(bytes(b))


def test_odd_dimensions_rejected_by_encoder():
    with pytest.raises(ValueError, match="multiple-of-8"):
        encode_jpeg_baseline(np.zeros((9, 8), dtype=np.uint8))
