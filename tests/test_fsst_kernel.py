"""Unit tests pinning FSST kernel semantics — ports of the reference's
correctness cases (reference tests/correctness.rs, src/builder.rs:854-934
and doctests src/lib.rs:313-323, 434-450) to byte/token inputs."""

from __future__ import annotations

import numpy as np

from fsst_ray.kernel import fsst


def test_basic_roundtrip():
    # mirror of test_basic (tests/correctness.rs:16-23)
    text = (
        b"This is a test paragraph with some repeated words words words "
        b"and the usual english patterns the the the of of and and"
    )
    comp = fsst.train([text])
    compressed = comp.compress(text)
    assert comp.decompressor().decompress(compressed) == text
    # compression kicks in once symbols clear the count cutoff
    comp5 = fsst.train([text] * 20)
    assert len(comp5.compress(text)) < len(text)


def test_train_on_empty():
    # mirror of test_train_on_empty (tests/correctness.rs:25-34)
    comp = fsst.train([])
    assert comp.n_symbols == 0
    data = b"anything at all"
    compressed = comp.compress(data)
    # all-escape: exactly 2x size, alternating [255, byte]
    assert len(compressed) == 2 * len(data)
    assert compressed[::2] == b"\xff" * len(data)
    assert compressed[1::2] == data
    assert comp.decompressor().decompress(compressed) == data


def test_empty_corpus_lines():
    comp = fsst.train([b"", b"", b""])
    assert comp.compress(b"") == b""
    assert comp.decompressor().decompress(b"") == b""


def test_one_byte_handbuilt():
    # mirror of test_one_byte (tests/correctness.rs:36-47) + doctest
    # src/lib.rs:313-323: a single inserted symbol compresses to [0]
    builder = fsst.CompressorBuilder()
    sym = int.from_bytes(b"hello\x00\x00\x00", "little")
    assert builder.insert(sym, 5)
    comp = builder.build()
    assert comp.compress(b"hello") == b"\x00"
    assert comp.decompressor().decompress(b"\x00") == b"hello"


def test_eight_byte_symbol_code_zero():
    # doctest src/lib.rs:434-450
    builder = fsst.CompressorBuilder()
    sym = int.from_bytes(b"aaaaaaaa", "little")
    assert builder.insert(sym, 8)
    comp = builder.build()
    assert comp.compress(b"aaaaaaaa") == b"\x00"


def test_zeros():
    # mirror of test_zeros (tests/correctness.rs:49-55): the all-zero
    # symbol special case (src/lib.rs:52-69)
    corpus = [b"\x00" * 64, b"\x00\x01\x02\x03\x04\x00" * 8]
    comp = fsst.train(corpus)
    for line in corpus + [b"\x00", b"\x00" * 7]:
        assert comp.decompressor().decompress(comp.compress(line)) == line


def test_large_cyclic():
    # mirror of test_large (tests/correctness.rs:57-71): small training
    # corpus, much larger compress input
    motif = bytes(range(48)) * 4
    train_corpus = [motif * 50]
    comp = fsst.train(train_corpus)
    big = motif * 4096  # ~780 KB
    compressed = comp.compress(big)
    assert len(compressed) < len(big) // 2
    assert comp.decompressor().decompress(compressed) == big


def test_exact_escape_sequence():
    # mirror of test_builder (src/builder.rs:876-892): unseen bytes
    # escape as [255, b] pairs; trained text has no escapes
    text = b"hello hello hello hello hello"
    comp = fsst.train([text] * 5)
    compressed = comp.compress(text)
    assert 255 not in compressed
    unseen = comp.compress(b"xyz123")
    assert unseen == bytes(
        b for ch in b"xyz123" for b in (255, ch)
    )
    assert comp.decompressor().decompress(unseen) == b"xyz123"


def test_training_determinism():
    # FIXTURES.md: training twice on the same input is bit-identical
    rng = np.random.default_rng(5)
    lines = [
        (rng.zipf(1.5, size=int(rng.integers(10, 200))) % 1000)
        .astype("<i4")
        .tobytes()
        for _ in range(500)
    ]
    a = fsst.train(lines)
    b = fsst.train(lines)
    assert np.array_equal(a.symbols, b.symbols)
    assert np.array_equal(a.lengths, b.lengths)
    assert a.has_suffix_code == b.has_suffix_code


def test_worst_case_bound():
    # compressed size never exceeds 2x input (src/lib.rs:523-525)
    rng = np.random.default_rng(9)
    comp = fsst.train([rng.integers(0, 256, 100).astype(np.uint8).tobytes()])
    for _ in range(20):
        data = rng.integers(0, 256, int(rng.integers(0, 200))).astype(np.uint8).tobytes()
        compressed = comp.compress(data)
        assert len(compressed) <= 2 * len(data)
        assert comp.decompressor().decompress(compressed) == data


def test_randomized_roundtrip_property():
    # fuzz_compress / fuzz_train analogue with fixed seeds
    rng = np.random.default_rng(1234)
    for trial in range(10):
        n_lines = int(rng.integers(1, 50))
        lines = [
            rng.integers(0, 256, int(rng.integers(0, 300))).astype(np.uint8).tobytes()
            for _ in range(n_lines)
        ]
        comp = fsst.train(lines)  # must never crash
        dec = comp.decompressor()
        for line in lines:
            assert dec.decompress(comp.compress(line)) == line


def test_train_never_panics_on_adversarial_bytes():
    """Mirror of /root/reference/fuzz/fuzz_targets/fuzz_train.rs:5-7:
    training on arbitrary byte inputs must never raise, and the trained
    table must round-trip the training data. Covers all-escape bytes,
    >16 KiB single lines (beyond FSST_SAMPLEMAX), empty mixes, single
    repeated bytes, and dense byte-space sweeps."""
    rng = np.random.default_rng(0xF5A7)
    adversarial = [
        [b""],
        [b"", b"", b""],
        [bytes(range(256)) * 80],                      # every byte, 20 KiB
        [b"\xff" * 40000],                             # one line > sample max
        [bytes([rng.integers(0, 256)]) * 3 for _ in range(300)],
        [rng.integers(0, 256, 17000).astype(np.uint8).tobytes()],  # random > 16 KiB
        [b"\x00" * 5, b"", b"\x00\x01" * 9000, b"ab"],
        [rng.integers(0, 2, 1000).astype(np.uint8).tobytes() for _ in range(64)],
    ]
    for lines in adversarial:
        comp = fsst.train(lines)  # must never raise
        dec = comp.decompressor()
        for line in lines:
            assert dec.decompress(comp.compress(line)) == line
