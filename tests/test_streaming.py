"""Streaming commit vs the in-memory path: identical roots, hashes, proofs."""

import random

import jax.numpy as jnp

import numpy as np
import pytest

from lcpc_tpu.core import protocol, streaming
from lcpc_tpu.encodings.ligero import LigeroEncoding
from lcpc_tpu.fields import FT63
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.utils.tensors import univariate_tensors


def _preamble(enc, root):
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    return tr


@pytest.mark.parametrize("row_block,keep", [(128, True), (256, True),
                                            (128, False)])
def test_streaming_matches_inmemory(row_block, keep, monkeypatch):
    spec = FT63
    rng = random.Random(77)
    # enough rows that several blocks and chunk-buffer carries occur:
    # n_per_row=64, n_cols=128 -> 700 rows for length 44800
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 700 - 13
    coeffs = [rng.randrange(spec.p) for _ in range(length)]

    if not keep:
        # force the no-retained-codeword path: prove re-encodes blocks
        monkeypatch.setenv("LCPC_STREAM_KEEP_BYTES", "0")
    mem = protocol.commit(coeffs, enc)
    stream = streaming.commit_streaming(coeffs, enc, row_block=row_block)
    assert (stream.words_dev is not None) == keep

    assert stream.get_root() == mem.get_root()
    assert np.array_equal(stream.hashes, mem.hashes)

    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, mem.n_per_row, mem.n_rows)

    pf_mem = mem.prove(outer, _preamble(enc, mem.get_root()))
    pf_st = stream.prove(outer, _preamble(enc, stream.get_root()))
    assert pf_st.p_eval == pf_mem.p_eval
    assert pf_st.p_random_vec == pf_mem.p_random_vec
    for a, b in zip(pf_st.columns, pf_mem.columns):
        assert np.array_equal(a.col_mont, b.col_mont)
        assert a.path == b.path

    # and the streamed proof verifies through the standard verifier
    got = pf_st.verify(
        stream.get_root(), outer, inner, enc, _preamble(enc, stream.get_root())
    )
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    assert got == want


def test_streaming_sha256_digest():
    """digest= genericity reaches the streaming path (SHA-256 carry hasher)."""
    from lcpc_tpu.ops.digest import SHA256

    spec = FT63
    rng = random.Random(88)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 300 - 5
    coeffs = [rng.randrange(spec.p) for _ in range(length)]

    mem = protocol.commit(coeffs, enc, digest=SHA256)
    stream = streaming.commit_streaming(
        coeffs, enc, row_block=128, digest=SHA256
    )
    # byte view first, then root: get_root must reuse the materialized bytes
    assert np.array_equal(stream.hashes, mem.hashes)
    assert stream.get_root() == mem.get_root()

    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, mem.n_per_row, mem.n_rows)
    pf = stream.prove(outer, _preamble(enc, stream.get_root()))
    got = protocol.verify(
        stream.get_root(), outer, inner, pf, enc,
        _preamble(enc, stream.get_root()), digest=SHA256,
    )
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    assert got == want


@pytest.mark.parametrize("keep", [True, False])
def test_streaming_packed_coeffs(keep, monkeypatch):
    """Packed-coefficient streaming (W/2 u32 words resident, per-block
    unpack) is bit-identical to the unpacked path: same root/hashes, same
    proof, through both the retained-codeword and re-encode prove paths."""
    from lcpc_tpu.ops.limbs import get_ops

    spec = FT63
    ops = get_ops(spec)
    rng = random.Random(99)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 700 - 13
    coeffs = [rng.randrange(spec.p) for _ in range(length)]

    if not keep:
        monkeypatch.setenv("LCPC_STREAM_KEEP_BYTES", "0")
    plain = streaming.commit_streaming(coeffs, enc, row_block=128)
    arr = ops.encode_host(coeffs)  # (W, length) Montgomery limbs
    packed_arr = arr[0::2] | (arr[1::2] << np.uint32(16))  # (W/2, length)
    packed = streaming.commit_streaming(packed_arr, enc, row_block=128)
    assert packed.packed and not plain.packed
    assert (packed.words_dev is not None) == keep

    assert packed.get_root() == plain.get_root()
    assert np.array_equal(packed.hashes, plain.hashes)

    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, plain.n_per_row, plain.n_rows)
    pf_pk = packed.prove(outer, _preamble(enc, packed.get_root()))
    pf_pl = plain.prove(outer, _preamble(enc, plain.get_root()))
    assert pf_pk.p_eval == pf_pl.p_eval
    assert pf_pk.p_random_vec == pf_pl.p_random_vec
    for a, b in zip(pf_pk.columns, pf_pl.columns):
        assert np.array_equal(a.col_mont, b.col_mont)
        assert a.path == b.path

    got = pf_pk.verify(
        packed.get_root(), outer, inner, enc, _preamble(enc, packed.get_root())
    )
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    assert got == want


def test_seeded_source_deterministic_and_e2e():
    """SeededCoeffSource: block values are a pure function of (seed, index)
    regardless of partitioning, and the beyond-HBM pipeline (seeded commit,
    spill='none', prove-by-regeneration) produces the same proof as an
    in-memory commit over the materialized coefficients."""
    from lcpc_tpu.core.coeffs import SeededCoeffSource
    from lcpc_tpu.ops.limbs import get_ops

    spec = FT63
    ops = get_ops(spec)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 700  # 700 rows
    # materialized twin (chunk smaller than a row to force chunk stitching)
    src_a = SeededCoeffSource(spec, length, seed=5, chunk=1 << 10)
    src_b = SeededCoeffSource(spec, length, seed=5, chunk=1 << 10)
    arr = np.asarray(src_a.materialize())

    src_b.set_dims(700, 64)
    blk = np.asarray(src_b.block(3, 17))  # unaligned row range
    want = arr.reshape(ops.w, 700, 64)[:, 3:17, :]
    assert np.array_equal(blk, want)

    mem = protocol.commit(arr[:, :length], enc)
    src_c = SeededCoeffSource(spec, length, seed=5, chunk=1 << 10)
    stream = streaming.commit_streaming(src_c, enc, row_block=256,
                                        spill="none")
    assert stream.words_dev is None and stream.words_host is None
    assert stream.coeffs is None
    assert stream.get_root() == mem.get_root()

    x = random.Random(3).randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, mem.n_per_row, mem.n_rows)
    pf_mem = mem.prove(outer, _preamble(enc, mem.get_root()))
    pf_st = stream.prove(outer, _preamble(enc, stream.get_root()))
    assert pf_st.p_eval == pf_mem.p_eval
    for a, b in zip(pf_st.columns, pf_mem.columns):
        assert np.array_equal(a.col_mont, b.col_mont)
        assert a.path == b.path
    got = pf_st.verify(
        stream.get_root(), outer, inner, enc, _preamble(enc, stream.get_root())
    )
    assert got == pf_mem.verify(
        mem.get_root(), outer, inner, enc, _preamble(enc, mem.get_root())
    )


def test_seeded_source_padding_tail():
    """A non-multiple length zero-pads the final rows exactly like the
    in-memory pad (lib.rs:640-645)."""
    from lcpc_tpu.core.coeffs import SeededCoeffSource

    spec = FT63
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 300 - 29
    src = SeededCoeffSource(spec, length, seed=9, chunk=1 << 10)
    arr = np.asarray(SeededCoeffSource(spec, length, seed=9,
                                       chunk=1 << 10).materialize())
    mem = protocol.commit(arr[:, :length], enc)
    stream = streaming.commit_streaming(src, enc, row_block=128)
    assert stream.get_root() == mem.get_root()


def test_host_source_and_host_spill():
    """HostCoeffSource + spill='host': coefficients live in host RAM and the
    codeword spills back per block; prove gathers columns from the host copy
    and the proof is bit-identical to the device-resident path."""
    from lcpc_tpu.ops.limbs import get_ops

    spec = FT63
    ops = get_ops(spec)
    rng = random.Random(31)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 700 - 13
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    arr = ops.encode_host(coeffs)  # numpy -> HostCoeffSource

    mem = protocol.commit(coeffs, enc)
    stream = streaming.commit_streaming(arr, enc, row_block=128, spill="host")
    assert stream.words_dev is None and stream.words_host is not None
    assert stream.get_root() == mem.get_root()
    assert np.array_equal(stream.hashes, mem.hashes)

    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, mem.n_per_row, mem.n_rows)
    pf_mem = mem.prove(outer, _preamble(enc, mem.get_root()))
    pf_st = stream.prove(outer, _preamble(enc, stream.get_root()))
    assert pf_st.p_eval == pf_mem.p_eval
    assert pf_st.p_random_vec == pf_mem.p_random_vec
    for a, b in zip(pf_st.columns, pf_mem.columns):
        assert np.array_equal(a.col_mont, b.col_mont)
        assert a.path == b.path
    got = pf_st.verify(
        stream.get_root(), outer, inner, enc, _preamble(enc, stream.get_root())
    )
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    assert got == want


@pytest.mark.parametrize("src_kind", ["packed", "seeded", "limbs"])
def test_tail_keep_brakedown(src_kind, monkeypatch):
    """Tail keep: when the full codeword misses the keep budget but the
    non-systematic tail fits, a Brakedown streaming commit retains only
    columns [n_per_row:) and prove merges systematic columns gathered from
    the coefficients with tail columns from the retained buffer — proof
    bit-identical to the in-memory prover."""
    from lcpc_tpu.core.coeffs import SeededCoeffSource
    from lcpc_tpu.encodings.brakedown import SdigEncoding
    from lcpc_tpu.ops.limbs import get_ops

    spec = FT63
    ops = get_ops(spec)
    enc = SdigEncoding(spec, 512, 0)
    n_rows = 160  # total column words must exceed one 256-word hash chunk
    length = 512 * n_rows
    wpe = ops.w // 2
    full = n_rows * wpe * enc.n_cols * 4
    tail = n_rows * wpe * (enc.n_cols - enc.n_per_row) * 4
    # budget between tail and full so auto picks the tail
    monkeypatch.setenv("LCPC_STREAM_KEEP_BYTES", str((full + tail) // 2))

    if src_kind == "seeded":
        src = SeededCoeffSource(spec, length, seed=11, chunk=1 << 10)
        arr = np.asarray(
            SeededCoeffSource(spec, length, seed=11, chunk=1 << 10)
            .materialize()
        )
        coeffs = src
    else:
        rng = random.Random(21)
        vals = [rng.randrange(spec.p) for _ in range(length)]
        arr = np.asarray(ops.encode_host(vals))
        if src_kind == "packed":
            coeffs = jnp.asarray(arr[0::2] | (arr[1::2] << np.uint32(16)))
        else:
            coeffs = jnp.asarray(arr)

    mem = protocol.commit(jnp.asarray(arr[:, :length]), enc)
    stream = streaming.commit_streaming(coeffs, enc, row_block=16)
    assert stream.words_dev is not None
    assert stream.words_off == enc.n_per_row
    assert stream.words_dev.shape[1] == enc.n_cols - enc.n_per_row
    assert stream.get_root() == mem.get_root()

    x = random.Random(4).randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, mem.n_per_row, mem.n_rows)
    pf_mem = mem.prove(outer, _preamble(enc, mem.get_root()))
    pf_st = stream.prove(outer, _preamble(enc, stream.get_root()))
    assert pf_st.p_eval == pf_mem.p_eval
    for a, b in zip(pf_st.columns, pf_mem.columns):
        assert np.array_equal(a.col_mont, b.col_mont)
        assert a.path == b.path
    got = pf_st.verify(
        stream.get_root(), outer, inner, enc,
        _preamble(enc, stream.get_root())
    )
    assert got == pf_mem.verify(
        mem.get_root(), outer, inner, enc, _preamble(enc, mem.get_root())
    )
