"""MXU prove kernels vs their VPU/gather twins: bit-exact equivalence."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from lcpc_tpu.fields import FT63, FT255
from lcpc_tpu.encodings.ligero import LigeroEncoding
from lcpc_tpu.ops.limbs import get_ops
from lcpc_tpu.ops.mxu_ntt import ReducePlan
from lcpc_tpu.ops.mxu_prove import MxuCollapse, MxuColumnEval


@pytest.mark.parametrize("spec", [FT63, FT255], ids=["ft63", "ft255"])
def test_mxu_collapse_matches_collapse_words(spec):
    ops = get_ops(spec)
    rng = random.Random(3)
    R, C = 6, 40
    mat = np.stack(
        [ops.encode_host([rng.randrange(spec.p) for _ in range(C)])
         for _ in range(R)], axis=1)
    mat_dev = jnp.asarray(mat)
    ts_ints = [[rng.randrange(spec.p) for _ in range(R)] for _ in range(2)]
    ts = np.stack([ops.encode_host(t) for t in ts_ints], axis=1)
    want = np.asarray(ops.collapse_words(jnp.asarray(ts), mat_dev))

    got = np.asarray(MxuCollapse(spec, R)(ts_ints, mat_dev))
    assert np.array_equal(got, want)

    # packed-coefficient layout
    packed = mat[0::2] | (mat[1::2] << np.uint32(16))
    got2 = np.asarray(MxuCollapse(spec, R, packed=True)(
        ts_ints, jnp.asarray(packed)))
    assert np.array_equal(got2, want)

    # contraction chunked below n_rows (the conv-cap path at 2^29 scale)
    mc = MxuCollapse(spec, R)
    mc.r_chunk = 2
    mc.plan = ReducePlan(spec, 2)
    got3 = np.asarray(mc(ts_ints, mat_dev))
    assert np.array_equal(got3, want)


def test_mxu_column_eval_matches_gather():
    spec = FT63
    ops = get_ops(spec)
    rng = random.Random(5)
    R, npr, nc = 3, 64, 256
    enc = LigeroEncoding.new_from_dims(spec, npr, nc)
    mat = np.stack(
        [ops.encode_host([rng.randrange(spec.p) for _ in range(npr)])
         for _ in range(R)], axis=1)
    mat_dev = jnp.asarray(mat)
    cols = [rng.randrange(nc) for _ in range(17)]
    comm = enc.encode_rows(mat_dev)
    g = np.asarray(jnp.take(comm, jnp.asarray(cols), axis=2))
    want = g[0::2] | (g[1::2] << np.uint32(16))

    ev = MxuColumnEval(enc)
    ev.set_columns(cols)
    got = np.asarray(ev.eval_block(mat_dev))
    assert np.array_equal(got, want)

    # multi-super-chunk contraction over npr, incl. split-accumulation
    ev2 = MxuColumnEval(enc)
    ev2.chunk, ev2.n_acc = 8, 2
    ev2.super_len = 16
    ev2.n_super = npr // 16
    ev2.plan = ReducePlan(spec, 16, split_acc=True)
    ev2.set_columns(cols)
    got2 = np.asarray(ev2.eval_block(mat_dev))
    assert np.array_equal(got2, want)


def test_streaming_prove_mxu_paths_match(monkeypatch):
    """Force the MXU prove paths off-TPU: the streamed proof must stay
    bit-identical to the in-memory prover (collapse + direct column eval)."""
    from lcpc_tpu.core import protocol, streaming
    from lcpc_tpu.utils.tensors import univariate_tensors
    from lcpc_tpu.fs.merlin import Transcript

    monkeypatch.setenv("LCPC_MXU_PROVE", "1")
    monkeypatch.setenv("LCPC_STREAM_KEEP_BYTES", "0")  # force direct eval
    spec = FT63
    rng = random.Random(44)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 300 - 5
    coeffs = [rng.randrange(spec.p) for _ in range(length)]

    def preamble(root):
        tr = Transcript(b"test transcript")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
        return tr

    mem = protocol.commit(coeffs, enc)
    stream = streaming.commit_streaming(coeffs, enc, row_block=64)
    assert stream.words_dev is None
    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, mem.n_per_row, mem.n_rows)

    monkeypatch.setenv("LCPC_MXU_PROVE", "0")
    pf_ref = mem.prove(outer, preamble(mem.get_root()))
    monkeypatch.setenv("LCPC_MXU_PROVE", "1")
    pf_mxu = stream.prove(outer, preamble(stream.get_root()))
    assert pf_mxu.p_eval == pf_ref.p_eval
    assert pf_mxu.p_random_vec == pf_ref.p_random_vec
    for a, b in zip(pf_mxu.columns, pf_ref.columns):
        assert np.array_equal(a.col_mont, b.col_mont)
        assert a.path == b.path
    got = pf_mxu.verify(
        stream.get_root(), outer, inner, enc, preamble(stream.get_root())
    )
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    assert got == want


def test_eval_conv_wrap_accumulation_exact():
    """The eval conv contracts past the int32-positive cap by relying on
    two's-complement wraparound + uint32 bitcast; worst-case digits (all
    0x7F) must still reduce exactly."""
    import jax.numpy as jnp
    from lcpc_tpu.ops.mxu_ntt import _conv_digits, conv_cap
    from lcpc_tpu.ops.mxu_prove import _eval_chunking

    spec = FT255
    chunk, n_acc = _eval_chunking(spec, 1 << 20)
    assert chunk > conv_cap(spec)  # the wrap regime is actually exercised
    w7 = 37
    rows, k = 8, 4
    x7 = jnp.full((w7, rows, chunk), 127, dtype=jnp.int8)
    k7 = jnp.full((w7, chunk, k), 127, dtype=jnp.int8)
    import jax

    pl = jax.lax.bitcast_convert_type(_conv_digits(x7, k7), jnp.uint32)
    got = np.asarray(pl)
    # center plane accumulates w7 * 127^2 * chunk — past 2^31, below 2^32
    center = w7 * 127 * 127 * chunk
    assert center >= (1 << 31)
    assert got[w7 - 1, 0, 0] == center % (1 << 32) == center


def test_mxu_verify_direct_eval_matches(monkeypatch):
    """LCPC_MXU_VERIFY=1: the verifier's direct MXU evaluation of the proof
    rows at the opened points must accept exactly what the full-width
    re-encode accepts (same evaluation out), and still reject tampering."""
    from lcpc_tpu.core import protocol
    from lcpc_tpu.core.protocol import VerifierError
    from lcpc_tpu.utils.tensors import univariate_tensors
    from lcpc_tpu.fs.merlin import Transcript

    monkeypatch.setenv("LCPC_MXU_PROVE", "1")
    spec = FT63
    rng = random.Random(91)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 40 - 3
    coeffs = [rng.randrange(spec.p) for _ in range(length)]

    def preamble(root):
        tr = Transcript(b"test transcript")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
        return tr

    com = protocol.commit(coeffs, enc)
    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, com.n_per_row, com.n_rows)
    pf = com.prove(outer, preamble(com.get_root()))

    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    got_ladder = pf.verify(
        com.get_root(), outer, inner, enc, preamble(com.get_root()))
    monkeypatch.setenv("LCPC_MXU_VERIFY", "1")
    got_eval = pf.verify(
        com.get_root(), outer, inner, enc, preamble(com.get_root()))
    assert got_ladder == got_eval == want

    # tampered p_eval must fail the degree check through the eval path too
    import copy

    pf2 = com.prove(outer, preamble(com.get_root()))
    rows = np.array(pf2._p_eval_rows)
    rows[0, 0] ^= 1
    pf2._p_eval_rows = rows
    try:
        pf2.verify(com.get_root(), outer, inner, enc, preamble(com.get_root()))
        raise AssertionError("tampered p_eval accepted")
    except VerifierError as e:
        assert e.kind in ("ColumnEval", "ColumnDegree")
