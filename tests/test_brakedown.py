"""Brakedown/SDIG encoding tests: matgen determinism, device-vs-host encode
twin, codeword layout, and end-to-end protocol (mirrors
lcpc-brakedown-pc/src/tests.rs:78-93,193-288)."""

import random

import numpy as np
import pytest

from lcpc_tpu.core import protocol
from lcpc_tpu.core import reference_impl as ref
from lcpc_tpu.encodings import brakedown as bd
from lcpc_tpu.fields import FT63
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.ops.limbs import get_ops


def test_code_dims_ladder():
    pre, post = bd.get_code_dims(bd.CODE3, 2965, float(FT63.flog2))
    # alpha ladder: 2965 -> 528 -> 94 -> 17 (<= baselen stops)
    assert [ni for ni, _, _ in pre] == [2965, 528, 94]
    assert [mi for _, mi, _ in pre] == [528, 94, 17]
    for ni, mi, cn in pre:
        assert 0 < cn <= mi
    for nip, mip, dn in post:
        assert 0 < dn <= mip


def test_matgen_deterministic():
    pre1, post1 = bd.generate(FT63, bd.CODE3, 50, 7)
    pre2, post2 = bd.generate(FT63, bd.CODE3, 50, 7)
    pre3, _ = bd.generate(FT63, bd.CODE3, 50, 8)
    for a, b in zip(pre1 + post1, pre2 + post2):
        assert np.array_equal(a.col_ptr, b.col_ptr)
        assert np.array_equal(a.row_idx, b.row_idx)
        assert a.vals == b.vals
    assert pre1[0].vals != pre3[0].vals


def test_encode_device_vs_host():
    spec = FT63
    enc = bd.SdigEncoding(spec, 50, seed=3)
    ops = get_ops(spec)
    rng = random.Random(11)
    rows = [[rng.randrange(spec.p) for _ in range(50)] for _ in range(3)]
    x = np.stack([ops.encode_host(r) for r in rows], axis=1)  # (W, 3, 50)
    got = enc.encode_rows(np.asarray(x))
    for r in range(3):
        want = enc.encode_row_host(rows[r])
        assert ops.decode_host(got[:, r, :]) == want, r
    # systematic: first n_per_row symbols are the input
    assert ops.decode_host(got[:, 0, :50]) == rows[0]


def test_encode_host_matches_python_spec_structure():
    # codeword length bookkeeping (encode.rs:18-33)
    spec = FT63
    enc = bd.SdigEncoding(spec, 50, seed=0)
    assert enc.n_cols == bd.codeword_length(enc.precodes, enc.postcodes)
    assert enc.n_cols > 50


@pytest.fixture(scope="module")
def e2e_setup():
    spec = FT63
    rng = random.Random(42)
    length = 4000
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    enc = bd.SdigEncoding.new(spec, length, seed=0)
    return spec, coeffs, enc


def _preamble(enc, root):
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    return tr


def test_e2e_brakedown(e2e_setup):
    spec, coeffs, enc = e2e_setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    assert comm.n_rows == 2  # chosen by the proof-size argmin

    x = random.Random(1).randrange(spec.p)
    inner = [pow(x, i, spec.p) for i in range(comm.n_per_row)]
    xr = (x * inner[-1]) % spec.p
    outer = [pow(xr, i, spec.p) for i in range(comm.n_rows)]

    pf = comm.prove(outer, _preamble(enc, root))
    got = pf.verify(root, outer, inner, enc, _preamble(enc, root))
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    assert got == want


def test_brakedown_device_matches_twin(e2e_setup):
    spec, coeffs, enc = e2e_setup
    dev = protocol.commit(coeffs, enc)
    srl = ref.ref_commit(coeffs, enc)
    assert dev.get_root() == srl.get_root()

    x = random.Random(2).randrange(spec.p)
    inner = [pow(x, i, spec.p) for i in range(dev.n_per_row)]
    xr = (x * inner[-1]) % spec.p
    outer = [pow(xr, i, spec.p) for i in range(dev.n_rows)]

    pf_dev = dev.prove(outer, _preamble(enc, dev.get_root()))
    pf_srl = ref.ref_prove(srl, outer, enc, _preamble(enc, srl.get_root()))
    assert pf_dev.p_eval == pf_srl.p_eval
    assert pf_dev.p_random_vec == pf_srl.p_random_vec
    ops = get_ops(spec)
    # spot-check a handful of the (many) opened columns
    for k in range(0, len(pf_dev.columns), 997):
        assert ops.decode_host(pf_dev.columns[k].col_mont) == pf_srl.columns[k].col
        assert pf_dev.columns[k].path == pf_srl.columns[k].path


def test_gen_code_native_matches_python_twin():
    """The C sampler must consume the ChaCha stream exactly like the Python
    twin: same columns, same Montgomery value limbs, across both gen_code
    calls sharing one per-level stream (matgen.rs:43-49)."""
    import ctypes

    import numpy as np

    from lcpc_tpu.encodings import brakedown as bd
    from lcpc_tpu.fs.chacha import ChaCha20Rng
    from lcpc_tpu.utils import native as _native
    from lcpc_tpu.fields import FT63, FT255

    lib = _native.get_lib()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")

    for spec, n, m, d, n2, m2, d2 in [
        (FT63, 37, 120, 5, 11, 40, 7),
        (FT255, 23, 64, 4, 9, 30, 3),
    ]:
        rng = ChaCha20Rng.seed_from_u64(1234)
        rng.set_stream(5)
        py_a = bd.gen_code(spec, n, m, d, rng)
        py_b = bd.gen_code(spec, n2, m2, d2, rng)

        key = np.frombuffer(
            ChaCha20Rng.seed_from_u64(1234).key.tobytes(), dtype=np.uint8
        ).copy()
        st = ctypes.create_string_buffer(_native.RNG_STATE_BYTES)
        lib.lcpc_rng_init(st, key.ctypes.data, ctypes.c_uint64(5))
        c_a = bd.gen_code_native(lib, st, spec, n, m, d)
        c_b = bd.gen_code_native(lib, st, spec, n2, m2, d2)

        for py, c in ((py_a, c_a), (py_b, c_b)):
            assert np.array_equal(py.row_idx, c.row_idx)
            assert np.array_equal(py.vals_mont, c.vals_mont)
            assert np.array_equal(py.col_ptr, c.col_ptr)
