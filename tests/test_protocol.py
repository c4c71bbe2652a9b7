"""End-to-end protocol tests: device path vs serial twin, evaluation
correctness, transcript continuity, tamper rejection.

Mirrors the reference's e2e choreography (lcpc-ligero-pc/src/tests.rs:216-312)
including the transcript preamble and the univariate tensor convention.
"""

import random

import pytest

from lcpc_tpu.core import protocol
from lcpc_tpu.core import reference_impl as ref
from lcpc_tpu.encodings.ligero import LigeroEncoding
from lcpc_tpu.fields import FT63
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.fs.chacha import ChaCha20Rng


def _tensors_for_eval(spec, x, n_per_row, n_rows):
    inner = [pow(x, i, spec.p) for i in range(n_per_row)]
    xr = (x * inner[-1]) % spec.p
    outer = [pow(xr, i, spec.p) for i in range(n_rows)]
    return inner, outer


def _preamble(enc, root):
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    return tr


@pytest.fixture(scope="module")
def setup():
    spec = FT63
    rng = random.Random(99)
    length = 300
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    enc = LigeroEncoding.new(spec, length)
    return spec, coeffs, enc


def test_end_to_end_device(setup):
    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()

    x = random.Random(3).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, comm.n_per_row, comm.n_rows)

    tr1 = _preamble(enc, root)
    pf = comm.prove(outer, tr1)

    tr2 = _preamble(enc, root)
    enc2 = LigeroEncoding.new_from_dims(spec, pf.get_n_per_row(), pf.get_n_cols())
    got = pf.verify(root, outer, inner, enc2, tr2)

    # the verified evaluation equals the polynomial evaluated at x
    want = 0
    for i, c in enumerate(coeffs):
        want = (want + c * pow(x, i, spec.p)) % spec.p
    assert got == want


def test_device_matches_serial_twin(setup):
    spec, coeffs, enc = setup
    dev = protocol.commit(coeffs, enc)
    srl = ref.ref_commit(coeffs, enc)

    assert dev.get_root() == srl.get_root()
    assert [bytes(h) for h in dev.hashes] == srl.hashes

    x = random.Random(4).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, dev.n_per_row, dev.n_rows)

    pf_dev = dev.prove(outer, _preamble(enc, dev.get_root()))
    pf_srl = ref.ref_prove(srl, outer, enc, _preamble(enc, srl.get_root()))

    assert pf_dev.p_eval == pf_srl.p_eval
    assert pf_dev.p_random_vec == pf_srl.p_random_vec
    assert len(pf_dev.columns) == len(pf_srl.columns)
    from lcpc_tpu.ops.limbs import get_ops

    ops = get_ops(spec)
    for cd, cs in zip(pf_dev.columns, pf_srl.columns):
        assert ops.decode_host(cd.col_mont) == cs.col
        assert cd.path == cs.path

    got_srl = ref.ref_verify(
        srl.get_root(), outer, inner, pf_srl, enc, _preamble(enc, srl.get_root())
    )
    got_dev = pf_dev.verify(
        dev.get_root(), outer, inner, enc, _preamble(enc, dev.get_root())
    )
    assert got_dev == got_srl


def test_transcript_continuity(setup):
    # two proofs over one transcript leave prover and verifier in identical
    # states (tests.rs:324-420)
    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    x = random.Random(5).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, comm.n_per_row, comm.n_rows)

    tr1 = _preamble(enc, root)
    pf = comm.prove(outer, tr1)
    chal_prover = tr1.challenge_bytes(b"ligero-pc//challenge", 32)

    tr2 = _preamble(enc, root)
    pf.verify(root, outer, inner, enc, tr2)
    chal_verifier = tr2.challenge_bytes(b"ligero-pc//challenge", 32)
    assert chal_prover == chal_verifier


def test_tamper_rejection(setup):
    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    x = random.Random(6).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, comm.n_per_row, comm.n_rows)

    pf = comm.prove(outer, _preamble(enc, root))
    # corrupt one column element
    pf.columns[0].col_mont = pf.columns[0].col_mont.copy()
    pf.columns[0].col_mont[0, 0] ^= 1
    with pytest.raises(protocol.VerifierError):
        pf.verify(root, outer, inner, enc, _preamble(enc, root))

    # wrong evaluation point fails the eval dot product
    pf2 = comm.prove(outer, _preamble(enc, root))
    bad_outer = list(outer)
    bad_outer[0] = (bad_outer[0] + 1) % spec.p
    with pytest.raises(protocol.VerifierError):
        pf2.verify(root, bad_outer, inner, enc, _preamble(enc, root))


def test_malformed_proof_typed_errors(setup):
    """Structurally invalid proofs raise typed VerifierErrors, never
    IndexError/ValueError (reference error kinds, lcpc-2d/src/lib.rs:136-166)."""
    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    x = random.Random(8).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, comm.n_per_row, comm.n_rows)

    def fresh_proof():
        return comm.prove(outer, _preamble(enc, root))

    import copy

    def expect(kind, mutate):
        pf = fresh_proof()
        pf.columns = [
            protocol.LcColumn(col_mont=c.col_mont.copy(), path=list(c.path))
            for c in pf.columns
        ]
        pf.p_random_vec = copy.deepcopy(pf.p_random_vec)
        pf.p_eval = list(pf.p_eval)
        mutate(pf)
        with pytest.raises(protocol.VerifierError) as ei:
            pf.verify(root, outer, inner, enc, _preamble(enc, root))
        assert ei.value.kind == kind, (ei.value.kind, kind)

    # wrong number of opened columns
    expect("NumColOpens", lambda pf: pf.columns.pop())
    # truncated p_random_vec (missing degree test)
    expect("EncodingDims", lambda pf: pf.p_random_vec.pop())
    # truncated p_random row: the reference zero-pads it to n_cols, encodes,
    # and the mismatch surfaces as a degree-test dot-product failure
    # (lib.rs:882-888 + 938-942) — exercised via the host-twin encode path
    expect("ColumnDegree", lambda pf: pf.p_random_vec[0].pop())
    # over-LONG p_random row (> n_cols): the reference's enc.encode rejects
    # it -> VerifierError::Encode
    expect("Encode", lambda pf: pf.p_random_vec[0].extend(
        [1] * (enc.n_cols + 1 - len(pf.p_random_vec[0]))))
    # out-of-field value in p_random
    expect("EncodingDims",
           lambda pf: pf.p_random_vec[0].__setitem__(0, spec.p))
    # out-of-field value in p_eval
    expect("EncodingDims", lambda pf: pf.p_eval.__setitem__(0, spec.p + 1))
    # ragged Merkle path (short)
    expect("ColumnPath", lambda pf: pf.columns[3].path.pop())
    # wrong-length sibling digest
    expect("ColumnPath",
           lambda pf: pf.columns[0].path.__setitem__(0, b"\x00" * 31))
    # column with wrong row count
    expect("ColumnDegree",
           lambda pf: setattr(pf.columns[2], "col_mont",
                              pf.columns[2].col_mont[:, :-1]))
    # truncated p_eval flips n_per_row; the inner-tensor length check fires
    # first (same order as lib.rs:852-854)
    expect("InnerTensor", lambda pf: pf.p_eval.pop())


def test_verifier_error_inner_outer_tensor(setup):
    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    x = random.Random(9).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, comm.n_per_row, comm.n_rows)
    pf = comm.prove(outer, _preamble(enc, root))

    with pytest.raises(protocol.VerifierError) as ei:
        pf.verify(root, outer, inner[:-1], enc, _preamble(enc, root))
    assert ei.value.kind == "InnerTensor"
    with pytest.raises(protocol.VerifierError) as ei:
        pf.verify(root, outer[:-1], inner, enc, _preamble(enc, root))
    assert ei.value.kind == "OuterTensor"


def test_extra_degree_rows_ignored(setup):
    """The reference indexes p_random_vec[0..ndt) and silently ignores any
    extra rows (lib.rs:868-894); verification must still succeed."""
    import copy

    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    x = random.Random(11).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, comm.n_per_row, comm.n_rows)
    pf = comm.prove(outer, _preamble(enc, root))
    pf.p_random_vec = copy.deepcopy(pf.p_random_vec)
    pf.p_random_vec.append([1] * comm.n_per_row)  # extra, must be ignored
    got = pf.verify(root, outer, inner, enc, _preamble(enc, root))
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % spec.p
    assert got == want


def test_adversarial_sibling_dedup_fallback(setup):
    """A proof whose openings disagree about a shared tree position must
    drive verify's by-value dedup fallback AND be rejected (the fast
    position-grouped dedup is only valid when groups are value-consistent;
    protocol.py documents the fallback as adversarial-only)."""
    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    x = random.Random(12).randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, comm.n_per_row, comm.n_rows)
    pf = comm.prove(outer, _preamble(enc, root))
    pf.columns = [
        protocol.LcColumn(col_mont=c.col_mont.copy(), path=list(c.path))
        for c in pf.columns
    ]
    # find two opened columns sharing a top-level sibling position and make
    # their digests disagree there (honest proofs always agree by value)
    lvl = len(pf.columns[0].path) - 1
    tampered = pf.columns[0]
    tampered.path[lvl] = bytes(32)
    before = protocol._dedup_value_fallbacks
    with pytest.raises(protocol.VerifierError) as ei:
        pf.verify(root, outer, inner, enc, _preamble(enc, root))
    assert ei.value.kind == "ColumnPath"
    assert protocol._dedup_value_fallbacks == before + 1, (
        "the value-dedup fallback was not exercised")


def test_prover_error_kinds(setup):
    spec, coeffs, enc = setup
    comm = protocol.commit(coeffs, enc)
    with pytest.raises(protocol.ProverError) as ei:
        comm.prove([1] * (comm.n_rows + 1), _preamble(enc, comm.get_root()))
    assert ei.value.kind == "OuterTensor"
