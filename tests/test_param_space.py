"""Parameter-space e2e coverage (VERDICT r2 item 6).

The reference exercises all six SDIG codespecs (lcpc-brakedown-pc/src/
codespec.rs:169-232), the high-rate Ligero features `isz`/`hlf`
(lcpc-ligero-pc/src/tests.rs:59-69, lib.rs:61-64), and benches the 127-bit
field end to end (doc/benchmark-results/20210723_32core_127-255bit.txt).
These tests drive the full protocol through those corners:

- FT127 and FT191 commit->prove->verify (FT127 flips n_degree_tests to >= 2
  at small n_cols — a different FS path than FT63/FT255's single test);
- CODE1 and CODE6 (the extreme codespec rows: 13265 / 3755 column opens);
- high-rate Ligero rho=39/40 (the `isz` analogue, 7054 opens).
"""

import random

import pytest

from lcpc_tpu.core import protocol
from lcpc_tpu.encodings.brakedown import (
    CODE1, CODE2, CODE4, CODE5, CODE6, SdigEncoding,
)
from lcpc_tpu.encodings.ligero import LigeroEncoding
from lcpc_tpu.fields import FT63, FT127, FT191
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.utils.tensors import univariate_eval, univariate_tensors


def _preamble(enc, root):
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    return tr


def _uni_e2e(spec, enc, length, seed):
    rng = random.Random(seed)
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    comm = protocol.commit(coeffs, enc)
    root = comm.get_root()
    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, comm.n_per_row, comm.n_rows)
    pf = comm.prove(outer, _preamble(enc, root))
    got = protocol.verify(root, outer, inner, pf, enc, _preamble(enc, root))
    assert got == univariate_eval(spec, coeffs, x)
    return comm, pf


@pytest.mark.parametrize("spec,length,seed", [
    (FT127, 700, 1271), (FT191, 600, 1911),
], ids=["ft127", "ft191"])
def test_mid_field_ligero_e2e(spec, length, seed):
    enc = LigeroEncoding.new(spec, length, rho_num=1, rho_den=4)
    if spec is FT127:
        # the small-field FS path: several degree tests per proof
        # (n_degree_tests = ceil(128 / (flog2 - log2 n_cols)), lib.rs:613-616)
        assert enc.get_n_degree_tests() >= 2
    comm, pf = _uni_e2e(spec, enc, length, seed)
    assert pf.n_degree_rows() == enc.get_n_degree_tests()


@pytest.mark.parametrize("spec,length,seed", [
    (FT127, 500, 2127),
], ids=["ft127"])
def test_mid_field_brakedown_e2e(spec, length, seed):
    enc = SdigEncoding.new(spec, length, seed=0)
    _uni_e2e(spec, enc, length, seed)


@pytest.mark.parametrize("code,n_opens", [
    (CODE1, 13265), (CODE6, 3755),
], ids=["code1", "code6"])
def test_codespec_extremes_e2e(code, n_opens):
    # CODE1 is the densest/most-opened row, CODE6 the sparsest; a dims or
    # density bug in the non-default rows would be invisible to CODE3-only
    # tests (codespec.rs:169-232 entropy formulas differ per row)
    spec = FT63
    length = 900
    enc = SdigEncoding.new(spec, length, seed=0, code=code)
    assert enc.get_n_col_opens() == n_opens
    # the generated ladder must satisfy the density formulas' row bounds
    for m, d in [(enc.precodes, "pre"), (enc.postcodes, "post")]:
        for lvl in m:
            assert lvl.n_out >= 1 and lvl.n_in >= 1
    _uni_e2e(spec, enc, length, seed=3001)


@pytest.mark.parametrize("code", [CODE2, CODE4, CODE5],
                         ids=["code2", "code4", "code5"])
def test_codespec_middle_rows_encode_twin(code):
    # the remaining codespec rows (codespec.rs:181-219): cheap device-vs-host
    # encode equality so a density/dims bug in ANY row is visible, without
    # paying three more full e2e runs (CODE1/CODE6 cover the e2e extremes)
    import numpy as np

    from lcpc_tpu.ops.limbs import get_ops

    spec = FT63
    enc = SdigEncoding.new(spec, 700, seed=0, code=code)
    ops = get_ops(spec)
    rng = random.Random(code.an * 1000 + code.bn)
    rows = [[rng.randrange(spec.p) for _ in range(enc.n_per_row)]
            for _ in range(2)]
    x = np.stack([ops.encode_host(r) for r in rows], axis=1)
    got = enc.encode_rows(np.asarray(x))
    for r, row in enumerate(rows):
        assert ops.decode_host(got[:, r, :]) == enc.encode_row_host(row), r


def test_high_rate_ligero_e2e():
    # rho = 39/40: the reference's `isz` high-rate configuration analogue
    # (lcpc-ligero-pc/src/lib.rs:61-64); 7054 column opens
    spec = FT63
    length = 2000
    enc = LigeroEncoding.new(spec, length, rho_num=39, rho_den=40)
    assert enc.get_n_col_opens() == 7054
    _uni_e2e(spec, enc, length, seed=4001)


def test_high_rate_isz_opens():
    # the exact `isz` feature rate (rho = 38/39, tests.rs:59-64)
    assert LigeroEncoding.n_col_opens_static(38, 39) == 6876


def test_flops_counts():
    # utilization counters (utils/flops.py): NTT butterfly count and the
    # expander nnz count must match first-principles recomputation
    from lcpc_tpu.utils import flops
    from lcpc_tpu.encodings.brakedown import SdigEncoding

    enc = LigeroEncoding.new_from_dims(FT63, 64, 256)
    assert flops.ligero_encode_modmuls(enc, 3) == 3 * 128 * 8
    senc = SdigEncoding(FT63, 600, 0)
    nnz = sum(m.row_idx.shape[0] for m in senc.precodes + senc.postcodes)
    nb = senc.precodes[-1].n_out
    rs = senc.postcodes[-1].n_in
    assert flops.sdig_encode_modmuls(senc, 2) == 2 * (nnz + nb * rs)
    ndt = enc.get_n_degree_tests()
    assert flops.prove_modmuls(enc, 5, 64) == (ndt + 1) * 5 * 64
    line = flops.util_line("commit", 13, 10_000_000, 0.01, "ft63")
    assert line.startswith("#util 13: commit mmul=10000000 ")
    assert "vs_vpu_peak=" in line
