"""lcpc_tpu: a TPU-native linear-code polynomial commitment framework.

Reimplements the full capabilities of the Rust `lcpc` reference (the 2-D
commitment of eprint 2021/1043 over pluggable linear codes) with a
TPU-first architecture: uint32 limb field arithmetic and BLAKE3 hashing as
fused XLA/VPU graphs, MXU int8-convolution NTTs, shard_map meshes for
multi-chip scaling, and a C host runtime for the sequential Fiat-Shamir
transcript.  See SURVEY.md for the reference analysis and PARITY.md for the
component-by-component mapping.

Quick start:

    from lcpc_tpu import LigeroEncoding, commit, Transcript, FT255
    enc = LigeroEncoding.new(FT255, len(coeffs))
    com = commit(coeffs, enc)
    tr = Transcript(b"my protocol")
    tr.append_message(b"polycommit", com.get_root())
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    proof = com.prove(outer_tensor, tr)
"""

from .fields import FT63, FT127, FT191, FT255, ALL_FIELDS, FieldSpec
from .core.protocol import (
    LcCommit,
    LcEvalProof,
    ProverError,
    VerifierError,
    commit,
    prove,
    verify,
)
from .core import wire
from .core.encoding import LcEncoding
from .encodings.ligero import LigeroEncoding
from .encodings.brakedown import (
    SdigEncoding,
    CODE1,
    CODE2,
    CODE3,
    CODE4,
    CODE5,
    CODE6,
)
from .fs.merlin import Transcript
from .utils.tensors import (
    multilinear_eval,
    multilinear_tensors,
    univariate_eval,
    univariate_tensors,
)

__all__ = [
    "FT63", "FT127", "FT191", "FT255", "ALL_FIELDS", "FieldSpec",
    "LcCommit", "LcEvalProof", "LcEncoding", "ProverError", "VerifierError",
    "commit", "prove", "verify", "wire",
    "LigeroEncoding", "SdigEncoding",
    "CODE1", "CODE2", "CODE3", "CODE4", "CODE5", "CODE6",
    "Transcript",
    "univariate_tensors", "univariate_eval",
    "multilinear_tensors", "multilinear_eval",
]
