"""Native C transcript vs pure-Python twin: byte-identical behavior."""

import numpy as np
import pytest

from lcpc_tpu.utils.native import get_lib
from lcpc_tpu.fs.merlin import Strobe128, Transcript, _encode_usize_as_u32


def _python_transcript(label):
    """A Transcript forced onto the Python path."""
    t = Transcript.__new__(Transcript)
    t._lib = None
    t.strobe = Strobe128(b"Merlin v1.0")
    t.append_message(b"dom-sep", label)
    return t


needs_native = pytest.mark.skipif(get_lib() is None, reason="no native lib")


@needs_native
def test_native_lib_builds():
    assert get_lib() is not None


@needs_native
def test_native_matches_python_transcript():
    tn = Transcript(b"test protocol")
    tp = _python_transcript(b"test protocol")
    assert tn._lib is not None, "native path not active"

    msgs = [b"", b"x", b"some data", b"q" * 200, b"r" * 1000]
    for i, m in enumerate(msgs):
        tn.append_message(b"label%d" % i, m)
        tp.append_message(b"label%d" % i, m)
    for n in [1, 32, 64, 200]:
        assert tn.challenge_bytes(b"c", n) == tp.challenge_bytes(b"c", n)

    # batch append path
    rows = np.arange(37 * 8, dtype=np.uint8).reshape(37, 8)
    tn.append_elements(b"$l//PR", rows)
    for i in range(37):
        tp.append_message(b"$l//PR", rows[i].tobytes())
    assert tn.challenge_bytes(b"f", 32) == tp.challenge_bytes(b"f", 32)


@needs_native
def test_native_reproduces_merlin_vector():
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert (
        t.challenge_bytes(b"challenge", 32).hex()
        == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )
