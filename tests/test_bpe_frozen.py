"""Freshness pin for the frozen BPE merge table (text_bpe_apply).

Re-trains the 24 merges from the LIVE sf0.1 documents word-frequency table
with exactly tools/bpe_freeze.py's algorithm and asserts the frozen list in
bpe_frozen.py still matches. If the driver regenerates different document
data, the corpus fingerprint won't match and this test SKIPS with
instructions — the key stays hash-consistent either way (both engines apply
the same frozen merges), it just stops being the live corpus's own fit
until tools/bpe_freeze.py is re-run.

Also pins the replace-application semantics the query's docstring promises:
space-wrapped literal merge application is left-to-right non-overlapping and
continues after the replacement — Python str.replace models both engines.
"""

from __future__ import annotations

import pytest

from swallow_spark.queries import bpe_frozen as M
from tools.bpe_freeze import fingerprint, train, word_freqs

SF01 = "/root/testdata/sf0.1"


def test_frozen_merges_match_live_training():
    freqs = word_freqs(SF01)
    fp = fingerprint(freqs)
    if fp != M.BPE_FIT_FINGERPRINT:
        pytest.skip(
            f"sf0.1 documents regenerated (live fingerprint {fp} != frozen "
            f"{M.BPE_FIT_FINGERPRINT}) — rerun tools/bpe_freeze.py to refresh "
            "bpe_frozen.py; the key stays hash-consistent meanwhile."
        )
    assert train(freqs) == M.BPE_MERGES
    assert len(freqs) == M.BPE_FIT_WORDS


def test_merge_application_is_nonoverlapping_left_to_right():
    # ' a a a a ' with merge (a, a): the first match consumes its trailing
    # space, so the adjacent repeat cannot match in the same pass — the
    # sequential-replace semantics both engines share.
    s = " a a a a "
    out = s.replace(" a a ", " aa ")
    assert out == " aa a a "
    # full-symbol matching: 'ba b' must NOT merge via (a, b) mid-symbol
    s2 = " b a | b "  # word 'ba'? no — symbols b, a | b: pattern ' a b ' absent
    assert s2.replace(" a b ", " ab ") == s2
