"""Behavior-drift guard: a pinned digest of the kernel's outputs over the
deterministic synthetic corpus (seed 42, 120 convs x 5 turns).

The golden fixtures pin the reference-exercised paths; this digest pins
EVERYTHING the synthetic generator covers (all SURVEY §2 Part A operators,
planted keys in every split). If a future optimization changes any output
byte anywhere in the corpus, this fails before the (slower) differential
fuzz would catch it.

Snapshot provenance: first computed at commit 22f3684 (round 1), after the
golden fixtures, 36 quirk tests, and 3000-example bulk-vs-per-byte
differential fuzz all passed — i.e. the digest encodes behavior already
cross-validated against the reference where ground truth exists. If a
deliberate semantic fix changes outputs, re-verify the golden fixtures,
then update the digest with the recipe below.
"""

import hashlib

from rtfproc_spark.kernel import ReplacementSet, RTFEngine
from rtfproc_spark.sources.transcripts import (
    DEFAULT_REPLACEMENTS,
    synthesize_transcripts_pdf,
)

SNAPSHOT = "223534ca18fcd247192c5c50b6e2bdf9101402580fc740e5931603e1685dc89c"


def corpus_digest() -> str:
    pdf = synthesize_transcripts_pdf(n_convs=120, turns_per_conv=5)
    rs = ReplacementSet(DEFAULT_REPLACEMENTS)
    eng = RTFEngine(rs)
    h = hashlib.sha256()
    for t in pdf.sort_values(["conv_id", "turn_idx"])["text"]:
        rtf, plain, err = eng.run(t.encode("utf-8"))
        h.update(rtf)
        h.update(b"\x00")
        h.update(plain)
        h.update(b"\x01")
        h.update(str(err).encode())
        h.update(b"\x02")
    return h.hexdigest()


def test_corpus_snapshot():
    # To regenerate after a DELIBERATE semantic change (update this file):
    #   python -c "from tests.test_corpus_snapshot import corpus_digest; print(corpus_digest())"
    assert corpus_digest() == SNAPSHOT
