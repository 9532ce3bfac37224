"""A29 entry point 2: rtfprocess callback mode (rtfproc.c:309-332)."""

from rtfproc_spark.kernel import RTFEngine, empty_replacements


def test_callback_rtf2txt_matches_strip():
    # the reference README's rtf->text converter: drain txt each step
    data = open("/root/reference/test/letter-input.rtf", "rb").read()
    chunks = []

    def rtf2txt(R, event):
        if R.txt:
            chunks.append(bytes(R.txt))
            R.txt.clear()
            R.raw.clear()

    eng = RTFEngine(empty_replacements())
    assert eng.process(data, rtf2txt) is None
    want = RTFEngine(empty_replacements()).run(data)[1]
    assert b"".join(chunks) == want


def test_callback_event_sequence():
    events = []

    def spy(R, ev):
        events.append(ev)

    eng = RTFEngine(empty_replacements())
    eng.process(b"{ab}", spy)
    # START, one STEP per dispatched token ({, a, b, }), END
    assert events[0] == RTFEngine.PROC_START
    assert events[-1] == RTFEngine.PROC_END
    assert events[1:-1] == [RTFEngine.PROC_STEP] * 4


def test_callback_fatalerr_fires_end():
    events = []
    eng = RTFEngine(empty_replacements())
    err = eng.process(b"ab\\", lambda R, ev: events.append(ev))
    assert err is not None
    assert events[-1] == RTFEngine.PROC_END
