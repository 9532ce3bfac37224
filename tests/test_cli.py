"""CLI round trip — reference entry point 3 (test/letter.c stdin/stdout)."""

import subprocess
import sys
from pathlib import Path

REF = Path("/root/reference/test")
REPO = str(Path(__file__).resolve().parents[1])


def run_cli(args, stdin: bytes = b""):
    return subprocess.run(
        [sys.executable, "-m", "rtfproc_spark", *args],
        input=stdin,
        capture_output=True,
        cwd=REPO,
    )


def test_cli_file_mode_matches_reference(tmp_path):
    out = tmp_path / "out.rtf"
    r = run_cli(
        [
            str(REF / "latepartial-input.rtf"),
            str(out),
            "--replace",
            "JAMES=BOOBEAR",
            "--replace",
            "MEXICAN=LATIN",
            "--replace",
            "ATTORNEY=Maj J. L. Ockert",
            "--replace",
            "TORTLOCATION=Colorado Springs, CO",
        ]
    )
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == (REF / "latepartial-correct.rtf").read_bytes()


def test_cli_stdin_stdout_roundtrip():
    data = (REF / "letter-input.rtf").read_bytes()
    r = run_cli([], stdin=data)  # no replacements -> identity
    assert r.returncode == 0
    assert r.stdout == data


def test_cli_strip():
    r = run_cli(["--strip"], stdin=rb"{\rtf1 Hi \b there\b0 !\par}")
    assert r.returncode == 0
    assert r.stdout == b"Hi there!\n\n"


def test_cli_error_exit():
    r = run_cli([], stdin=b"abc\\")
    assert r.returncode == 1
    assert b"EIO" in r.stderr
