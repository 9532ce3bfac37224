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


def test_spark_submit_py_files(tmp_path):
    """The north rule's literal deployment path: a REAL spark-submit with
    the package shipped ONLY via --py-files (no repo on sys.path), UDFs
    running on executor workers from the zip."""
    import os
    import subprocess
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "rtfproc_spark_pkg.zip")
    pkg = os.path.join(repo, "rtfproc_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the only source
    }
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            os.path.join(repo, "examples", "submit_smoke.py"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # not the repo: imports must come from the zip
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SUBMIT_SMOKE_OK" in r.stdout, r.stdout[-2000:]
