"""create_data.py list building (CN-Celeb layout conventions)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns interpreters: excluded from fast tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_create_data_lists(tmp_path):
    # fake CN-Celeb: 3 speakers; CN-Celeb2: 2 speakers
    cn1 = tmp_path / "cn1" / "data"
    cn2 = tmp_path / "cn2" / "data"
    for d, spks, utts in ((cn1, ["id00", "id01", "id02"], 2),
                          (cn2, ["spk0", "spk1"], 3)):
        for s in spks:
            (d / s).mkdir(parents=True)
            for u in range(utts):
                (d / s / f"u{u}.flac").write_bytes(b"x")
    out = tmp_path / "train_list.txt"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "create_data.py"),
         f"--cn_celeb_dir={cn1}", f"--cn_celeb2_dir={cn2}",
         f"--list_path={out}"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 3 * 2 + 2 * 3
    labels = sorted({int(l.split("\t")[1]) for l in lines})
    # CN-Celeb speakers get 0..2; CN-Celeb2 offset by 800
    assert labels == [0, 1, 2, 800, 801]


def test_cli_help_screens():
    for script in ("train.py", "eval.py", "extract_features.py",
                   "infer_contrast.py", "infer_speaker_diarization.py"):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, script), "--help"],
            capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, f"{script}: {r.stderr[-500:]}"
        assert "--configs" in r.stdout
