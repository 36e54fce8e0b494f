"""Smoke tests: the runnable examples must stay runnable."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(script: str) -> str:
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_reindex_example():
    stdout = _run("reindex_pipeline.py")
    assert "indexed=" in stdout and "quarantined=" in stdout


def test_training_corpus_example():
    stdout = _run("training_corpus_pipeline.py")
    assert "train" in stdout and "test" in stdout


def test_embedding_quality_example():
    stdout = _run("embedding_quality_pipeline.py")
    assert "semantic_dups=" in stdout
    assert "label_suspects=" in stdout
    assert "truncated_recall=" in stdout
