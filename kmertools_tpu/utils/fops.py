"""File helpers mirroring ktio/src/fops.rs:3-25."""

from __future__ import annotations

import os


def delete_file_if_exists(path: str) -> None:
    if os.path.exists(path):
        os.remove(path)


def create_directory(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def load_lines_sorted(path: str) -> list[str]:
    """Trimmed, sorted lines (ktio/src/fops.rs:15-25 semantics: the
    whole text and each line are trimmed before comparison)."""
    with open(path) as f:
        text = f.read().strip()
    if not text:
        return []
    return sorted(line.strip() for line in text.split("\n"))
