"""File helpers mirroring ktio/src/fops.rs:3-25."""

from __future__ import annotations

import os


def delete_file_if_exists(path: str) -> None:
    if os.path.exists(path):
        os.remove(path)


def create_directory(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def load_lines_sorted(path: str) -> list[str]:
    with open(path) as f:
        return sorted(line.rstrip("\n") for line in f if line.strip())
