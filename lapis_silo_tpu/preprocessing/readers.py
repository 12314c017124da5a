"""Input readers: FASTA (with transparent .zst/.xz decompression), TSV.

Parity with reference src/silo/common/fasta_reader.cpp and
input_stream_wrapper.cpp (which probes <file>, <file>.zst, <file>.xz).
"""

from __future__ import annotations

import csv
import io
import lzma
import os

from ..common import zstd


def open_maybe_compressed(path_no_ext: str, extension: str = ".fasta") -> io.TextIOBase | None:
    """Try <p><ext>, <p><ext>.zst, <p><ext>.xz; None if none exist."""
    base = path_no_ext + extension
    if os.path.exists(base):
        return open(base, encoding="ascii")
    if os.path.exists(base + ".zst"):
        with open(base + ".zst", "rb") as f:
            return io.StringIO(zstd.decompress(f.read()).decode("ascii"))
    if os.path.exists(base + ".xz"):
        with lzma.open(base + ".xz", "rt", encoding="ascii") as f:
            return io.StringIO(f.read())
    return None


def read_fasta(stream: io.TextIOBase) -> dict[str, str]:
    """FASTA -> {key: sequence}. Multi-line sequences are concatenated."""
    result: dict[str, str] = {}
    key: str | None = None
    parts: list[str] = []
    for line in stream:
        line = line.rstrip("\n").rstrip("\r")
        if not line:
            continue
        if line.startswith(">"):
            if key is not None:
                result[key] = "".join(parts)
            key = line[1:].strip()
            parts = []
        else:
            parts.append(line)
    if key is not None:
        result[key] = "".join(parts)
    return result


def read_fasta_file(path_no_ext: str) -> dict[str, str] | None:
    stream = open_maybe_compressed(path_no_ext)
    if stream is None:
        return None
    with stream:
        return read_fasta(stream)


def read_tsv(path: str) -> tuple[list[str], list[dict[str, str]]]:
    """TSV -> (header, rows as dicts of raw strings)."""
    with open(path, encoding="utf-8", newline="") as f:
        reader = csv.reader(f, delimiter="\t")
        header = next(reader)
        rows = []
        for raw in reader:
            if not raw:
                continue
            row = {h: (raw[i] if i < len(raw) else "") for i, h in enumerate(header)}
            rows.append(row)
    return header, rows
