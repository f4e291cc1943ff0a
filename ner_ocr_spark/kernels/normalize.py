"""Shared text normalizer — main-content extraction semantics.

The north rule's boilerplate strip: both branches (text spans and OCR
output) flow through the same normalizer, mirroring the reference's cleanup
guards (/root/reference/src/pipelines/entity.py:89-97 blank/strip filters).

Pure-python here; operators/normalize.py expresses the identical transform
as Spark column expressions (the hot path — JVM-side, codegen'd). Keep the
two in lockstep: tests assert equality over the corpus.
"""

from __future__ import annotations

import re

_BOILER = re.compile(r"\[\[.*?\]\]")
_SPACES = re.compile(r"[ \t]+")
_NL_PAD = re.compile(r" ?\n ?")


def normalize_text(text: str | None) -> str:
    """Strip [[boilerplate]] segments, collapse space runs, trim line and
    outer whitespace. Returns '' for None."""
    if not text:
        return ""
    t = _BOILER.sub("", text)
    t = _SPACES.sub(" ", t)
    t = _NL_PAD.sub("\n", t)
    return t.strip()
