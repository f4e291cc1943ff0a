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
# same explicit edge class as operators/normalize.EDGE_WS: str.strip() with
# no args strips unicode whitespace (\xa0 etc) that Java/RE2 \s-style
# classes never match — the pinned class keeps the twins byte-identical
_EDGE = re.compile(r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$")


def normalize_text(text: str | None) -> str:
    """Strip [[boilerplate]] segments, collapse space runs, trim line and
    outer whitespace. Returns '' for None."""
    if not text:
        return ""
    t = _BOILER.sub("", text)
    t = _SPACES.sub(" ", t)
    t = _NL_PAD.sub("\n", t)
    return _EDGE.sub("", t)
