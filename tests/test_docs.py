"""Docs stay honest: no hand-synced test counts.

Two consecutive round reviews caught the documented test count drifting
from reality (290/245 in the docs vs 303/257 collected).  Hand-synced
numbers always lose that race, so the docs no longer state exact counts
— and this guard fails the suite if someone writes one back in.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Phrases that smell like a hand-synced suite size.  Deliberately narrow:
# "134 tests" / "134 test files" / "tests (134)" / "134 collected" trip it;
# prose like "the tests" or versioned numbers don't.
_PATTERNS = [
    re.compile(r"\b\d+\s+tests?\b", re.IGNORECASE),
    re.compile(r"\b\d+\s+collected\b", re.IGNORECASE),
    re.compile(r"\btests?\s*\(\s*\d+\s*\)", re.IGNORECASE),
]

_DOCS = ["README.md", "README.ru.md", "AGENTS.md", "Makefile"]


def test_no_hand_synced_test_counts():
    offenders = []
    for name in _DOCS:
        text = (REPO / name).read_text(encoding="utf-8")
        for lineno, line in enumerate(text.splitlines(), 1):
            for pat in _PATTERNS:
                m = pat.search(line)
                if m:
                    offenders.append(f"{name}:{lineno}: {m.group(0)!r}")
    assert not offenders, (
        "hand-synced test counts found (they WILL drift — describe the "
        "suite without exact numbers):\n" + "\n".join(offenders))
