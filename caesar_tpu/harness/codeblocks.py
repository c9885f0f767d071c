"""Fenced-code-block extraction from model responses.

Plays the role of the reference's external `extract_last_code(response,
["python", "cpp"])` (KernelBenchInternal, used at state_machine.py:252):
returns the LAST fenced code block whose language tag is in the accepted set
(or untagged), with the fence stripped, else None.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

_FENCE_RE = re.compile(
    r"```([A-Za-z0-9_+-]*)[ \t]*\r?\n(.*?)```",
    re.DOTALL,
)


def extract_last_code(
    response: str, languages: Sequence[str] = ("python", "cpp")
) -> Optional[str]:
    """Extract the last acceptable fenced code block from `response`."""
    if not response:
        return None
    accepted = {lang.lower() for lang in languages}
    last: Optional[str] = None
    for match in _FENCE_RE.finditer(response):
        tag = match.group(1).strip().lower()
        if tag == "" or tag in accepted:
            last = match.group(2)
    if last is None:
        return None
    return last.strip("\n")
