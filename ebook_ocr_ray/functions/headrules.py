"""Self-repair rules for heading normalization.

Re-expresses the reference's normalize-headings subsystem
(/root/reference/src/book_converter/normalization_rules.py:31-138,
src/cli/normalize_headings.py:106-512): from TOC<->heading match results,
generate line-exact guarded edit rules —

- ADD_NUMBER    body heading lacks the TOC entry's number
- FIX_NUMBER    body heading carries a different number
- FIX_LEVEL     markdown level disagrees with the number's implied level
- FORMAT_ONLY   text equal after normalization; only formatting drifts

and apply them with an exact-guard: a rule fires only when the target
line still holds the expected content (the reference's backup-then-apply
discipline, minus in-place mutation — we return a new document).

The number->level convention is the reference's trailing-zero rule
(page_grouper/models.py:22-59): effective parts strip trailing zeros,
level = len(effective parts) clamped to 3 ("1.0.0" is a chapter).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ebook_ocr_ray.functions.bookparse import (
    TocEntry,
    normalize_heading,
    split_structure_prefix,
)
from ebook_ocr_ray.functions.normalize import normalize_heading_number


@dataclass(frozen=True)
class Rule:
    kind: str       # ADD_NUMBER | FIX_NUMBER | FIX_LEVEL | FORMAT_ONLY
    line: int       # 0-based document line
    old: str        # guard: exact current line
    new: str        # replacement line


def level_from_number(number: str) -> int:
    """Trailing-zero convention: '1.0.0' -> level 1, '2.3' -> 2; clamp 3."""
    if not number:
        return 1
    parts = number.split(".")
    while len(parts) > 1 and parts[-1] == "0":
        parts.pop()
    return min(len(parts), 3)


def generate_rules(
    lines: list[str],
    toc: list[TocEntry],
    headings: list[tuple[int, int, str]],
) -> list[Rule]:
    """One rule per matched TOC entry whose body heading needs repair."""
    by_line = {ln: (level, text) for ln, level, text in headings}
    rules: list[Rule] = []
    for entry in toc:
        if entry.matched_line < 0 or entry.matched_line not in by_line:
            continue
        cur_level, cur_text = by_line[entry.matched_line]
        cur_number, cur_title = split_structure_prefix(normalize_heading_number(cur_text))
        want_number = entry.number
        want_level = level_from_number(want_number) if want_number else entry.level
        want_text = f"{want_number} {entry.text}".strip() if want_number else entry.text
        new_line = "#" * want_level + " " + want_text
        old_line = lines[entry.matched_line]
        if new_line == old_line:
            continue
        if want_number and not cur_number:
            kind = "ADD_NUMBER"
        elif want_number and cur_number != want_number:
            kind = "FIX_NUMBER"
        elif cur_level != want_level:
            kind = "FIX_LEVEL"
        elif normalize_heading(cur_title or cur_text) == normalize_heading(entry.text):
            kind = "FORMAT_ONLY"
        else:
            kind = "FORMAT_ONLY"
        rules.append(Rule(kind, entry.matched_line, old_line, new_line))
    return rules


def classify_heading(text: str) -> str:
    """NUMBERED (carries a structure/number prefix) / SPECIAL (decorated
    with ■◆□●◇▲) / UNNUMBERED — the reference's heading-pattern histogram
    categories (heading_normalizer.py:281-352)."""
    from ebook_ocr_ray.functions.normalize import is_special_marker

    if is_special_marker(text):
        return "SPECIAL"
    number, _ = split_structure_prefix(normalize_heading_number(text))
    return "NUMBERED" if number else "UNNUMBERED"


def apply_rules(book_md: str, rules: list[Rule]) -> tuple[str, int, int]:
    """Guarded apply: a rule fires only if its line still matches ``old``.
    Returns (new_md, applied, skipped)."""
    lines = book_md.split("\n")
    applied = skipped = 0
    for rule in rules:
        if 0 <= rule.line < len(lines) and lines[rule.line] == rule.old:
            lines[rule.line] = rule.new
            applied += 1
        else:
            skipped += 1
    return "\n".join(lines), applied, skipped


def generate_sed_script(rules: list[Rule]) -> str:
    """Render rules as a line-addressed sed script (reference
    normalization_rules.py:141-180) — the human-auditable apply artifact:
    ``<line+1>s/<old>/<new>/`` with sed metacharacters escaped. Line
    numbers are 1-based (sed convention); the exact-guard lives in the
    address+pattern pair: a drifted line simply won't match."""

    def esc(s: str) -> str:
        out = []
        for ch in s:
            if ch in r"\/&.^$*[]":
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)

    lines = [f"# {len(rules)} heading normalization rule(s)"]
    for r in rules:
        lines.append(f"# {r.kind}")
        lines.append(f"{r.line + 1}s/^{esc(r.old)}$/{esc(r.new)}/")
    return "\n".join(lines) + "\n"


def normalize_headings(book_md: str) -> tuple[str, dict]:
    """Full cmd_normalize flow for one document: parse -> match -> rules ->
    apply. Returns (repaired_md, report)."""
    from ebook_ocr_ray.functions.bookparse import match_toc_to_headings, parse_document

    doc = parse_document(book_md)
    match_toc_to_headings(doc.toc, doc.headings)
    lines = book_md.split("\n")
    rules = generate_rules(lines, doc.toc, doc.headings)
    new_md, applied, skipped = apply_rules(book_md, rules)
    kinds: dict[str, int] = {}
    for r in rules:
        kinds[r.kind] = kinds.get(r.kind, 0) + 1
    matched = sum(1 for e in doc.toc if e.match_kind != "missing")
    report = {
        "n_toc": len(doc.toc),
        "n_matched": matched,
        "match_rate_pct": int(round(100 * matched / len(doc.toc))) if doc.toc else 100,
        "n_rules": len(rules),
        "n_applied": applied,
        "n_skipped": skipped,
        "kinds": kinds,
    }
    return new_md, report
