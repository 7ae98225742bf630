"""Heading-normalization rule generation and guarded application."""

from ebook_ocr_ray.functions.bookparse import (
    match_toc_to_headings,
    parse_document,
    parse_toc_entry,
    split_structure_prefix,
)
from ebook_ocr_ray.functions.headrules import (
    Rule,
    apply_rules,
    generate_rules,
    level_from_number,
    normalize_headings,
)


class TestLevelConvention:
    def test_trailing_zero_rule(self):
        assert level_from_number("1") == 1
        assert level_from_number("1.0.0") == 1       # "1.0.0" is a chapter
        assert level_from_number("2.3") == 2
        assert level_from_number("2.3.0") == 2
        assert level_from_number("1.2.3") == 3
        assert level_from_number("1.2.3.4.5") == 3   # clamp

    def test_structure_prefix_split(self):
        assert split_structure_prefix("Chapter 2 Intro") == ("2", "Intro")
        assert split_structure_prefix("2.1 Foo") == ("2.1", "Foo")
        assert split_structure_prefix("Plain title") == ("", "Plain title")


class TestRuleGeneration:
    def _doc(self, body_heading: str):
        md = "\n".join(
            [
                "<!-- toc -->",
                "Chapter 1 Alpha ... 2",
                "<!-- /toc -->",
                body_heading,
                "content.",
            ]
        )
        doc = parse_document(md)
        match_toc_to_headings(doc.toc, doc.headings)
        return md, doc

    def test_add_number(self):
        md, doc = self._doc("# Alpha")
        rules = generate_rules(md.split("\n"), doc.toc, doc.headings)
        assert len(rules) == 1 and rules[0].kind == "ADD_NUMBER"
        assert rules[0].new == "# 1 Alpha"

    def test_fix_number(self):
        md, doc = self._doc("# 2 Alpha")
        rules = generate_rules(md.split("\n"), doc.toc, doc.headings)
        assert rules and rules[0].kind == "FIX_NUMBER" and rules[0].new == "# 1 Alpha"

    def test_fix_level(self):
        md, doc = self._doc("### 1 Alpha")
        rules = generate_rules(md.split("\n"), doc.toc, doc.headings)
        assert rules and rules[0].kind == "FIX_LEVEL" and rules[0].new == "# 1 Alpha"

    def test_no_rule_when_already_normal(self):
        md, doc = self._doc("# 1 Alpha")
        assert generate_rules(md.split("\n"), doc.toc, doc.headings) == []


class TestApply:
    def test_guard_blocks_stale_rule(self):
        md = "# Old heading\nbody."
        stale = Rule("ADD_NUMBER", 0, "# Different content", "# 1 New")
        new_md, applied, skipped = apply_rules(md, [stale])
        assert new_md == md and applied == 0 and skipped == 1

    def test_apply_replaces_exact_line(self):
        md = "# Alpha\nbody."
        rule = Rule("ADD_NUMBER", 0, "# Alpha", "# 1 Alpha")
        new_md, applied, skipped = apply_rules(md, [rule])
        assert new_md.split("\n")[0] == "# 1 Alpha" and applied == 1


class TestEndToEnd:
    def test_denormalized_book_repair(self):
        from ebook_ocr_ray.stages.structural import synth_denormalized_book_md

        md = synth_denormalized_book_md(3, "one two three four five six seven eight")
        new_md, report = normalize_headings(md)
        assert report["n_rules"] == 2 and report["n_applied"] == 2
        assert report["match_rate_pct"] == 100
        assert "\n# 1 Opening\n" in new_md
        assert "\n## 1.1 Detail\n" in new_md
        # idempotent: repaired book needs no further rules
        _, report2 = normalize_headings(new_md)
        assert report2["n_rules"] == 0

    def test_pipeline(self, ray_session):
        from ebook_ocr_ray.stages.structural import heading_repair_pipeline

        out = heading_repair_pipeline("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500
        assert (out.n_rules == 2).all() and (out.n_applied == 2).all()
        assert (out.match_rate_pct == 100).all()


class TestClassification:
    def test_categories(self):
        from ebook_ocr_ray.functions.headrules import classify_heading

        assert classify_heading("Chapter 1 Intro") == "NUMBERED"
        assert classify_heading("2.1 Depth") == "NUMBERED"
        assert classify_heading("第3章 タイトル") == "NUMBERED"
        assert classify_heading("1-2 dashed number") == "NUMBERED"   # normalized first
        assert classify_heading("Plain title") == "UNNUMBERED"
        assert classify_heading("■ Note box") == "SPECIAL"


class TestSedScript:
    def test_emission_and_real_sed_apply(self, tmp_path):
        """The emitted script must actually work under sed(1)."""
        import subprocess

        from ebook_ocr_ray.functions.bookparse import match_toc_to_headings, parse_document
        from ebook_ocr_ray.functions.headrules import generate_rules, generate_sed_script

        md = "\n".join(
            [
                "<!-- toc -->",
                "Chapter 1 Alpha ... 2",
                "<!-- /toc -->",
                "# Alpha",
                "body text.",
            ]
        )
        doc = parse_document(md)
        match_toc_to_headings(doc.toc, doc.headings)
        rules = generate_rules(md.split("\n"), doc.toc, doc.headings)
        script = generate_sed_script(rules)
        assert "4s/" in script and "ADD_NUMBER" in script

        src = tmp_path / "book.md"
        src.write_text(md)
        sed_file = tmp_path / "fix.sed"
        sed_file.write_text(script)
        out = subprocess.run(
            ["sed", "-f", str(sed_file), str(src)], capture_output=True, text=True, check=True
        ).stdout
        assert "\n# 1 Alpha\n" in out

    def test_metacharacters_escaped(self):
        from ebook_ocr_ray.functions.headrules import Rule, generate_sed_script

        script = generate_sed_script([Rule("FORMAT_ONLY", 0, "# a/b.c*d", "# e/f")])
        assert r"\/" in script and r"\." in script and r"\*" in script
