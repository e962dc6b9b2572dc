"""The METEOR jar-diff harness (round-3 VERDICT #7).

The reference's absolute METEOR comes from ``meteor-1.5.jar``
(``/root/reference/eval.py:82-88``); no JVM exists in this environment, so
``tools/meteor_jar_diff.py`` is the instrument that quantifies the
pure-Python scorer's gap the moment one does. These tests pin the
instrument itself: the diff/attribution logic against a stub jar client,
the bundled corpus's coverage, and the graceful no-JVM exit. The live jar
leg auto-skips until java + the jar are present.
"""

import importlib.util
import os
import shutil
import sys

import pytest

# Load the tool by file path under a unique module name. Never put tools/ on
# sys.path: tools/profile.py would shadow the stdlib `profile` module, which
# torch._dynamo reaches via cProfile on the first optimizer construction —
# that shadowing is exactly what poisoned the round-4 full-suite run (every
# torch-dependent test red in one process, green in isolation).
_TOOL_PATH = os.path.join(
    os.path.dirname(__file__), os.pardir, "tools", "meteor_jar_diff.py"
)
_spec = importlib.util.spec_from_file_location("vct_tool_meteor_jar_diff", _TOOL_PATH)
_mod = importlib.util.module_from_spec(_spec)
sys.modules[_spec.name] = _mod
_spec.loader.exec_module(_mod)

FIXTURE_CORPUS = _mod.FIXTURE_CORPUS
_py_score = _mod._py_score
diff_corpus = _mod.diff_corpus
format_report = _mod.format_report
load_corpus = _mod.load_corpus
main = _mod.main
from vct_tpu.evalcap.meteor import Meteor

_METEOR_JAR = os.environ.get("METEOR_JAR", "")


def test_corpus_nonempty_and_well_formed():
    assert len(FIXTURE_CORPUS) >= 20
    for hyp, refs in FIXTURE_CORPUS:
        assert hyp.strip() and hyp == hyp.lower()
        assert refs and all(r.strip() and r == r.lower() for r in refs)


def test_corpus_exercises_all_stages():
    """The corpus must contain segments where the synonym stage changes the
    python score (else the attribution pass can never fire) and segments
    where it does not."""
    meteor = Meteor()
    syn_sensitive = sum(
        abs(_py_score(h, r, meteor._synonyms) - _py_score(h, r, {})) > 1e-4
        for h, r in FIXTURE_CORPUS
    )
    assert 1 <= syn_sensitive < len(FIXTURE_CORPUS)


def test_diff_agreeing_jar_is_all_match():
    """A jar that agrees exactly with the python scorer -> zero deltas."""
    meteor = Meteor()
    report = diff_corpus(
        lambda h, r: _py_score(h, r, meteor._synonyms), FIXTURE_CORPUS
    )
    assert report["n"] == len(FIXTURE_CORPUS)
    assert report["mean_abs_delta"] == pytest.approx(0.0, abs=1e-12)
    assert report["by_label"] == {"match": report["n"]}
    assert "!!" not in format_report(report)


def test_diff_attribution_splits_synonym_vs_alignment():
    """A jar that scores every segment lower by 0.05 must label
    synonym-participating segments 'synonym-table' and the rest
    'alignment/other'; means must reflect the offset."""
    meteor = Meteor()

    def jar(h, r):
        return max(_py_score(h, r, meteor._synonyms) - 0.05, 0.0)

    report = diff_corpus(jar, FIXTURE_CORPUS)
    assert report["by_label"].get("match", 0) <= 2  # zero-score segments only
    assert report["by_label"].get("synonym-table", 0) >= 1
    assert report["by_label"].get("alignment/other", 0) >= 1
    assert report["mean_delta"] == pytest.approx(
        report["mean_py"] - report["mean_jar"])
    assert report["max_abs_delta"] <= 0.05 + 1e-9
    text = format_report(report)
    assert "alignment/other" in text or "!!" in text
    assert "worst segment" in text


def test_diff_rows_carry_per_segment_scores():
    report = diff_corpus(lambda h, r: 0.0, FIXTURE_CORPUS[:3])
    assert len(report["rows"]) == 3
    for row in report["rows"]:
        assert row["jar"] == 0.0
        assert row["delta"] == pytest.approx(row["py"])


def test_load_corpus_json(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('[{"hyp": "a dog", "refs": ["a dog", "the dog"]}]')
    assert load_corpus(str(p)) == [("a dog", ["a dog", "the dog"])]
    assert load_corpus(None) is FIXTURE_CORPUS


def test_main_without_jvm_exits_2(tmp_path, capsys):
    """No JVM / no jar -> exit 2 with an explicit message, never a crash."""
    rc = main(["--java", str(tmp_path / "definitely-not-java")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "cannot run the live diff" in err
    assert "no JVM" in err and "no --jar" in err


@pytest.mark.skipif(
    shutil.which("java") is None or not os.path.exists(_METEOR_JAR),
    reason="live jar diff needs a JVM and METEOR_JAR pointing at meteor-1.5.jar",
)
def test_live_jar_diff():
    """The real thing: bounded corpus-mean gap vs meteor-1.5.jar, and zero
    'alignment/other' segments (formulation must match; only the synonym
    table is allowed to differ)."""
    from meteor_jar_diff import JarMeteor

    jar = JarMeteor(_METEOR_JAR)
    try:
        report = diff_corpus(jar.score, FIXTURE_CORPUS)
    finally:
        jar.close()
    assert report["by_label"].get("alignment/other", 0) == 0
    assert abs(report["mean_delta"]) < 0.03
