"""Quantify vct_tpu's pure-Python METEOR against the real ``meteor-1.5.jar``.

The reference scores METEOR by shelling into the Java jar
(``/root/reference/eval.py:82-88``); vct_tpu re-implements the METEOR 1.5
scoring model in ``vct_tpu/evalcap/meteor.py`` with a bundled synonym table
standing in for WordNet. This harness runs BOTH scorers over a fixture
corpus and reports the gap — per-sentence deltas, corpus means, and an
attribution pass that re-scores with the synonym stage disabled so each
delta is labeled either "synonym-table" (the known resource gap) or
"alignment/other" (a formulation bug worth fixing).

No JVM or jar ships in this environment, so the harness degrades
explicitly: without ``java`` (or without ``--jar``) it prints what is
missing and exits 2. ``tests/test_meteor_jar_diff.py`` exercises the diff
logic against a stub jar client and skips the live leg until a JVM exists —
the moment one does, the gap is one command away:

    python tools/meteor_jar_diff.py --jar /path/to/meteor-1.5.jar

The jar is driven over its documented ``-stdio`` protocol (the same one the
reference's pycocoevalcap wrapper uses): one ``SCORE ||| ref1 ||| ... |||
hyp`` line per segment returns a stats vector, and ``EVAL ||| stats``
returns the sentence score. Scoring is per-reference with a max, matching
``Meteor.compute_score``'s max-over-references aggregation.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
from typing import Dict, List, Optional, Sequence, Tuple

import os

# Repo root (for `vct_tpu`) — appended, not prepended, so nothing at the repo
# root can ever shadow stdlib/site-packages for whoever imports this module.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.append(_REPO_ROOT)

from vct_tpu.evalcap.meteor import Meteor, score_pair  # noqa: E402

# Caption-domain fixture corpus: (hypothesis, [references]).
# Chosen to exercise every scoring stage the two implementations could
# disagree on: exact-only matches, stem matches, synonym matches (both
# table-covered and WordNet-only pairs), fragmentation, function-word
# weighting, and max-over-references selection.
FIXTURE_CORPUS: List[Tuple[str, List[str]]] = [
    # exact matches only — any delta here is a formulation bug
    ("a man is riding a horse", ["a man is riding a horse"]),
    ("a dog runs in the park", ["a dog is running in a park"]),
    ("two people are talking", ["two people talk to each other"]),
    ("a woman slices an onion", ["a woman is slicing an onion in a kitchen"]),
    ("the cat sits on the mat", ["a cat is sitting on a mat"]),
    # stem-stage matches (riding/rides, slicing/sliced ...)
    ("a man rides a horse", ["a man is riding his horse"]),
    ("a chef cooking food", ["a chef cooks some food"]),
    ("children playing soccer", ["two children play soccer outside"]),
    ("a girl dancing on stage", ["a girl dances on the stage"]),
    # synonym-stage matches covered by the bundled table
    ("a large dog jumps", ["a big dog is jumping"]),
    ("a small child smiles", ["a little kid is smiling"]),
    ("a fast car on the road", ["a quick car drives down the street"]),
    # synonym pairs WordNet knows but a compact table may not — the
    # expected residual gap lives here
    ("a vehicle moves down the road", ["a car drives down the road"]),
    ("a person chops vegetables", ["a man cuts vegetables"]),
    ("a kid leaps over a fence", ["a child jumps over a fence"]),
    ("an automobile speeds away", ["a car drives away quickly"]),
    # fragmentation / word-order penalties
    ("on a horse rides a man", ["a man rides a horse"]),
    ("park the in runs dog a", ["a dog runs in the park"]),
    # partial / unrelated
    ("a man plays guitar", ["a woman sings a song on stage"]),
    ("completely unrelated words here", ["a man is riding a horse"]),
    # multi-reference max selection
    ("a man is cooking", ["a chef prepares a meal",
                          "a man is cooking in a kitchen",
                          "someone makes food"]),
    ("a baby laughs", ["a baby is laughing loudly",
                       "an infant giggles"]),
    # function-word-heavy
    ("it is on the top of the box", ["it is at the top of a box"]),
    ("this is a video of a cat", ["this is a clip of a cat"]),
]


class JarMeteor:
    """Minimal client for ``meteor-*.jar``'s ``-stdio`` scoring protocol."""

    def __init__(self, jar: str, java: str = "java", language: str = "en",
                 norm: bool = True, mem: str = "2G"):
        cmd = [java, f"-Xmx{mem}", "-jar", jar, "-", "-", "-stdio",
               "-l", language]
        if norm:
            cmd.append("-norm")
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
        )

    _RPC_TIMEOUT_S = 60.0

    def _rpc(self, line: str) -> str:
        assert self._proc.stdin and self._proc.stdout
        self._proc.stdin.write(line.replace("\n", " ").strip() + "\n")
        self._proc.stdin.flush()
        # Bounded read: a wedged jar must not stall the harness forever. The
        # reader thread is daemonic so a timeout leaves nothing dangling after
        # the kill below.
        import threading

        box: List[str] = []
        t = threading.Thread(
            target=lambda: box.append(self._proc.stdout.readline()), daemon=True
        )
        t.start()
        t.join(self._RPC_TIMEOUT_S)
        if t.is_alive() or not box or not box[0].strip():
            self._proc.kill()
            raise RuntimeError(
                "meteor jar produced no output within "
                f"{self._RPC_TIMEOUT_S:.0f}s (crashed or wedged?)"
            )
        return box[0].strip()

    def score(self, hyp: str, refs: Sequence[str]) -> float:
        """Sentence METEOR, max over references (one SCORE/EVAL per ref so
        the aggregation matches ``Meteor.compute_score`` exactly — the jar's
        own multi-reference mode also maxes, but per-ref keeps the protocol
        single-segment and unambiguous across jar versions)."""
        best = 0.0
        for ref in refs:
            stats = self._rpc(f"SCORE ||| {ref} ||| {hyp}")
            best = max(best, float(self._rpc(f"EVAL ||| {stats}")))
        return best

    def close(self) -> None:
        if self._proc.stdin:
            try:
                self._proc.stdin.close()
            except OSError:
                pass
        try:
            self._proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            # Jar ignored stdin EOF — don't leave a JVM behind.
            self._proc.kill()
            self._proc.wait(timeout=10)


def _py_score(hyp: str, refs: Sequence[str],
              synonyms: Optional[dict] = None) -> float:
    """vct_tpu sentence METEOR (max over refs), optional synonym override."""
    table = {} if synonyms is None else synonyms
    return max(
        (score_pair(hyp.split(), r.split(), table) for r in refs),
        default=0.0,
    )


def diff_corpus(jar_score, corpus: Sequence[Tuple[str, List[str]]],
                tol: float = 1e-4) -> Dict:
    """Score ``corpus`` with both scorers and attribute every delta.

    ``jar_score(hyp, refs) -> float`` is injected so tests can stub it.
    Attribution: re-scoring with an empty synonym table isolates deltas the
    synonym stage participates in ("synonym-table") from pure
    alignment/formulation deltas ("alignment/other").
    """
    meteor = Meteor()
    rows = []
    for hyp, refs in corpus:
        py = _py_score(hyp, refs, meteor._synonyms)
        py_nosyn = _py_score(hyp, refs, {})
        jar = jar_score(hyp, refs)
        delta = py - jar
        if abs(delta) <= tol:
            label = "match"
        elif abs(py - py_nosyn) > tol:
            label = "synonym-table"
        else:
            label = "alignment/other"
        rows.append({
            "hyp": hyp, "refs": refs, "py": py, "jar": jar,
            "delta": delta, "label": label,
        })
    n = max(len(rows), 1)
    mean_py = sum(r["py"] for r in rows) / n
    mean_jar = sum(r["jar"] for r in rows) / n
    worst = max(rows, key=lambda r: abs(r["delta"]), default=None)
    by_label: Dict[str, int] = {}
    for r in rows:
        by_label[r["label"]] = by_label.get(r["label"], 0) + 1
    return {
        "n": len(rows),
        "mean_py": mean_py,
        "mean_jar": mean_jar,
        "mean_delta": mean_py - mean_jar,
        "mean_abs_delta": sum(abs(r["delta"]) for r in rows) / n,
        "max_abs_delta": abs(worst["delta"]) if worst else 0.0,
        "worst": worst,
        "by_label": by_label,
        "rows": rows,
    }


def format_report(report: Dict) -> str:
    lines = [
        "METEOR jar-diff report",
        f"  segments            : {report['n']}",
        f"  corpus mean (python): {report['mean_py']:.4f}",
        f"  corpus mean (jar)   : {report['mean_jar']:.4f}",
        f"  corpus mean delta   : {report['mean_delta']:+.4f}",
        f"  mean |delta|        : {report['mean_abs_delta']:.4f}",
        f"  max  |delta|        : {report['max_abs_delta']:.4f}",
        f"  by attribution      : {report['by_label']}",
    ]
    if report["worst"] and abs(report["worst"]["delta"]) > 1e-4:
        w = report["worst"]
        lines += [
            "  worst segment:",
            f"    hyp : {w['hyp']}",
            f"    refs: {w['refs']}",
            f"    py={w['py']:.4f} jar={w['jar']:.4f} "
            f"delta={w['delta']:+.4f} [{w['label']}]",
        ]
    alignment = [r for r in report["rows"] if r["label"] == "alignment/other"]
    if alignment:
        lines.append(
            f"  !! {len(alignment)} segment(s) differ OUTSIDE the synonym "
            "stage — formulation gaps worth fixing in evalcap/meteor.py:"
        )
        for r in alignment[:10]:
            lines.append(f"     py={r['py']:.4f} jar={r['jar']:.4f}  {r['hyp']!r}")
    return "\n".join(lines)


def load_corpus(path: Optional[str]) -> List[Tuple[str, List[str]]]:
    """JSON corpus: [{"hyp": str, "refs": [str, ...]}, ...]."""
    if path is None:
        return FIXTURE_CORPUS
    with open(path) as f:
        data = json.load(f)
    return [(d["hyp"], list(d["refs"])) for d in data]


def main(argv: Optional[Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--jar", help="path to meteor-1.5.jar")
    ap.add_argument("--java", default="java", help="java executable")
    ap.add_argument("--corpus", default=None,
                    help="JSON corpus file (default: bundled fixtures)")
    ap.add_argument("--json", action="store_true",
                    help="emit the full report as JSON instead of text")
    args = ap.parse_args(argv)

    missing = []
    if shutil.which(args.java) is None:
        missing.append(f"no JVM ({args.java!r} not on PATH)")
    if not args.jar:
        missing.append("no --jar given")
    elif not os.path.exists(args.jar):
        missing.append(f"jar not found: {args.jar}")
    if missing:
        print("meteor_jar_diff: cannot run the live diff — "
              + "; ".join(missing), file=sys.stderr)
        print("The pure-Python scorer's formulation is pinned by "
              "tests/test_meteor_fixtures.py; re-run this harness the "
              "moment a JRE + meteor-1.5.jar are available.",
              file=sys.stderr)
        return 2

    corpus = load_corpus(args.corpus)
    jar = JarMeteor(args.jar, java=args.java)
    try:
        report = diff_corpus(jar.score, corpus)
    finally:
        jar.close()
    if args.json:
        print(json.dumps(report, indent=2))
    else:
        print(format_report(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
