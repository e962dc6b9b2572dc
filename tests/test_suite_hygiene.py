"""Full-suite hygiene guards (round-4 VERDICT weak-#1 regression pins).

The round-4 full-suite run had 9 torch-dependent tests red that were green in
isolation. Root cause: a test module prepended ``tools/`` to ``sys.path`` at
collection time, so ``tools/profile.py`` shadowed the stdlib ``profile``
module; the first ``torch.optim.*`` construction then blew up inside
``torch._dynamo -> cProfile -> profile`` and left partially-imported torch
state that cascaded into ImportErrors elsewhere. These tests run late in the
alphabetical order — i.e. after every module-level ``sys.path`` mutation in
the suite has happened — and pin that the interpreter's import surface is
still clean.
"""

import importlib.util
import os
import sys
import sysconfig

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_repo_tools_dir_on_sys_path():
    tools = os.path.realpath(os.path.join(_REPO_ROOT, "tools"))
    offenders = [p for p in sys.path if p and os.path.realpath(p) == tools]
    assert not offenders, (
        f"tools/ is on sys.path ({offenders}); tools/profile.py would shadow "
        "the stdlib profile module and poison torch._dynamo imports"
    )


def test_stdlib_profile_not_shadowed():
    spec = importlib.util.find_spec("profile")
    assert spec is not None and spec.origin
    stdlib = os.path.realpath(sysconfig.get_paths()["stdlib"])
    assert os.path.realpath(spec.origin).startswith(stdlib), (
        f"stdlib 'profile' resolves to {spec.origin}; a repo file is shadowing "
        "it (this is the exact round-4 full-suite poisoning)"
    )
    # If something already imported a shadowed copy, find_spec alone won't see
    # it — check the live module too.
    mod = sys.modules.get("profile")
    if mod is not None and getattr(mod, "__file__", None):
        assert os.path.realpath(mod.__file__).startswith(stdlib)


def test_reference_root_not_ahead_of_stdlib():
    # /root/reference has shadow-prone names (utils.py, eval.py, dataloader.py);
    # test_reference_parity must APPEND it, never prepend.
    ref = "/root/reference"
    if ref in sys.path:
        assert sys.path.index(ref) > 0, "reference root must not lead sys.path"


def test_torch_dynamo_import_path_clean():
    # Constructing an optimizer is what lazily imports torch._dynamo (via
    # cProfile): the exact trigger that failed in round 4. Keep this AFTER the
    # path checks so a failure here points at a new poisoning source.
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-3)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=2)
    opt.step()
    sched.step()
    assert opt.param_groups[0]["lr"] > 0
