"""Full-suite sessions run EVERY test module in a fresh interpreter.

Why: jaxlib 0.9.0's XLA:CPU executable materialization can segfault in
an AGED process — on the fresh-compile path (``backend_compile_and_load``)
or the persistent-cache deserialize path (core-dump forensics in
docs/design.md, "Test-gate reliability"). Nine observed crashes to
date; every one struck a non-trivial program materializing after ~90+
in-process tests' worth of executables had been created and destroyed,
and not one ever struck a young process. Crash #9 (2026-08-19,
``test_data``'s SimCLR-augment jit at ~#95, immediately after the two
previously-isolated modules were moved to children) proved the fault is
not tied to particular modules: reordering or isolating individual
offenders just hands the fault to the next-largest late compile.

So the gate stops playing whack-a-mole. In a multi-module session the
parent pytest process compiles NOTHING: ``conftest`` deselects every
in-process item and this module runs each test file in a clean child
interpreter — the empirically stable shape (one module, one young
process), and the same shape production uses (one program, one
process; ``tests/isolated_steps_child.py`` pioneered it for the two
heaviest trainer scenarios). Running a specific module directly
(``pytest tests/test_trainer.py``) stays in-process for developer
loops. Children share the machine-fingerprinted persistent XLA cache
(atomic writes — utils/xla_cache.py), so repeat full-suite runs stay
fast.
"""

import glob
import os
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_SELF = "test_suite_isolation"

# Heavy modules first so a regression in the core trainer/model path
# surfaces in the first few children under `-x`.
_HEAVY_FIRST = (
    "test_trainer", "test_end_to_end_learning", "test_full_parity",
    "test_eval_pipeline", "test_cli_smoke", "test_multihost",
    "test_resnet_import", "test_resnet", "test_models",
    "test_torch_parity", "test_factory_import", "test_optimization",
    "test_randaugment", "test_pallas_attention",
)


def _modules():
    names = sorted(
        os.path.basename(p)[:-3]
        for p in glob.glob(os.path.join(_HERE, "test_*.py")))
    names = [n for n in names if n != _SELF]
    rank = {m: i for i, m in enumerate(_HEAVY_FIRST)}
    names.sort(key=lambda n: rank.get(n, len(_HEAVY_FIRST)))
    return names


@pytest.mark.parametrize("module", _modules())
def test_module_in_fresh_interpreter(module):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(_HERE, f"{module}.py"), "-q",
         "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(_HERE))
    assert proc.returncode == 0, (
        f"{module} child rc={proc.returncode}\n"
        f"{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}")
    assert "failed" not in proc.stdout, proc.stdout[-4000:]
    assert (" passed" in proc.stdout or " skipped" in proc.stdout), (
        proc.stdout[-4000:])
