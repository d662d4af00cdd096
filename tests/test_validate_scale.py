"""Pinned human-scale validation artifact (VERDICT r2 #4).

Runs scripts/validate_scale.py — sitegen builds a 12,000-site set from a
synthetic genome, `ntsm count` processes 2 x ~100 Mbase on the real TPU
with byte parity against the golden oracle, and eval round-trips device
vs exact — as a slow-marked test so "ALL CHECKS PASSED" is reproducible
on demand:

    python -m pytest tests/test_validate_scale.py -m slow -q

Deselected from the default suite (pyproject addopts) and skipped when no
TPU is reachable: the suite's conftest pins this process to a CPU mesh,
so the validation runs in a subprocess with the session's TPU env.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_validate(args: list[str], timeout: int) -> None:
    env = dict(os.environ)
    # undo the conftest's CPU pinning for the child: the TPU plugin needs
    # the session's JAX_PLATFORMS/PYTHONPATH as the CLI sees them
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env["JAX_PLATFORMS"] = env.get("NTSM_SCALE_PLATFORM", "axon")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "validate_scale.py"),
         *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    sys.stderr.write(res.stderr[-4000:])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ALL CHECKS PASSED" in res.stderr or "ALL CHECKS PASSED" in res.stdout


@pytest.mark.slow
def test_validate_scale_all_checks_passed():
    _run_validate([], timeout=3600)


@pytest.mark.slow
def test_validate_scale_human_site_count():
    """The full 96,287-site tier (VERDICT r3 #6): sitegen at the real
    site-set size, counting on the device against the golden oracle, eval
    device-vs-exact — the repeatable form of BASELINE.md's one-time
    human-scale parity run.  ~25-45 min on the 1-core host (sitegen's
    uniqueness scan dominates):

        python -m pytest tests/test_validate_scale.py -m slow \
            -k human -q
    """
    _run_validate(["200", "96287"], timeout=7200)
