"""The `-m smoke` tier registry (conftest.SMOKE) must stay live: every
entry names a real test (a rename would silently shrink the tier to
nothing — pytest markers don't error on unmatched names), and every
test module has a representative except the documented exclusions
(example-pipeline integration tests, covered family-by-family)."""

from __future__ import annotations

import os
import re

from conftest import SMOKE

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))

# integration compositions of families already covered one-by-one
EXCLUDED = {"test_example.py", "test_example_multimodal.py"}


def test_smoke_registry_names_exist():
    stale = []
    for fname, tname in SMOKE.items():
        path = os.path.join(TESTS_DIR, fname)
        if not os.path.exists(path):
            stale.append((fname, "module missing"))
            continue
        with open(path) as f:
            if not re.search(rf"^def {tname}\b", f.read(), re.M):
                stale.append((fname, tname))
    assert not stale, f"SMOKE entries no longer match a test: {stale}"


def test_every_module_has_a_smoke_representative():
    modules = {
        f
        for f in os.listdir(TESTS_DIR)
        if f.startswith("test_") and f.endswith(".py")
    }
    unrepresented = modules - set(SMOKE) - EXCLUDED
    assert not unrepresented, (
        f"new test modules need a smoke representative (or an explicit "
        f"exclusion here): {sorted(unrepresented)}"
    )


def test_slow_registry_names_exist():
    """SLOW entries (the driver-budget skip tier, VERDICT r13 item 6)
    must name real tests — a rename would silently re-enable a 5-minute
    test in the driver path (or skip nothing)."""
    from conftest import ALL, SLOW

    stale = []
    for fname, spec in SLOW.items():
        path = os.path.join(TESTS_DIR, fname)
        if not os.path.exists(path):
            stale.append((fname, "module missing"))
            continue
        if spec == ALL:
            continue
        src = open(path).read()
        for tname in spec:
            if not re.search(rf"^def {tname}\b", src, re.M):
                stale.append((fname, tname))
    assert not stale, f"SLOW entries no longer match a test: {stale}"


def test_slow_tier_never_skips_a_smoke_representative():
    """Every module keeps at least its smoke representative in the
    default (driver) tier — the fast sanity test per family must
    always run."""
    from conftest import ALL, SLOW

    bad = []
    for fname, spec in SLOW.items():
        rep = SMOKE.get(fname)
        if rep is None:
            continue
        if spec == ALL or rep in spec:
            bad.append((fname, rep))
    assert not bad, f"SLOW would skip a smoke representative: {bad}"
