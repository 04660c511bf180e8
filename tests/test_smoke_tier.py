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
