"""Golden-trajectory regression baselines (VERDICT r4 item 4).

Pins the f64 CPU trajectory of the full CRM physics step (forcing ->
SPAM+SI dycore -> sponge -> sgs -> micro) for the two configs of record
against committed .npz artifacts, so a future "optimization" that changes
answers in a way the invariant tests tolerate (conservation, convergence
orders, sharded==unsharded) cannot land silently. The reference's analog
is its CI run against a fixed config
(.github/workflows/mmf-simplified-ubuntu.yml:34-39).

Regeneration policy (PARITY.md "Golden trajectories"): run
tools/make_golden.py, review its printed per-field max-relative-change,
and commit the new artifacts with the justification.

Tolerance: 1e-9 relative — ten f64 steps of this smooth small config
reproduce to ~1e-13 on one platform/version; the slack absorbs benign
XLA-version reassociation drift while still catching any real numerics
change (an operand-order change alone shows up at ~1e-11; a physics slip
at >1e-6).
"""

import os

import numpy as np
import jax
import pytest


def _golden_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _run(micro, sgs):
    # the config lives in ONE place — tools/make_golden.py — so the
    # generator and this check can never drift apart (a tweaked
    # generator config would otherwise fail here looking like a
    # numerics regression)
    import sys
    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from make_golden import run_config
    return run_config(micro, sgs)


@pytest.mark.parametrize("name,micro,sgs", [
    ("kessler_spam_si", "kessler", "none"),
    ("p3_shoc_spam_si", "p3", "shoc"),
])
def test_golden_trajectory(name, micro, sgs):
    path = os.path.join(_golden_dir(), name + ".npz")
    assert os.path.exists(path), (
        f"missing golden baseline {path}; generate with "
        "tools/make_golden.py and commit it")
    golden = np.load(path)
    state = _run(micro, sgs)
    for k in golden.files:
        a = golden[k]
        b = np.asarray(state[k])
        scale = max(float(np.abs(a).max()), 1e-300)
        err = float(np.abs(a - b).max()) / scale
        assert err < 1e-9, (name, k, err)
