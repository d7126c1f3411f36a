"""True multi-process distributed execution (SURVEY §2.9 / §5.8).

Spawns two real OS processes (4 virtual CPU devices each) wired into one
JAX distributed system and checks that (1) the integer engine jit'd over a
global cross-process data-parallel mesh, (2) the QAT sim with the tensor-
parallel ``model`` axis spanning the processes, and (3) per-host
``ServingEngine`` instances all reproduce single-device results — (1) and
(2) bitwise.  This is the executed counterpart of the reference's vestigial
``torch.distributed`` helpers (``utils/utils.py:171-237``)."""

import json
import os
import subprocess
import sys


def test_multihost_demo_small(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "MULTIHOST.json"
    env = dict(os.environ)
    # children configure their own device counts; don't leak the suite's
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "multihost_demo.py"),
         "--small", "--run-dir", str(tmp_path), "--out", str(out),
         "--timeout", "540"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=570)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    merged = json.loads(out.read_text())
    assert merged["all_bitexact"]
    assert len(merged["workers"]) == 2
    for w in merged["workers"]:
        assert w["global_devices"] == 8 and w["local_devices"] == 4
        assert w["serving_logits_ok"]
