"""deploy.ensure_protobuf_runtime fallback-loop hygiene: a candidate
root that fails to import must be fully unwound (sys.path, PYTHONPATH,
and the partially-imported non-namespace ``google`` package in
sys.modules) before the next candidate is tried — otherwise the broken
root's pinned ``__path__`` shadows every later candidate and the
fallback can never succeed. Runs in a subprocess so the import-state
surgery cannot leak into this test session."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import os, pathlib, sys, tempfile

    sys.path.insert(0, os.environ["REPO_ROOT"])
    import talknet_segmentation_batchprocessing_spark.deploy as dep

    # a poisoned candidate: ships a regular (non-namespace) google
    # package WITHOUT a usable protobuf runtime — importing it caches
    # 'google' with __path__ pinned here
    broken = tempfile.mkdtemp(prefix="pbshim_broken_")
    g = pathlib.Path(broken, "google")
    (g / "protobuf").mkdir(parents=True)
    (g / "__init__.py").write_text("")
    (g / "protobuf" / "__init__.py").write_text("")

    real_roots = dep._pb_shim_roots

    def roots_with_poison():
        yield broken
        yield from real_roots()

    dep._pb_shim_roots = roots_with_poison
    dep._PB_SHIM_READY = None

    ok = dep.ensure_protobuf_runtime()
    assert ok, "fallback must recover via the vendored root"
    assert broken not in sys.path, "failed root left in sys.path"
    assert broken not in os.environ.get("PYTHONPATH", ""), (
        "failed root left in PYTHONPATH for workers to inherit"
    )
    from google.protobuf import descriptor  # noqa: F401
    import google

    assert broken not in list(getattr(google, "__path__", [])), (
        "google package still pinned to the dead root"
    )
    print("FALLBACK_OK")
    """
)


def test_failed_candidate_root_is_unwound():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the first try-import must fail
    env["REPO_ROOT"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "FALLBACK_OK" in out.stdout
