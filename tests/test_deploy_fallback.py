"""deploy.ensure_protobuf_runtime fallback-loop hygiene: a poisoned
``google`` package — whether cached by a failed CANDIDATE import or by
the PRE-LOOP probe import (a legacy non-namespace site-packages
install without a usable protobuf runtime) — must never shadow a later
working candidate: the loop purges the module cache before every
attempt and unwinds sys.path/PYTHONPATH after every failure. Runs in a
subprocess so the import-state surgery cannot leak into this test
session."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import os, pathlib, sys, tempfile

    repo = os.environ["REPO_ROOT"]
    sys.path.insert(0, repo)
    import talknet_segmentation_batchprocessing_spark.deploy as dep

    # a poisoned root: ships a regular (non-namespace) google package
    # WITHOUT a usable protobuf runtime — importing through it caches
    # 'google' with __path__ pinned here
    broken = tempfile.mkdtemp(prefix="pbshim_broken_")
    g = pathlib.Path(broken, "google")
    (g / "protobuf").mkdir(parents=True)
    (g / "__init__.py").write_text("")
    (g / "protobuf" / "__init__.py").write_text("")

    def purge_google():
        for m in [
            m for m in sys.modules
            if m == "google" or m.startswith("google.")
        ]:
            sys.modules.pop(m)

    # --- scenario 1: poisoned CANDIDATE ahead of a working one -------
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

    # --- scenario 2: poison cached by the PRE-LOOP probe import, and
    # only ONE (working) candidate root exists — the loop must purge
    # the stale cache BEFORE the attempt, or the single candidate can
    # never succeed
    purge_google()
    vendored = os.path.join(repo, "vendor", "pbshim")
    sys.path = [
        p for p in sys.path if p not in (broken, vendored)
    ]
    os.environ.pop("PYTHONPATH", None)
    sys.path.append(broken)  # probe import caches the poisoned google

    dep._pb_shim_roots = lambda: iter([vendored])
    dep._PB_SHIM_READY = None
    ok2 = dep.ensure_protobuf_runtime()
    assert ok2, (
        "pre-loop poison must not sabotage the only working candidate"
    )
    from google.protobuf import descriptor as d2  # noqa: F401

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


def test_purge_scope_spares_unrelated_google_namespace_packages():
    """The protobuf fallback must only evict the 'google' namespace
    anchor and the protobuf runtime trees — never working google.*
    siblings (google.auth, google.cloud, ...): evicting those leaves
    in-flight objects holding old module instances while fresh imports
    duplicate module-level registries/singletons."""
    from talknet_segmentation_batchprocessing_spark.deploy import (
        _pb_modules_to_purge,
    )

    cached = {
        "google": object(),
        "google.protobuf": object(),
        "google.protobuf.descriptor": object(),
        "google._upb": object(),
        "google._upb._message": object(),
        "google.auth": object(),
        "google.auth.transport": object(),
        "google.cloud": object(),
        "google.cloud.storage": object(),
        "google_crc32c": object(),  # prefix lookalike, not google.*
        "numpy": object(),
    }
    got = sorted(_pb_modules_to_purge(cached))
    assert got == [
        "google",
        "google._upb",
        "google._upb._message",
        "google.protobuf",
        "google.protobuf.descriptor",
    ]
