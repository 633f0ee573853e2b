"""The examples/ adoption surface stays runnable (VERDICT r3 item 8).

Each example runs as a SUBPROCESS on the virtual 8-device CPU mesh
(GOMEL_FORCE_CPU overrides the axon sitecustomize, which ignores
JAX_PLATFORMS) and must exit 0 with its terminal OK marker.
"""
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO_ROOT, "examples")


def _run(name: str) -> str:
    env = dict(os.environ)
    env["GOMEL_FORCE_CPU"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO_ROOT)
    # 900 s: the examples compile everything from scratch in a fresh
    # subprocess; under full-suite contention on this 1-core box the
    # example_usage run has exceeded 480 s while passing in ~130 s alone
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def test_pod_longform_resume_example():
    out = _run("pod_longform_resume.py")
    assert "mesh: 1 x 8" in out, out
    assert "resumed == uninterrupted one-call decode: True" in out, out
    assert out.rstrip().endswith("OK"), out


def test_aot_artifact_walkthrough_example():
    out = _run("aot_artifact_walkthrough.py")
    assert "longform encoder over 8 devices" in out, out
    assert out.rstrip().endswith("OK"), out


def test_example_usage():
    out = _run("example_usage.py")
    assert "Frame-sharded long-form" in out, out
