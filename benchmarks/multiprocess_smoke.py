"""Real multi-process multihost smoke: ``jax.distributed`` bring-up + parity.

SURVEY.md §2.6 mandates a collective backend (``jax.distributed.initialize``
replacing a launcher+NCCL bootstrap). The virtual 8-device mesh used by the
test suite runs in ONE process, so it never exercises the actual bring-up,
cross-process device enumeration, or collectives that cross a process
boundary. This script does, on CPU, with no pod:

    python benchmarks/multiprocess_smoke.py              # launcher: spawns 2
    python benchmarks/multiprocess_smoke.py --process-id 0 --coordinator ...

Each worker process:
  1. calls ``gomel_tpu.parallel.mesh.initialize_multihost`` (the production
     bring-up path) against a local coordinator,
  2. checks global device enumeration (num_processes x local_devices),
  3. runs the frame-sharded direct iSTFT on a mesh whose FRAME axis spans
     both processes — the halo ``ppermute`` and the global window-sum
     ``pmax`` (parallel/sharded.py) cross the process boundary, standing in
     for DCN on a real pod,
  4. runs the sharded Griffin-Lim on a mesh whose DATA axis spans the
     processes (each process owns one batch row end to end),
  5. compares every locally-addressable output shard against a redundantly
     computed single-device reference, exact to the same tolerances as
     tests/test_sharded.py.

tests/test_multiprocess.py runs the launcher form and asserts both workers
print the OK marker. Kept under benchmarks/ because it doubles as the
runnable multihost demo referenced by docs/MULTIHOST.md.
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FRAME_LEN, HOP, BATCH = 256, 64, 2
N_FRAMES_SIGNAL = FRAME_LEN + 41 * HOP  # same shape class as tests/test_sharded.py

OK_MARKER = "MULTIHOST-SMOKE OK"


def _parse(argv):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--process-id", type=int, default=None,
                    help="worker mode; omit to self-launch all workers")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (worker mode)")
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual CPU devices per process")
    return ap.parse_args(argv)


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------

def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(num_processes: int, local_devices: int) -> int:
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(i), "--num-processes", str(num_processes),
             "--coordinator", coord, "--local-devices", str(local_devices)],
            env=env, cwd=REPO_ROOT)
        for i in range(num_processes)
    ]
    rc = 0
    for p in procs:
        rc = max(rc, p.wait())
    return rc


# ---------------------------------------------------------------------------
# Worker
# ---------------------------------------------------------------------------

def _global_array(arr, mesh, spec):
    """Build a process-spanning global jax.Array from an identical host copy
    (every worker computes the same seeded input redundantly)."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def _check_shards(got, want, valid_len: int, atol: float, label: str,
                  pid: int) -> None:
    """Compare every addressable shard of the global output against the
    single-device reference, ignoring the padded tail past ``valid_len``."""
    import numpy as np

    checked = 0
    for s in got.addressable_shards:
        data = np.asarray(s.data)
        b_sl, t_sl = s.index
        t0 = t_sl.start or 0
        t1 = t_sl.stop if t_sl.stop is not None else got.shape[1]
        t1 = min(t1, valid_len)
        if t1 <= t0:
            continue
        np.testing.assert_allclose(data[:, : t1 - t0], want[b_sl, t0:t1],
                                   atol=atol, rtol=atol, err_msg=label)
        checked += 1
    if checked == 0:
        raise AssertionError(f"{label}: no addressable shard held real output")
    print(f"[p{pid}] parity ok: {label} ({checked} local shards)", flush=True)


def run_worker(args) -> None:
    # Fresh XLA_FLAGS (replace, not append — the parent may carry the test
    # suite's 8-device flag) before any JAX import.
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)

    import jax
    jax.config.update("jax_platforms", "cpu")  # env var is ignored (CLAUDE.md)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from gomel_tpu.core.framing import num_frames
    from gomel_tpu.ops.stft import stft, hann_window
    from gomel_tpu.ops.istft import istft_direct
    from gomel_tpu.ops.griffinlim import griffin_lim
    from gomel_tpu.parallel import sharded as sh
    from gomel_tpu.parallel.mesh import (DATA_AXIS, FRAME_AXIS,
                                         initialize_multihost, is_multihost,
                                         make_mesh)

    pid = args.process_id
    initialize_multihost(args.coordinator, args.num_processes, pid)
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.local_device_count() == args.local_devices
    assert is_multihost()
    n = jax.device_count()
    assert n == args.num_processes * args.local_devices
    print(f"[p{pid}] bring-up ok: {jax.process_count()} processes, "
          f"{n} global devices", flush=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, N_FRAMES_SIGNAL)).astype(np.float32)
    f = num_frames(N_FRAMES_SIGNAL, FRAME_LEN, HOP)
    win = jnp.asarray(hann_window(FRAME_LEN), jnp.float32)
    spec = np.asarray(jax.vmap(
        lambda s: stft(jnp.asarray(s), FRAME_LEN, HOP))(jnp.asarray(x)))

    # --- 1. frame axis spans the processes: cross-process halo + pmax ------
    mesh_f = make_mesh(data=1, frame=n)
    plan_f = sh.plan_frame_sharding(f, FRAME_LEN, HOP, n)
    spec_pad = np.zeros((BATCH, plan_f.n_frames_padded, spec.shape[2]),
                        spec.dtype)
    spec_pad[:, :f] = spec
    spec_g = _global_array(spec_pad, mesh_f, P(DATA_AXIS, FRAME_AXIS, None))
    want = np.asarray(jax.vmap(
        lambda s: istft_direct(jnp.asarray(s), HOP, win))(jnp.asarray(spec)))
    got = sh.sharded_istft_fn(mesh_f, plan_f)(spec_g)
    got.block_until_ready()
    _check_shards(got, want, plan_f.out_len, 1e-4,
                  f"frame-axis iSTFT across {args.num_processes} processes",
                  pid)

    # --- 2. data axis spans the processes: one batch row per process -------
    mesh_d = make_mesh(data=args.num_processes,
                       frame=n // args.num_processes)
    plan_d = sh.plan_frame_sharding(f, FRAME_LEN, HOP,
                                    n // args.num_processes)
    mag = np.abs(spec)
    mag_pad = np.zeros((BATCH, plan_d.n_frames_padded, mag.shape[2]),
                       mag.dtype)
    mag_pad[:, :f] = mag
    init = np.random.default_rng(7).random(
        (BATCH, plan_d.sharded_signal_len)).astype(np.float32)
    want_gl = np.asarray(jax.vmap(lambda m, s0: griffin_lim(
        jnp.asarray(m), HOP, 3, jax.random.PRNGKey(0), win,
        init=jnp.asarray(s0[: plan_d.out_len])))(jnp.asarray(mag),
                                                 jnp.asarray(init)))
    mag_g = _global_array(mag_pad, mesh_d, P(DATA_AXIS, FRAME_AXIS, None))
    init_g = _global_array(init, mesh_d, P(DATA_AXIS, FRAME_AXIS))
    got_gl = sh.sharded_griffin_lim_fn(mesh_d, plan_d, 3)(mag_g, init_g)
    got_gl.block_until_ready()
    _check_shards(got_gl, want_gl, plan_d.out_len, 2e-3,
                  f"data-axis Griffin-Lim across {args.num_processes} "
                  "processes", pid)

    print(f"{OK_MARKER} process {pid}/{args.num_processes}: {n} global "
          "devices, cross-process halo exchange + global pmax verified",
          flush=True)


def main(argv=None) -> int:
    args = _parse(argv)
    if args.process_id is None:
        return launch(args.num_processes, args.local_devices)
    if args.coordinator is None:
        raise SystemExit("--coordinator is required in worker mode")
    run_worker(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
