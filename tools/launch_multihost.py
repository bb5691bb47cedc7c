"""Multi-process / multi-host launch helper.

The reference launches data-parallel training with
``python -m paddle.distributed.launch --gpus '0,1' train.py`` (reference
``README.md:229-231``). The JAX equivalents:

**Real TPU pod (one process per host):** run the same command on every
host with the coordination env vars set (any cluster runner works)::

    VPR_COORDINATOR=<host0>:8476 VPR_NUM_PROCESSES=<n_hosts> \
    VPR_PROCESS_ID=<this_host_rank> python train.py --configs=...

or on managed TPU runtimes that self-describe (GKE, Cloud TPU VMs)::

    VPR_AUTO_DISTRIBUTED=1 python train.py --configs=...

The Trainer calls ``jax.distributed.initialize`` from those vars before
first backend use; each process loads its own data shard (rank-aware
samplers) and ``jit`` inserts the gradient all-reduce.

**Local simulation (this script):** spawns N single-CPU-device processes
on this machine with the env vars pre-wired — the CPU Gloo backend
carries the collectives — so the multi-host code path is testable
without a pod::

    python tools/launch_multihost.py --nproc 2 -- python train.py \
        --configs=... --use_gpu=False
"""

import argparse
import os
import socket
import subprocess
import sys


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--nproc", type=int, default=2,
                    help="number of local processes to spawn")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (default: localhost, "
                         "auto-picked free port)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run in each process")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: launch_multihost.py --nproc 2 -- "
                 "python train.py ...)")

    coordinator = args.coordinator or f"127.0.0.1:{free_port()}"
    procs = []
    for rank in range(args.nproc):
        env = dict(os.environ,
                   VPR_COORDINATOR=coordinator,
                   VPR_NUM_PROCESSES=str(args.nproc),
                   VPR_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for p in procs:
        rc = p.wait() or rc
    sys.exit(rc)


if __name__ == "__main__":
    main()
