"""Training supervisor: auto-restart on crash, on top of checkpoint/resume.

The reference's only fault tolerance is corruption-tolerant checkpoint
pickup (reference checkpointer.py:135-148 + --resume, main.py:109-114);
nothing restarts a dead run. This closes the loop for unattended training:
wrap the train command, and on a nonzero exit restart it with exponential
backoff — always with ``--resume``, so each attempt continues bit-exactly
from the last checkpoint (mid-epoch data position included, the same
contract tests/test_cli.py::test_main_cli_train_and_resume pins).

    python tools/supervise_train.py [supervisor flags] -- \
        python main.py --config_path configs/uvit_celeba.yaml ...

Behavior:
- exit 0 from the child ends supervision with exit 0 (run complete);
- "usage" exits (default: code 2, argparse) are never retried — restarting
  a wrong command line can't fix it;
- a child that stayed up >= --healthy_secs before dying resets the backoff
  and attempt budget (a crash after hours of healthy training is a fresh
  incident, not the next step of a crash loop);
- SIGTERM/SIGINT to the supervisor forwards to the child and waits up to
  --grace seconds: the Trainer's preemption handler finishes the in-flight
  step and saves full state (training/trainer.py), then the supervisor
  exits WITHOUT restarting;
- every event is appended as one JSON line to --log.

The supervisor only ever signals its direct child PID.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def get_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        usage="supervise_train.py [flags] -- <train command ...>",
    )
    p.add_argument("--max_restarts", type=int, default=20,
                   help="restart budget per crash-loop incident (reset "
                        "after a run healthy for --healthy_secs)")
    p.add_argument("--backoff_base", type=float, default=5.0,
                   help="first restart delay, seconds; doubles per "
                        "consecutive crash")
    p.add_argument("--backoff_cap", type=float, default=300.0)
    p.add_argument("--healthy_secs", type=float, default=300.0,
                   help="a child that lived this long resets the "
                        "backoff/attempt counters before its crash counts")
    p.add_argument("--grace", type=float, default=600.0,
                   help="seconds to wait after forwarding SIGTERM before "
                        "killing the child (the preemption save of a big "
                        "model can take minutes)")
    p.add_argument("--no_restart_codes", type=str, default="2",
                   help="comma-separated child exit codes never retried "
                        "(2 = argparse usage error)")
    p.add_argument("--no_auto_resume", action="store_true", default=False,
                   help="don't append --resume to restarted main.py "
                        "commands")
    p.add_argument("--log", type=str, default="supervisor.log",
                   help="JSONL event log path")
    if argv is None:
        argv = sys.argv[1:]
    if "--" not in argv:
        p.error("separate the train command with '--'")
    split = argv.index("--")
    args = p.parse_args(argv[:split])
    args.command = argv[split + 1 :]
    if not args.command:
        p.error("empty train command after '--'")
    return args


class Supervisor:
    def __init__(self, args):
        self.args = args
        self.child = None
        self.shutdown = None  # signal number once requested

    def log(self, event: str, **fields):
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        line = json.dumps(rec, sort_keys=True)
        print(f"[supervisor] {line}", flush=True)
        with open(self.args.log, "a") as f:
            f.write(line + "\n")

    def _on_signal(self, signum, frame):
        self.shutdown = signum
        if self.child is not None and self.child.poll() is None:
            self.child.send_signal(signal.SIGTERM)

    def _command(self):
        cmd = list(self.args.command)
        if (
            not self.args.no_auto_resume
            and "--resume" not in cmd
            and any(c.endswith("main.py") for c in cmd)
        ):
            cmd.append("--resume")
        return cmd

    def run(self) -> int:
        args = self.args
        no_restart = {
            int(c) for c in args.no_restart_codes.split(",") if c.strip()
        }
        signal.signal(signal.SIGTERM, self._on_signal)
        signal.signal(signal.SIGINT, self._on_signal)

        attempt = 0
        while True:
            cmd = self._command()
            self.log("start", attempt=attempt, cmd=cmd)
            started = time.time()
            self.child = subprocess.Popen(cmd)
            if self.shutdown is not None:
                # signal raced the spawn: forward now
                self.child.send_signal(signal.SIGTERM)
            # poll-wait so a SIGTERM arriving mid-wait still starts the
            # grace clock (and a TERM-ignoring child still gets killed)
            grace_deadline = None
            while True:
                if self.shutdown is not None and grace_deadline is None:
                    grace_deadline = time.time() + args.grace
                try:
                    rc = self.child.wait(timeout=0.2)
                    break
                except subprocess.TimeoutExpired:
                    if (grace_deadline is not None
                            and time.time() > grace_deadline):
                        self.log("grace_exceeded", grace=args.grace)
                        self.child.kill()
                        rc = self.child.wait()
                        break
            lived = time.time() - started

            if self.shutdown is not None:
                # the Trainer saved state on SIGTERM; don't restart
                self.log("shutdown", rc=rc, lived_s=round(lived, 1),
                         signal=self.shutdown)
                return rc
            if rc == 0:
                self.log("complete", lived_s=round(lived, 1))
                return 0
            if rc in no_restart:
                self.log("fatal", rc=rc,
                         reason="exit code marked non-retryable")
                return rc
            if lived >= args.healthy_secs:
                # fresh incident: full budget again
                attempt = 0
            if attempt >= args.max_restarts:
                self.log("gave_up", rc=rc, attempts=attempt)
                return rc
            delay = min(
                args.backoff_base * (2.0 ** attempt), args.backoff_cap
            )
            self.log("crash", rc=rc, lived_s=round(lived, 1),
                     attempt=attempt, restart_in_s=delay)
            attempt += 1
            deadline = time.time() + delay
            while time.time() < deadline:
                if self.shutdown is not None:
                    self.log("shutdown", rc=rc, signal=self.shutdown,
                             during="backoff")
                    return rc
                time.sleep(min(0.2, max(0.0, deadline - time.time())))


def main(argv=None) -> int:
    return Supervisor(get_args(argv)).run()


if __name__ == "__main__":
    sys.exit(main())
