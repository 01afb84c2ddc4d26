"""Persistent TPU work loop: one process, one tunnel attach, many jobs.

The axon tunnel allows ~one client attach per 10-minute window, and
trace+lower of the big scan graphs costs minutes per process even on
compile-cache hits — so ALL TPU work for a session runs here. Jobs are
Python files dropped into /tmp/tpuq as NNN.py; each is exec()d in a
SHARED namespace (warm encoders persist between jobs) and its stdout/
stderr plus traceback go to NNN.out (NNN.done marks completion).

    python tools/tpu_worker.py &          # once
    cp job.py /tmp/tpuq/001.py            # enqueue
    cat /tmp/tpuq/001.out                 # result (after 001.done)

A job file named STOP ends the loop.
"""
from __future__ import annotations

import io
import os
import sys
import time
import traceback

QDIR = "/tmp/tpuq"


def main():
    os.makedirs(QDIR, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, "tests")
    ns: dict = {"__name__": "__tpu_worker__"}
    print("tpu_worker up, queue:", QDIR, flush=True)
    done = set()
    while True:
        if os.path.exists(os.path.join(QDIR, "STOP")):
            print("tpu_worker: STOP", flush=True)
            return
        jobs = sorted(f for f in os.listdir(QDIR)
                      if f.endswith(".py") and f not in done
                      and not os.path.exists(
                          os.path.join(QDIR, f[:-3] + ".done")))
        for j in jobs:
            path = os.path.join(QDIR, j)
            out = os.path.join(QDIR, j[:-3] + ".out")
            t0 = time.time()
            buf = io.StringIO()
            old_out, old_err = sys.stdout, sys.stderr

            class Tee:
                def __init__(self, *ws):
                    self.ws = ws

                def write(self, s):
                    for w in self.ws:
                        w.write(s)
                    return len(s)

                def flush(self):
                    for w in self.ws:
                        w.flush()

            sys.stdout = sys.stderr = Tee(buf, old_out)
            try:
                with open(path) as f:
                    code = f.read()
                exec(compile(code, path, "exec"), ns)
                status = "OK"
            except BaseException:
                traceback.print_exc()
                status = "FAIL"
            finally:
                sys.stdout, sys.stderr = old_out, old_err
            with open(out, "w") as f:
                f.write(buf.getvalue())
                f.write(f"\n== {status} in {time.time()-t0:.1f}s ==\n")
            with open(os.path.join(QDIR, j[:-3] + ".done"), "w") as f:
                f.write(status)
            done.add(j)
            print(f"job {j}: {status} ({time.time()-t0:.1f}s)", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
