"""Minor-fault-service window probe.

The sandbox host serializes minor-page-fault service (BENCH.md round-1/4
diagnosis): allocation-heavy work anti-scales across processes while
pure-CPU work scales ~1.0.  The pure-CPU microprobe used through round 5
qualifies CPU capacity but is blind to the fault path — every round-5
scaling window had CPU eff 0.92-1.00 yet build eff 0.66-0.76.

This probe measures the fault path directly: each worker repeatedly
allocates a fresh 32 MB buffer (mmap-backed at this size) and touches
every page, then frees it — per-iteration cost is dominated by minor
faults.  Reported efficiency = (8-proc aggregate rate) / (8 x 1-proc
rate).  A window where this reads high is one where the 8-core level of
a build pair is not fault-throttled.

Usage: python tools/fault_probe.py [--dur 8] [--procs 8] [--mb 32]
Prints one JSON line: {"fault_eff": ..., "r1": ..., "rN": ...}
"""
import argparse
import json
import multiprocessing as mp
import time


def _work(dur: float, mb: int, q) -> None:
    n = 0
    page = 4096
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        buf = bytearray(mb << 20)  # zero-filled: creation touches every page
        # touch again with a distinct value so the loop can't be elided
        buf[::page] = b"\x01" * (len(buf) // page + (1 if len(buf) % page else 0))
        del buf
        n += 1
    q.put(n / (time.perf_counter() - t0))


def run(procs: int, dur: float, mb: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_work, args=(dur, mb, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=8.0)
    ap.add_argument("--procs", type=int, default=8)
    ap.add_argument("--mb", type=int, default=32)
    args = ap.parse_args()
    r1 = run(1, args.dur, args.mb)
    rn = run(args.procs, args.dur, args.mb)
    eff = rn / (args.procs * r1)
    print(json.dumps({"fault_eff": round(eff, 3), "r1": round(r1, 2),
                      f"r{args.procs}": round(rn, 2), "mb": args.mb,
                      "ts": time.strftime("%H:%M:%S")}))


if __name__ == "__main__":
    main()
