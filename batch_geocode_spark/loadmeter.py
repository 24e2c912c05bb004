"""Host-load attribution for benchmark self-proof.

This sandbox host carries EXTERNAL tenant load in multi-minute bursts;
1-min load averages lag multi-second bursts, so a measurement can pass
a load gate and still run contaminated. These two readings attribute
each individual measurement instead: host-wide busy CPU seconds
(/proc/stat) minus THIS process tree's CPU seconds = external CPU
during the window. Used by bench.py and scripts/scaling_bench.py to
stamp every recorded figure with the external-tenant cores that were
concurrently busy while it ran.
"""

from __future__ import annotations

import os


def host_busy_s() -> float:
    """Host-wide CPU busy seconds since boot (/proc/stat: everything
    except idle+iowait, summed over all CPUs)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    user, nice, system, idle, iowait, irq, softirq, steal = (
        int(v) for v in parts[:8]
    )
    return (user + nice + system + irq + softirq + steal) / os.sysconf(
        "SC_CLK_TCK"
    )


def tree_cpu_s(root_pid: int | None = None) -> float:
    """Total CPU seconds consumed by a process tree (default: this
    process) — live members count their own utime+stime, reaped
    children appear exactly once in their parent's cutime/cstime, so
    there is no double counting. Covers the python driver, the py4j
    JVM, and pyspark daemons/workers.

    Known bias (conservative direction): descendants reparented to init
    before being reaped — e.g. pyspark daemons/workers outliving a
    SIGKILLed JVM — drop out of the tree, so their CPU is attributed to
    the EXTERNAL tenant. ext_cores therefore OVER-reports contamination
    in windows where workers die mid-measurement; a figure it calls
    quiet is still provably quiet."""
    hz = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
        except OSError:
            continue
        # fields after the comm ')': 0=state 1=ppid ... 11=utime 12=stime
        # 13=cutime 14=cstime (man proc(5), offset by the split)
        procs[int(d)] = (
            int(parts[1]),
            int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14]),
        )
    tree = {root_pid if root_pid is not None else os.getpid()}
    changed = True
    while changed:
        changed = False
        for pid, (ppid, _) in procs.items():
            if ppid in tree and pid not in tree:
                tree.add(pid)
                changed = True
    return sum(procs[p][1] for p in tree if p in procs) / hz


class ExternalCpuMeter:
    """Context for one timed window: ``ext_cores()`` after exit returns
    the average EXTERNAL cores concurrently busy during the window."""

    def __enter__(self) -> "ExternalCpuMeter":
        import time

        self._busy0 = host_busy_s()
        self._own0 = tree_cpu_s()
        self._t0 = time.time()
        return self

    def __exit__(self, *exc) -> None:
        import time

        self._busy1 = host_busy_s()
        self._own1 = tree_cpu_s()
        self._t1 = time.time()

    def ext_cores(self) -> float:
        wall = max(self._t1 - self._t0, 1e-9)
        ext = (self._busy1 - self._busy0) - (self._own1 - self._own0)
        return max(0.0, ext) / wall
